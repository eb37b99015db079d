import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.core.config import GemmaConfig, PaliGemmaConfig, SiglipVisionConfig
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

cfg = PaliGemmaConfig(
    vision_config=SiglipVisionConfig(image_size=224, patch_size=14, hidden_size=512,
                                     intermediate_size=1024, num_hidden_layers=6,
                                     num_attention_heads=8),
    text_config=GemmaConfig(vocab_size=32000, hidden_size=1024, intermediate_size=4096,
                            num_hidden_layers=8, num_attention_heads=8,
                            num_key_value_heads=1, head_dim=128),
    projection_dim=1024, hidden_size=1024, image_token_index=31000, vocab_size=32000,
)
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
n = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n/1e6:.0f}M", flush=True)
qparams = quantize_lm_for_serving(params)

rng = np.random.default_rng(0)
n_img = cfg.vision_config.num_patches
agree = total = 0
for trial in range(4):
    ids = np.concatenate([np.full((1, n_img), cfg.image_token_index),
                          rng.integers(3, 30000, (1, 8))], 1).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    a = PaliGemmaEngine(params, cfg, max_seq_len=320).generate(
        jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=24, eos_token_id=-1)
    b = PaliGemmaEngine(params, cfg, max_seq_len=320, decode_params=qparams).generate(
        jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=24, eos_token_id=-1)
    agree += int((a == b).sum()); total += a.size
print(f"RESULT int8 vs bf16 greedy token agreement: {agree}/{total} = {agree/total:.1%}", flush=True)

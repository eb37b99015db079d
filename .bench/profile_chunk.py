import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
def sync(x): return np.asarray(jax.device_get(x[(0,)*x.ndim]))
cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)
del params
eng = PaliGemmaEngine(qparams, cfg, max_seq_len=2048)
b=1; n_img = cfg.vision_config.num_patches
ids = np.concatenate([np.full((b,n_img), cfg.image_token_index), np.full((b,10),5)],1).astype(np.int32)
mask = np.ones_like(ids); pixels = np.zeros((b,3,224,224), np.float32)
lo, st = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)); sync(lo)
lo, st, toks, done = eng.decode_chunk(lo, st, 64, do_sample=False, eos_token_id=-1, kv_bucket=512)
sync(toks)
lo, st = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)); sync(lo)
jax.profiler.start_trace("/tmp/jaxchunk")
lo, st, toks, done = eng.decode_chunk(lo, st, 64, do_sample=False, eos_token_id=-1, kv_bucket=512)
sync(toks)
jax.profiler.stop_trace()
print("trace done", flush=True)

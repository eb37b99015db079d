import jax, jax.numpy as jnp, numpy as np, time, sys
from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
def sync(x): return np.asarray(jax.device_get(x[(0,)*x.ndim]))
cfg = paligemma_3b_224()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
qparams = quantize_lm_for_serving(params)
for max_seq in (512, 2048):
    eng = PaliGemmaEngine(qparams, cfg, max_seq_len=max_seq)
    b=1; n_img = cfg.vision_config.num_patches
    ids = np.concatenate([np.full((b,n_img), cfg.image_token_index), np.full((b,10),5)],1).astype(np.int32)
    mask = np.ones_like(ids); pixels = np.zeros((b,3,224,224), np.float32)
    lo, st = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)); sync(lo)
    tok = jnp.argmax(lo,-1).astype(jnp.int32)
    lo2, st = eng.decode_step(tok, st); sync(lo2)
    best=1e9
    for _ in range(3):
        lg, s2 = lo2, st
        t0=time.perf_counter()
        for _ in range(100):
            tk = jnp.argmax(lg,-1).astype(jnp.int32)
            lg, s2 = eng.decode_step(tk, s2)
        sync(lg); best=min(best,(time.perf_counter()-t0)/100)
        lo2, st = lg, s2
    print(f"RESULT max_seq={max_seq}: {1/best:.1f} tok/s ({best*1e3:.2f} ms/step)", flush=True)

# (r2) critical-path breakdown: matmul chain / +head / full decode — the
# profile that motivated the fused decode kernels (docs/PERFORMANCE.md)
"""Critical-path breakdown of one int8 b1 decode step.

A: weight-stream matmul chain only (18 layers of qkv/o/gateup/down)
B: A + lm head + argmax + embedding lookup (real sequential critical path)
C: full decode step (gemma.forward S=1, kv_bucket=1024)

Each timed as lax.fori_loop(N) inside ONE jit (sequential carry), best of 3.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma, gemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.kernels.quant import matmul_any
from paligemma_tpu.ops.norms import rms_norm

N = 200


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=3):
    o = fn(*args); _sync(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); o = fn(*args); _sync(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / N * 1e3  # ms per step


cfg = paligemma_3b_224()
tc = cfg.text_config
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
q = quantize_lm_for_serving(params)
del params
lm = q["lm"]
H = tc.hidden_size
NH, HD = tc.num_attention_heads, tc.head_dim

x0 = jnp.full((1, 1, H), 0.01, jnp.bfloat16)


@jax.jit
def chain_mats(lm, x):
    def layer_body(h, lp):
        qkv = matmul_any(h, lp["attn"]["qkv"])
        a = qkv[..., : NH * HD]
        h = h + matmul_any(a, lp["attn"]["o"])
        gu = matmul_any(h, lp["mlp"]["gateup"])
        inter = gu.shape[-1] // 2
        h = h + matmul_any(gu[..., :inter] * gu[..., inter:], lp["mlp"]["down"])
        return h * 0.5, None

    def step(i, h):
        h, _ = jax.lax.scan(layer_body, h, lm["layers"])
        return h

    return jax.lax.fori_loop(0, N, step, x)


@jax.jit
def chain_full_path(lm, x):
    def layer_body(h, lp):
        qkv = matmul_any(h, lp["attn"]["qkv"])
        a = qkv[..., : NH * HD]
        h = h + matmul_any(a, lp["attn"]["o"])
        gu = matmul_any(h, lp["mlp"]["gateup"])
        inter = gu.shape[-1] // 2
        h = h + matmul_any(gu[..., :inter] * gu[..., inter:], lp["mlp"]["down"])
        return h * 0.5, None

    def step(i, h):
        h, _ = jax.lax.scan(layer_body, h, lm["layers"])
        h = rms_norm(h, lm["final_norm"], tc.rms_norm_eps)
        logits = gemma.lm_head(lm, h).astype(jnp.float32)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, 0]
        emb = jnp.take(lm["embed"], tok, axis=0)[:, None, :].astype(jnp.bfloat16)
        return emb * 0.01

    return jax.lax.fori_loop(0, N, step, x)


def full_decode(bucket):
    cache = gemma.init_kv_cache(tc, 1, 2048, jnp.bfloat16)
    valid = jnp.zeros((1, 2048), bool).at[:, :600].set(True)

    @jax.jit
    def run(lm, cache, x):
        def step(i, carry):
            h, cache = carry
            logits, cache = gemma.forward(
                lm, tc, h, jnp.full((1, 1), 600, jnp.int32), cache,
                jnp.asarray(600, jnp.int32), valid, kv_bucket=bucket,
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, 0]
            emb = jnp.take(lm["embed"], tok, axis=0)[:, None, :].astype(jnp.bfloat16)
            return emb * 0.01, cache

        h, cache = jax.lax.fori_loop(0, N, step, (x, cache))
        return h

    return timeit(run, lm, cache, x0)


a = timeit(chain_mats, lm, x0)
print(f"A matmul chain only:        {a:.3f} ms/step", flush=True)
b = timeit(chain_full_path, lm, x0)
print(f"B + head+argmax+embed:      {b:.3f} ms/step", flush=True)
for bucket in (512, 1024, 2048):
    c = full_decode(bucket)
    print(f"C full decode bucket={bucket}: {c:.3f} ms/step", flush=True)

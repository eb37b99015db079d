"""Where does the paged per-row decode gap come from? (BENCH_r04: dense
316 tok/s/row at 16 rows vs paged 221 at 21.)

Phases, all fori_loop-in-jit with a carried data dependency
(docs/PERFORMANCE.md pitfalls 5-7), identical B and window:
  1. dense kernel alone        (layers_decode_fused, B rows, W window)
  2. paged kernel, contiguous  (one run DMA per row per tensor per layer)
  3. paged kernel, fragmented  (per-page fallback: pb copies per row)
  4. dense full glue           (decode_step_greedy path cost)
  5. paged full glue           (forward_paged_decode_fused + scatter)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/paged_row_gap_probe.py [B] [W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import timing  # noqa: F401,E402  (sets the persistent compile cache)

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.kernels import decode_layer, decode_layer_paged
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
PS = 64
PB = W // PS
STEPS = 50

cfg = paligemma_3b_224()
tc = cfg.text_config
t0 = time.time()
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
print(f"init_params: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
q = quantize_lm_for_serving(params)
del params
lm = dict(q["lm"])
lm["layers"] = jax.jit(decode_layer.repack_layers)(lm["layers"])
print(f"quantize+repack: {time.time() - t0:.1f}s", flush=True)
L = tc.num_hidden_layers
hd = tc.head_dim
K = tc.hidden_size
rng = np.random.default_rng(0)


def sync(x):
    return np.asarray(jax.device_get(x.reshape(-1)[0]))


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / STEPS * 1e3  # ms/step


x0 = jnp.asarray(rng.normal(size=(B, 1, K)) * 0.02, jnp.bfloat16)
cos = jnp.ones((B, hd), jnp.bfloat16)
sin = jnp.zeros((B, hd), jnp.bfloat16)
pos = jnp.full((B,), W - 2, jnp.int32)
valid = jnp.ones((B, W), bool)

# --- 1. dense kernel alone
kc = jnp.asarray(rng.normal(size=(L, B, W, hd)) * 0.1, jnp.bfloat16)
vc = jnp.asarray(rng.normal(size=(L, B, W, hd)) * 0.1, jnp.bfloat16)


@jax.jit
def dense_loop(x, layers, kc, vc):
    def body(i, carry):
        h, _, _ = decode_layer.layers_decode_fused(
            carry, layers, kc, vc, pos, valid, cos, sin, W,
            tc.num_attention_heads, hd, tc.rms_norm_eps,
        )
        return h + carry * jnp.bfloat16(1e-3)  # data dependency

    return jax.lax.fori_loop(0, STEPS, body, x)


print(f"B={B} W={W}  ms/step:", flush=True)
print(f"  dense kernel: {timeit(dense_loop, x0, lm['layers'], kc, vc):.3f}",
      flush=True)

# --- 2/3. paged kernel, contiguous vs fragmented tables
n_pages = B * PB + 8
kp = jnp.asarray(rng.normal(size=(L, n_pages, PS, hd)) * 0.1, jnp.bfloat16)
vp = jnp.asarray(rng.normal(size=(L, n_pages, PS, hd)) * 0.1, jnp.bfloat16)
pt_contig = jnp.asarray(
    np.arange(B * PB, dtype=np.int32).reshape(B, PB)
)
perm = rng.permutation(B * PB).astype(np.int32)
pt_frag = jnp.asarray(perm.reshape(B, PB))


def paged_loop_maker(pt):
    @jax.jit
    def loop(x, layers, kp, vp):
        def body(i, carry):
            h, _, _ = decode_layer_paged.layers_decode_fused_paged(
                carry, layers, kp, vp, pt, pos, cos, sin,
                tc.num_attention_heads, hd, tc.rms_norm_eps,
            )
            return h + carry * jnp.bfloat16(1e-3)

        return jax.lax.fori_loop(0, STEPS, body, x)

    return loop


print(f"  paged kernel contiguous: "
      f"{timeit(paged_loop_maker(pt_contig), x0, lm['layers'], kp, vp):.3f}",
      flush=True)
print(f"  paged kernel fragmented: "
      f"{timeit(paged_loop_maker(pt_frag), x0, lm['layers'], kp, vp):.3f}",
      flush=True)

# --- 4/5. full glue paths (cache update + head excluded: greedy_head off,
# logits head excluded by slicing? -> use the real forwards)
qlm = dict(q)
qlm["lm"] = lm
emb = lm["embed"]


@jax.jit
def dense_glue(qlm, tok, kc, vc):
    def body(i, carry):
        tok, kc, vc = carry
        t, cache = paligemma.decode_step_greedy(
            qlm, cfg, tok, {"k": kc.reshape(L, B, W, 1, hd),
                            "v": vc.reshape(L, B, W, 1, hd)},
            cache_pos=pos, kv_valid=valid,
            position_ids=jnp.full((B,), W - 1, jnp.int32), kv_bucket=W,
        )
        return t, cache["k"].reshape(L, B, W, hd), cache["v"].reshape(
            L, B, W, hd
        )

    tok, kc, vc = jax.lax.fori_loop(0, STEPS, body, (tok, kc, vc))
    return tok


tok0 = jnp.full((B,), 7, jnp.int32)
print(f"  dense glue (decode_step_greedy): "
      f"{timeit(dense_glue, qlm, tok0, kc, vc):.3f}", flush=True)


@jax.jit
def paged_glue(qlm, tok, kp, vp):
    def body(i, carry):
        tok, kp, vp = carry
        logits, pool = gemma.forward_paged_decode_fused(
            qlm["lm"], tc, qlm["lm"]["embed"][tok][:, None, :],
            jnp.full((B, 1), W - 1, jnp.int32),
            {"k": kp.reshape(L, n_pages, PS, 1, hd),
             "v": vp.reshape(L, n_pages, PS, 1, hd)},
            pt_contig, pos, PB,
        )
        t = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return t, pool["k"].reshape(L, n_pages, PS, hd), pool["v"].reshape(
            L, n_pages, PS, hd
        )

    tok, kp, vp = jax.lax.fori_loop(0, STEPS, body, (tok, kp, vp))
    return tok


print(f"  paged glue (forward_paged_decode_fused + XLA head): "
      f"{timeit(paged_glue, qlm, tok0, kp, vp):.3f}", flush=True)

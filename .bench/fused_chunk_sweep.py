"""Sweep the fused decode kernel's MLP chunk width (bs) at 3B geometry.

VERDICT r3 item 5 / ROADMAP "Performance": the int8->bf16 VPU convert
paces the MXU at small chunk sizes and the per-chunk DMA/compute handoff
isn't perfectly overlapped. Wider chunks amortize both (fewer
ring-boundary waits, wider converts and dots); the cost is VMEM ring
size (2 slots x 3 streams x K x bs int8) and a longer pipeline ramp.

Times the FULL fused decode step (all 18 layers + greedy head via
gemma.forward) with decode_mlp.repack(bs=...) for bs in the sweep, using
the in-jit N-step chain from fused_layer_bench.py (tunnel-safe: one sync
per chain, body data-dependent on the carry).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.kernels import decode_layer, decode_mlp
from paligemma_tpu.models import paligemma, gemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

N = 200
BW = 819e9


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=3):
    o = fn(*args); _sync(o[0] if isinstance(o, tuple) else o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        _sync(o[0] if isinstance(o, tuple) else o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / N * 1e3


cfg = paligemma_3b_224()
tc = cfg.text_config
params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
lm = quantize_lm_for_serving(params)["lm"]
del params

B, S = 1, 2048
POS = 600
BUCKET = 1024

cache = gemma.init_kv_cache(tc, B, S, jnp.bfloat16)
kf = jax.random.normal(jax.random.PRNGKey(1), cache["k"].shape, jnp.bfloat16) * 0.1
vf = jax.random.normal(jax.random.PRNGKey(2), cache["v"].shape, jnp.bfloat16) * 0.1
valid = jnp.zeros((B, S), bool).at[:, : POS + 1].set(True)
emb = jax.random.normal(jax.random.PRNGKey(3), (B, 1, tc.hidden_size), jnp.bfloat16) * 0.02

lm_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(lm)) - lm["embed"].size * 2
sol_ms = lm_bytes / BW * 1e3
print(f"SoL {sol_ms:.3f} ms/step ({1e3/sol_ms:.1f} tok/s)", flush=True)


def chain(lmx):
    @jax.jit
    def run(lmx, cache, x, valid):
        def body(i, carry):
            h, c = carry
            logits, c = gemma.forward(
                lmx, tc, h, jnp.full((B, 1), POS + 1, jnp.int32), c,
                cache_pos=jnp.asarray(POS, jnp.int32), kv_valid=valid,
                kv_bucket=BUCKET, fused_layer=True,
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, 0]
            e = jnp.take(lmx["embed"], tok, axis=0)[:, None, :].astype(jnp.bfloat16)
            return e * 0.01, c

        h, c = jax.lax.fori_loop(0, N, body, (x, cache))
        return h

    return timeit(run, lmx, {"k": kf, "v": vf}, emb, valid)


# ---- head-only sweep: 527 MB/step (21% of decode bytes), SoL 0.643 ms.
# pick_block gives 6272 (41 chunks); wider padded chunks mean fewer
# ring-boundary waits at the cost of dead padded columns ----
from paligemma_tpu.kernels import decode_head

head_bytes = lm["head_q"]["w8"].size + lm["head_q"]["s"].size * 4
y0 = jax.random.normal(jax.random.PRNGKey(4), (1, tc.hidden_size), jnp.bfloat16)


def head_chain(hb):
    @jax.jit
    def run(hb, y):
        def body(i, yy):
            tok = decode_head.head_argmax_fused(yy, hb)
            return yy * (1.0 + tok[0].astype(jnp.bfloat16) * 1e-9)
        return jax.lax.fori_loop(0, N, body, y)

    return timeit(run, hb, y0)


h_sol = head_bytes / BW * 1e3
for hbs in (None, 8192, 12544, 16384):
    try:
        hb = jax.jit(lambda h: decode_head.repack_head(h, bs=hbs))(lm["head_q"])
        ms = head_chain(hb)
        nch = hb["w8_blk"].shape[0]
        print(f"head bs={hb['w8_blk'].shape[2]:5d} nch={nch:3d}: {ms:.3f} ms "
              f"({100*h_sol/ms:.1f}% of head SoL {h_sol:.3f})", flush=True)
        del hb
    except Exception as e:
        print(f"head bs={hbs}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

base_mlp = {"gateup": lm["layers"]["mlp"]["gateup"], "down": lm["layers"]["mlp"]["down"]}
for bs in (512, 1024, 2048, 4096):
    mlp_packed = jax.jit(lambda m: decode_mlp.repack(m, bs=bs))(base_mlp)
    layers = dict(lm["layers"])
    layers["mlp"] = mlp_packed
    packed = jax.jit(decode_layer.repack_layers)(layers)
    lmx = dict(lm)
    lmx["layers"] = packed
    try:
        ms = chain(lmx)
        print(f"bs={bs:5d} nc={16384//bs:3d}: {ms:.3f} ms/step "
              f"({1e3/ms:.1f} tok/s, {100*sol_ms/ms:.1f}% of SoL)", flush=True)
    except Exception as e:
        print(f"bs={bs:5d}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
    del lmx, packed, layers, mlp_packed

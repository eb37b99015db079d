"""Layout/dtype alternatives for the decode-shape small matmuls.

Shapes: qkv (2048 -> 2560), o (2048 -> 2048), per layer, 18 layers stacked,
x = (1, 1, 2048) bf16. Sequential chain (out feeds next input) inside one
jit, N reps; also re-measures gateup/down and the head for each variant's
sanity. Variants:
  int8_kn : w8 (K, N) + per-col scale (current default)
  int8_nk : w8t (N, K) + scale (int8_matmul_nmajor path)
  bf16    : dense bf16 weights
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

N = 300
BW = 819e9
L = 18


def _sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, reps=3):
    o = fn(*args); _sync(o)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); o = fn(*args); _sync(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / N * 1e3


key = jax.random.PRNGKey(0)


def run_case(tag, K, NN):
    kw, kx = jax.random.split(jax.random.fold_in(key, K * NN))
    w = jax.random.normal(kw, (L, K, NN), jnp.float32) * 0.02
    w8 = jnp.clip(jnp.round(w * 127 / 0.06), -127, 127).astype(jnp.int8)
    s = jnp.full((L, 1, NN), 0.06 / 127, jnp.float32)
    w8t = jnp.swapaxes(w8, 1, 2)
    st = jnp.swapaxes(s, 1, 2)
    wb = w.astype(jnp.bfloat16)
    x0 = jnp.full((1, 1, K), 0.01, jnp.bfloat16)

    def chain(matmul, weights):
        @jax.jit
        def run(weights, x):
            def body(h, lw):
                out = matmul(h, lw)
                return out[..., :K] * 1e-3 + h * 0.5, None

            def step(i, h):
                h, _ = jax.lax.scan(body, h, weights)
                return h

            return jax.lax.fori_loop(0, N, step, x)

        return timeit(run, weights, x0)

    def mm_kn(h, lw):
        out = jax.lax.dot_general(
            h, lw["w8"].astype(h.dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (out * lw["s"]).astype(h.dtype)

    def mm_nk(h, lw):
        out = jax.lax.dot_general(
            h, lw["w8t"].astype(h.dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (out * lw["st"][..., 0]).astype(h.dtype)

    def mm_bf(h, lw):
        return jnp.einsum("bsk,kn->bsn", h, lw["wb"]).astype(h.dtype)

    i8 = K * NN * L
    for tag2, mm, ws, byts in (
        ("int8_kn", mm_kn, {"w8": w8, "s": s}, i8),
        ("int8_nk", mm_nk, {"w8t": w8t, "st": st}, i8),
        ("bf16", mm_bf, {"wb": wb}, i8 * 2),
    ):
        ms = chain(mm, ws)
        eff = byts / (ms / 1e3) / BW
        print(f"{tag} {tag2:8s} {ms:.3f} ms/{L}ops  eff {eff*100:5.1f}%  "
              f"+{(ms - byts / BW * 1e3) / L * 1e3:5.1f} us/op", flush=True)


run_case("qkv   (2048x2560)", 2048, 2560)
run_case("o     (2048x2048)", 2048, 2048)
run_case("gateup(2048x32768)", 2048, 32768)

"""Probe: is the MXU's int8 path faster than bf16 at PREFILL shapes?

Round-3 established int8-MXU is a dead end at the decode-MLP chunk shape
(8,2048)@(2048,1024) — but that shape is HBM-bound, so MXU rate was never
the limiter (.bench/int8_mxu_probe.py, docs/PERFORMANCE.md "int8
activation quant"). Prefill at 896px is COMPUTE-bound (M=4106 rows through
the LM chain at 86% of bf16 peak, docs/PERFORMANCE.md "Prefill MFU"), so a
2x int8 MXU rate would halve LM prefill time — the single biggest lever on
the 216 ms 896px TTFT (VERDICT r4 #7).

A/B at the two dominant shapes, XLA dots, fori-loop-in-jit with a
data-dependent carry (pitfalls 5-7):
  LM MLP   (4096, 2048) @ (2048, 16384)
  vision   (4096, 1152) @ (1152, 4304)
paths: bf16@bf16 / int8@int8->int32 / bf16@int8 (mixed) / quant+int8
(dynamic per-row activation quant included, the real deployable path).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/int8_prefill_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import sync as _sync  # noqa: E402  (sets the compile cache)

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 30


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
    return best / STEPS


def run(M, K, N, tag):
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wb = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    flops = 2.0 * M * K * N

    @jax.jit
    def bf16_loop(x, w):
        def body(i, c):
            o = jnp.dot(c, w, preferred_element_type=jnp.float32)
            # full-N reduce keeps the whole matmul live (pitfall 7)
            return c + (o.sum(1) * jnp.float32(1e-9)).astype(c.dtype)[:, None]

        return jax.lax.fori_loop(0, STEPS, body, x)

    @jax.jit
    def i8_loop(x, w):
        def body(i, c):
            o = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return c ^ (o.sum(1) & 1).astype(jnp.int8)[:, None]

        return jax.lax.fori_loop(0, STEPS, body, x)

    @jax.jit
    def mixed_loop(x, w):
        def body(i, c):
            o = jnp.dot(c, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return c + (o.sum(1) * jnp.float32(1e-9)).astype(c.dtype)[:, None]

        return jax.lax.fori_loop(0, STEPS, body, x)

    @jax.jit
    def quant_i8_loop(x, w):
        def body(i, c):
            a = jnp.max(jnp.abs(c), axis=1, keepdims=True) / 127.0
            q = jnp.clip(jnp.round(c / a), -127, 127).astype(jnp.int8)
            o = jax.lax.dot_general(
                q, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return c + (o.sum(1).astype(jnp.float32)
                        * jnp.float32(1e-12)).astype(c.dtype)[:, None]

        return jax.lax.fori_loop(0, STEPS, body, x)

    for name, fn, a, b in (
        ("bf16 @ bf16", bf16_loop, xb, wb),
        ("int8 @ int8", i8_loop, x8, w8),
        ("bf16 @ int8 (mixed)", mixed_loop, xb, w8),
        ("quant + int8 @ int8", quant_i8_loop, xb, w8),
    ):
        try:
            dt = timeit(fn, a, b)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag} {name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        print(f"  {tag} {name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    print("LM MLP shape (4096,2048)@(2048,16384):", flush=True)
    run(4096, 2048, 16384, "lm")
    print("vision MLP shape (4096,1152)@(1152,4304):", flush=True)
    run(4096, 1152, 4304, "vis")

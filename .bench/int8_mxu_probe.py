"""Probe: int8 x int8 MXU accumulation inside a Pallas kernel.

Round-2 analysis (docs/ROADMAP.md, memory): the fused decode layer runs at
88.7% of HBM bandwidth in-kernel, paced by the int8->bf16 VPU weight
convert feeding the MXU, not by DMA. The next decode jump needs the MXU to
consume int8 directly (int8 activations, int32 accumulation). This probe
answers, on THIS toolchain:

1. does ``dot_general(int8, int8, preferred_element_type=int32)`` compile
   and produce exact products in a Pallas kernel? (Mosaic int8 shifts are
   known-broken here — kernels/ablation/quant4.py — so nothing is assumed.)
2. VMEM-resident throughput A/B: the convert path (int8 weights -> bf16 ->
   MXU bf16 dot) vs the int8 path (int8 dot, int32 accum) at the decode-MLP
   chunk shape (8, 2048) @ (2048, 1024).
"""

import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


B, K, BS, NCH = 8, 2048, 1024, 8  # 8 chunks resident in VMEM (16 MB)
INNER = 4  # fori sweeps over the chunks per grid step


def _correct_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def check_correctness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (B, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, BS)), jnp.int8)
    out = pl.pallas_call(
        _correct_kernel,
        out_shape=jax.ShapeDtypeStruct((B, BS), jnp.int32),
        interpret=False,
    )(x, w)
    want = np.asarray(x, np.int64) @ np.asarray(w, np.int64)
    got = np.asarray(out, np.int64)
    exact = np.array_equal(got, want)
    print(f"int8xint8->int32 in-kernel: exact={exact} "
          f"maxerr={np.abs(got-want).max()}", flush=True)
    return exact


def _conv_kernel(x_ref, w_ref, o_ref, acc, *, n):
    x = x_ref[:]

    def body(i, _):
        w = w_ref[i].astype(jnp.bfloat16)  # the VPU convert being probed
        acc[:] += jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    acc[:] = jnp.zeros_like(acc)
    jax.lax.fori_loop(0, n, body, 0)
    o_ref[:] = acc[:].astype(o_ref.dtype)


def _i8_kernel(x_ref, w_ref, o_ref, acc, *, n):
    x = x_ref[:]

    def body(i, _):
        acc[:] += jax.lax.dot_general(
            x, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return 0

    acc[:] = jnp.zeros_like(acc)
    jax.lax.fori_loop(0, n, body, 0)
    o_ref[:] = acc[:]


def bench():
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (B, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (NCH, K, BS)), jnp.int8)

    conv = pl.pallas_call(
        functools.partial(_conv_kernel, n=NCH),
        out_shape=jax.ShapeDtypeStruct((B, BS), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, BS), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    i8 = pl.pallas_call(
        functools.partial(_i8_kernel, n=NCH),
        out_shape=jax.ShapeDtypeStruct((B, BS), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, BS), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    bytes_per = NCH * K * BS  # int8 weights touched per call

    INNER_CALLS = 20  # kernel calls per jit: amortizes the ~0.7 ms tunnel
    for name, f, xx in (("bf16-convert", conv, xb), ("int8-mxu", i8, x8)):
        def many(a, b, f=f):
            o = None
            for _ in range(INNER_CALLS):
                o = f(a, b)
                a = a + (o[0:1, 0:1] * 0).astype(a.dtype)  # serialize
            return o

        try:
            fj = jax.jit(many)
            out = fj(xx, w)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE/RUN FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            continue
        reps, calls = 3, 20
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            o = out
            for _ in range(calls):
                o = fj(xx, w)
            sync(o)
            dt = (time.perf_counter() - t0) / calls / INNER_CALLS
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best*1e6:.1f} us/kernel "
              f"({bytes_per/best/1e9:.0f} GB/s weight-consume rate)",
              flush=True)


if __name__ == "__main__":
    ok = check_correctness()
    bench()

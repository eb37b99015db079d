"""Bench the run-coalesced paged kernel (paged_decode_attention_runs) vs
the round-2 batched kernel, under contiguous (allocator common case) and
fully-permuted (worst case) page tables, sweeping pages_per_step and
rows_per_matmul. Target: >= 500 GB/s effective at 1024-token rows
(VERDICT r2 item 4)."""

import sys

sys.path.insert(0, "/root/repo")

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.kernels.paged_attention import (
    paged_decode_attention_batched,
    paged_decode_attention_runs,
    reference_paged_decode_attention,
)


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    B = int(os.environ.get("B", "16"))
    HQ, HKV, D = 8, 1, 256
    PS = int(os.environ.get("PS", "64"))
    KV = int(os.environ.get("KV", "1024"))
    P_MAX = KV // PS
    N_PAGES = B * P_MAX + 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, HQ, D)), jnp.bfloat16)
    k_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, HKV, D)) * 0.1, jnp.bfloat16
    )
    v_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, HKV, D)) * 0.1, jnp.bfloat16
    )
    # contiguous: slot r owns run [1 + r*P_MAX, 1 + (r+1)*P_MAX)
    contig = np.arange(B * P_MAX).reshape(B, P_MAX) + 1
    perm = rng.permutation(B * P_MAX).reshape(B, P_MAX) + 1
    kv_len = jnp.full((B,), KV, jnp.int32)

    useful = B * KV * D * HKV * 2 * 2  # k+v, bf16
    print(f"B={B} PS={PS} KV={KV}  useful bytes/call: {useful/1e6:.1f} MB",
          flush=True)

    L = 18
    cases = []
    combos = os.environ.get("COMBOS", "8:2,8:4,16:2,16:4,16:8")
    if os.environ.get("BASELINE", "0") == "1":
        cases.append(("batched8", None, None,
                      lambda *a, **k: paged_decode_attention_batched(
                          *a, pages_per_step=max(P_MAX // 8, 1), **k)))
    for combo in combos.split(","):
        pps, rpm = (int(x) for x in combo.split(":"))
        if pps > P_MAX or rpm > B:
            continue
        cases.append((
            f"runs p{pps} r{rpm}", pps, rpm,
            lambda *a, pps=pps, rpm=rpm, **k: paged_decode_attention_runs(
                *a, pages_per_step=pps, rows_per_matmul=rpm, **k),
        ))

    for tab_name, tab in (("contig", contig), ("permuted", perm)):
        table = jnp.asarray(tab, jnp.int32)
        want = np.asarray(
            reference_paged_decode_attention(q, k_pool, v_pool, table, kv_len),
            np.float32,
        )
        for name, pps, rpm, fn in cases:
            try:
                got = np.asarray(
                    fn(q, k_pool, v_pool, table, kv_len), np.float32
                )
            except Exception as e:  # Mosaic SIGABRT -> JaxRuntimeError
                print(f"{tab_name} {name}: CRASH {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            err = np.abs(got - want).max()
            if err > 3e-2:
                print(f"{tab_name} {name}: WRONG err={err}", flush=True)
                continue

            def many(q, k_pool, v_pool, table, kv_len, fn=fn):
                # fori_loop: body traced ONCE (unrolling 18 pallas_calls
                # costs minutes of trace time on a 1-core host) and the
                # q + acc*0 carry dependency stops XLA hoisting the body
                def step(_, acc):
                    return acc + fn(q + acc * 0, k_pool, v_pool, table, kv_len)

                return jax.lax.fori_loop(0, L, step, jnp.zeros_like(q))

            f = jax.jit(many)
            out = f(q, k_pool, v_pool, table, kv_len)
            sync(out)
            reps, n_calls = 3, 10
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                o = out
                for _ in range(n_calls):
                    o = f(q, k_pool, v_pool, table, kv_len)
                sync(o)
                dt = (time.perf_counter() - t0) / n_calls / L
                best = dt if best is None else min(best, dt)
            print(
                f"{tab_name} {name}: {best*1e6:.1f} us/kernel -> "
                f"{useful/best/1e9:.1f} GB/s (err {err:.4f})",
                flush=True,
            )


if __name__ == "__main__":
    main()

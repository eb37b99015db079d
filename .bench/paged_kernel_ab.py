"""A/B: one-page-per-step vs multi-page-per-step paged attention kernels
(effective HBM bandwidth at Gemma decode geometry, 1024-token rows)."""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.kernels.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_batched,
    paged_decode_attention_multi,
    reference_paged_decode_attention,
)


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def main():
    import os

    B, HQ, HKV, D = 16, 8, 1, 256
    PS = int(os.environ.get("PS", "64"))
    KV = 1024
    P_MAX = KV // PS  # 16 pages/row
    N_PAGES = B * P_MAX + 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, HQ, D)), jnp.bfloat16)
    k_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, HKV, D)) * 0.1, jnp.bfloat16
    )
    v_pool = jnp.asarray(
        rng.normal(size=(N_PAGES, PS, HKV, D)) * 0.1, jnp.bfloat16
    )
    perm = rng.permutation(B * P_MAX).reshape(B, P_MAX)
    table = jnp.asarray(perm, jnp.int32)
    kv_len = jnp.full((B,), KV, jnp.int32)

    useful = B * KV * D * HKV * 2 * 2  # k+v, bf16
    print(f"useful bytes/call: {useful/1e6:.1f} MB", flush=True)

    # correctness on-chip first
    want = np.asarray(
        reference_paged_decode_attention(q, k_pool, v_pool, table, kv_len),
        np.float32,
    )
    L = 18  # kernel calls per jit, as in the production 18-layer decode

    p_row = KV // PS  # pages per 1024-token row
    for name, fn in (
        ("one-page", paged_decode_attention),
        ("multi8", lambda *a, **k: paged_decode_attention_multi(
            *a, pages_per_step=min(8, p_row), **k)),
        ("batched2", lambda *a, **k: paged_decode_attention_batched(
            *a, pages_per_step=max(p_row // 2, 1), **k)),
        ("batched4", lambda *a, **k: paged_decode_attention_batched(
            *a, pages_per_step=max(p_row // 4, 1), **k)),
        ("batched8", lambda *a, **k: paged_decode_attention_batched(
            *a, pages_per_step=max(p_row // 8, 1), **k)),
    ):
        got = np.asarray(fn(q, k_pool, v_pool, table, kv_len), np.float32)
        err = np.abs(got - want).max()
        assert err < 3e-2, (name, err)

        # L kernel calls inside ONE jit (the production shape: one call per
        # decoder layer per tick) so the per-dispatch tunnel cost (~0.7 ms)
        # amortizes away and the number isolates the kernel.
        def many(q, k_pool, v_pool, table, kv_len, fn=fn):
            acc = jnp.zeros_like(q)
            for i in range(L):
                acc = acc + fn(
                    q + acc * 0, k_pool, v_pool, table, kv_len
                )
            return acc

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
            f"{name}: {best*1e6:.1f} us/kernel -> {useful/best/1e9:.1f} GB/s "
            f"effective (err {err:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()

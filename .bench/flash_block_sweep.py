"""Sweep flash-attention block sizes at the 448px prefill shape (Sq=1034,
8 q heads / 1 kv head, d=256) — 18 layers per measurement, chained async
dispatches with one end sync (tunnel methodology)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.bench")

import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.kernels.flash_attention import flash_attention

L = 18


from timing import sync, dev_time  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    b, s, nh, nkv, hd = 1, 1034, 8, 1, 256
    q = jnp.asarray(rng.normal(size=(b, s, nh, hd)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.bfloat16)
    prefix = jnp.full((b,), s, jnp.int32)
    attn_flops = 2 * 2 * s * s * L * nh * hd

    for bq, bk, name in [
        (256, 256, "old default 256/256"),
        (None, None, "auto"),
        (256, None, "bq256/whole-kv"),
        (512, None, "bq512/whole-kv"),
        (1024, None, "bq1024/whole-kv"),
        (512, 512, "bq512/bk512"),
    ]:
        def fa18(q, kk, vv, bq=bq, bk=bk):
            def body(i, acc):
                a = flash_attention(q, kk, vv, prefix, prefix,
                                    scale=hd**-0.5, block_q=bq, block_k=bk)
                return acc + a
            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(q))

        t = dev_time(jax.jit(fa18), q, kk, vv)
        print(f"{name:24s} {t/L*1e6:7.0f} us/layer  "
              f"{attn_flops/t/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

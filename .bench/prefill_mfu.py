"""Accurate device-time MFU for the 448px prefill LM stack.

The tunneled chip's host sync costs ~30-40 ms, so per-call wall timing
(profile_prefill_448.py) understates TF/s badly. This probe uses the
differenced timer (.bench/timing.py): device ~= (wall(k2)-wall(k1))/(k2-k1),
which cancels the sync constant and the dispatch pipeline fill.

Pieces measured at the 448px prefill shape (S=1034 tokens, 3B geometry):
  - full LM stack (flash path, cache writes)
  - the raw matmul chain alone (qkv/o/gate/up/down as XLA dots)
  - flash attention alone (18 layers worth)
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/.bench")

import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_448
from paligemma_tpu.models import gemma

V5E_PEAK = 197e12


from timing import sync, dev_time  # noqa: E402


def main():
    cfg = paligemma_3b_448()
    tc = cfg.text_config
    b, s = 1, cfg.vision_config.num_patches + 10
    rng = np.random.default_rng(0)
    H, I = tc.hidden_size, tc.intermediate_size
    nh, nkv, hd = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
    L = tc.num_hidden_layers

    params = gemma.init_params(jax.random.PRNGKey(0), tc, jnp.bfloat16)
    embeds = jnp.asarray(rng.normal(size=(b, s, H)) * 0.02, jnp.bfloat16)
    pos = jnp.arange(1, s + 1, dtype=jnp.int32)[None]
    prefix = jnp.full((b,), s, jnp.int32)

    cache0 = gemma.init_kv_cache(tc, b, 2048, jnp.bfloat16)

    def lm(params, embeds, cache):
        logits, c2 = gemma.forward(
            params, tc, embeds, pos, cache,
            cache_pos=jnp.asarray(0, jnp.int32),
            kv_valid=jnp.ones((b, 2048), bool),
            flash_lens=(prefix, prefix),
            logits_idx=jnp.full((b,), s - 1, jnp.int32),
        )
        return logits

    lmj = jax.jit(lm)
    t_lm = dev_time(lmj, params, embeds, cache0)

    lm_flops = 2 * s * L * (
        H * (nh * hd + 2 * nkv * hd) + nh * hd * H + 3 * H * I
    )
    attn_flops = 2 * 2 * s * s * L * nh * hd
    head_flops = 2 * b * H * tc.vocab_size
    tot = lm_flops + attn_flops + head_flops
    print(f"LM stack: {t_lm*1e3:.2f} ms device  "
          f"{tot/t_lm/1e12:.1f} TF/s ({tot/t_lm/V5E_PEAK*100:.0f}% peak)",
          flush=True)

    # --- raw matmul chain (no attention, no norms): the MXU ceiling for
    # this op sequence as XLA schedules it
    w_qkv = jnp.asarray(rng.normal(size=(H, (nh + 2 * nkv) * hd)), jnp.bfloat16)
    w_o = jnp.asarray(rng.normal(size=(nh * hd, H)), jnp.bfloat16)
    w_g = jnp.asarray(rng.normal(size=(H, I)), jnp.bfloat16)
    w_u = jnp.asarray(rng.normal(size=(H, I)), jnp.bfloat16)
    w_d = jnp.asarray(rng.normal(size=(I, H)), jnp.bfloat16)

    def chain(x, wq, wo, wg, wu, wd):
        def body(i, x):
            qkv = x @ wq
            a = qkv[..., : nh * hd]
            x1 = x + a @ wo
            g = jax.nn.gelu(x1 @ wg) * (x1 @ wu)
            return x1 + g @ wd
        return jax.lax.fori_loop(0, L, body, x)

    cj = jax.jit(chain)
    x0 = embeds.reshape(s, H)
    t_chain = dev_time(cj, x0, w_qkv, w_o, w_g, w_u, w_d)
    print(f"matmul chain: {t_chain*1e3:.2f} ms  "
          f"{lm_flops/t_chain/1e12:.1f} TF/s "
          f"({lm_flops/t_chain/V5E_PEAK*100:.0f}% peak)", flush=True)

    # --- single big matmuls at the shape, for per-op ceilings
    x2 = jnp.asarray(rng.normal(size=(s, H)), jnp.bfloat16)
    for name, w in [("qkv (2048x2560)", w_qkv), ("gate (2048x16384)", w_g),
                    ("down (16384x2048)", None)]:
        if w is None:
            xi = jnp.asarray(rng.normal(size=(s, I)), jnp.bfloat16)
            f = jax.jit(lambda a, b_: a @ b_)
            t = dev_time(f, xi, w_d)
            fl = 2 * s * I * H
        else:
            f = jax.jit(lambda a, b_: a @ b_)
            t = dev_time(f, x2, w)
            fl = 2 * s * H * w.shape[1]
        print(f"  {name}: {t*1e6:.0f} us  {fl/t/1e12:.1f} TF/s "
              f"({fl/t/V5E_PEAK*100:.0f}% peak)", flush=True)

    # --- flash attention alone, 18 layers
    from paligemma_tpu.kernels.flash_attention import flash_attention

    q = jnp.asarray(rng.normal(size=(b, s, nh, hd)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(size=(b, s, nkv, hd)), jnp.bfloat16)

    def fa18(q, kk, vv):
        def body(i, acc):
            a = flash_attention(q, kk, vv, prefix, prefix, scale=hd**-0.5)
            return acc + a
        return jax.lax.fori_loop(0, L, body, jnp.zeros_like(q))

    fj = jax.jit(fa18)
    t_fa = dev_time(fj, q, kk, vv)
    print(f"flash x18: {t_fa*1e3:.2f} ms  "
          f"{attn_flops/t_fa/1e12:.1f} TF/s "
          f"({attn_flops/t_fa/V5E_PEAK*100:.0f}% peak)", flush=True)

    # accounting
    print(f"\naccounting: chain {t_chain*1e3:.2f} + flash {t_fa*1e3:.2f} "
          f"= {(t_chain+t_fa)*1e3:.2f} ms vs full {t_lm*1e3:.2f} ms "
          f"(gap = norms/rope/cache/head/glue)", flush=True)


if __name__ == "__main__":
    main()

"""896px TTFT decomposition (VERDICT r4 #7): device-time split of the
4096-patch prefill, differenced timing (.bench/timing.py).

Pieces:
  - vision tower at S=4096 (flash path — the default at >= 2048 patches)
  - LM stack over 4106 tokens, int8 tree (the serving path: XLA
    dequant-into-matmul) vs bf16 weights (the dequant tax at prefill)
  - roofline math printed against each measurement

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/prefill_896_probe.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from timing import dev_time  # noqa: E402  (sets the compile cache)

from paligemma_tpu.core.config import paligemma_3b_896
from paligemma_tpu.models import gemma, siglip
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

V5E_PEAK = 197e12


def main():
    cfg = paligemma_3b_896()
    vc = cfg.vision_config
    tc = cfg.text_config
    rng = np.random.default_rng(0)
    b = 1
    s_img = vc.num_patches  # 4096
    s = s_img + 10

    # ---- vision tower ----
    vparams = siglip.init_params(jax.random.PRNGKey(0), vc, jnp.bfloat16)
    pixels = jnp.asarray(
        rng.normal(size=(b, 3, vc.image_size, vc.image_size)), jnp.bfloat16
    )

    def vis(vparams, pixels):
        return siglip.encode(vparams, vc, pixels, attn="flash")

    visj = jax.jit(vis)
    t_vis = dev_time(visj, vparams, pixels)
    d, i, L = vc.hidden_size, vc.intermediate_size, vc.num_hidden_layers
    mm = 2 * s_img * (4 * d * d + 2 * d * i) * L
    att = 4 * s_img * s_img * d * L
    att_pad = att * 128 / vc.head_dim  # d=72 padded to 128 on the MXU
    print(f"vision tower S={s_img}: {t_vis*1e3:.1f} ms  "
          f"useful {(mm+att)/1e12:.2f} TF -> {(mm+att)/t_vis/1e12:.0f} TF/s "
          f"({(mm+att)/t_vis/V5E_PEAK*100:.0f}% peak; "
          f"{(mm+att_pad)/t_vis/V5E_PEAK*100:.0f}% counting the d72->128 "
          f"attention pad)", flush=True)

    # ---- LM stack: int8 tree vs bf16 ----
    lm_bf16 = gemma.init_params(jax.random.PRNGKey(1), tc, jnp.bfloat16)
    q = quantize_lm_for_serving({"lm": lm_bf16, "vision": {}, "proj": {}})
    lm_q = q["lm"]
    embeds = jnp.asarray(rng.normal(size=(b, s, tc.hidden_size)) * 0.02,
                         jnp.bfloat16)
    pos = jnp.arange(1, s + 1, dtype=jnp.int32)[None]
    prefix = jnp.full((b,), s, jnp.int32)
    max_seq = 8192

    def lm(params, embeds, cache):
        logits, _ = gemma.forward(
            params, tc, embeds, pos, cache,
            cache_pos=jnp.asarray(0, jnp.int32),
            kv_valid=jnp.ones((b, max_seq), bool),
            flash_lens=(prefix, prefix),
            logits_idx=jnp.full((b,), s - 1, jnp.int32),
        )
        return logits

    lmj = jax.jit(lm)
    H, I = tc.hidden_size, tc.intermediate_size
    nh, nkv, hd = (tc.num_attention_heads, tc.num_key_value_heads,
                   tc.head_dim)
    Lt = tc.num_hidden_layers
    mmt = 2 * s * (H * (nh + 2 * nkv) * hd + nh * hd * H + 3 * H * I) * Lt
    attt = 4 * s * s * nh * hd * Lt / 2  # causal-ish half

    for name, p in (("int8 tree", lm_q), ("bf16", lm_bf16)):
        cache0 = gemma.init_kv_cache(tc, b, max_seq, jnp.bfloat16)
        t = dev_time(lmj, p, embeds, cache0, k1=2, k2=6)
        print(f"LM stack S={s} {name}: {t*1e3:.1f} ms  "
              f"{(mmt+attt)/t/1e12:.0f} TF/s "
              f"({(mmt+attt)/t/V5E_PEAK*100:.0f}% peak)", flush=True)


if __name__ == "__main__":
    main()

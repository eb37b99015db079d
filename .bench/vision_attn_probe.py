"""A/B the fused vision-attention kernel vs XLA mha vs generic flash.

Measures (a) attention-only at the tower shape, (b) the full 27-layer tower,
at both 224px (S=256) and 448px (S=1024). Uses differenced device timing
(.bench/timing.py) — wall numbers on this tunnel are sync-dominated.
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timing import dev_time  # noqa: E402

from paligemma_tpu.core.config import paligemma_3b_224, paligemma_3b_448
from paligemma_tpu.models import siglip
from paligemma_tpu.ops import attention


def attn_only(cfg, variant):
    h, hd, s = cfg.num_attention_heads, cfg.head_dim, cfg.num_patches

    def run(qkv):
        q, k, v = qkv
        if variant == "xla":
            return attention.mha(q, k, v)
        if variant == "flash":
            from paligemma_tpu.kernels.flash_attention import flash_attention

            full = jnp.full((q.shape[0],), s, jnp.int32)
            return flash_attention(q, k, v, full, full)
        from paligemma_tpu.kernels.ablation.vision_attention import vision_attention

        if variant == "fused_hb8":
            return vision_attention(q, k, v, head_block=8)
        if variant == "fused_hb4":
            return vision_attention(q, k, v, head_block=4)
        return vision_attention(q, k, v)

    # chain 27 layers with a data dependency so XLA can't hoist/fuse away
    def chained(qkv):
        q, k, v = qkv
        for _ in range(27):
            o = run((q, k, v))
            q = q + o * 1e-3
        return q

    rng = np.random.default_rng(0)
    qkv = tuple(
        jnp.asarray(rng.normal(size=(1, s, h, hd)), jnp.bfloat16)
        for _ in range(3)
    )
    f = jax.jit(chained)
    t = dev_time(f, qkv)
    return t / 27


def tower(cfg, variant):
    key = jax.random.PRNGKey(0)
    params = siglip.init_params(key, cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(1, 3, cfg.image_size, cfg.image_size)), jnp.bfloat16
    )
    f = jax.jit(functools.partial(siglip.encode, cfg=cfg, attn=variant))
    t = dev_time(lambda p: f(p, pixel_values=pixels), params)
    return t


def main():
    from paligemma_tpu.core.config import paligemma_3b_896

    for name, cfg in (
        ("224px/S=256", paligemma_3b_224().vision_config),
        ("448px/S=1024", paligemma_3b_448().vision_config),
        # 896px: the fused ablation kernel can't fit (S, S) fp32 scores in
        # VMEM at S=4096 — only the materialized-vs-flash question matters
        ("896px/S=4096", paligemma_3b_896().vision_config),
    ):
        print(f"--- {name} ---", flush=True)
        variants = ("xla", "flash", "fused", "fused_hb8", "fused_hb4")
        if cfg.num_patches > 2048:
            variants = ("xla", "flash")
        for variant in variants:
            try:
                t = attn_only(cfg, variant)
                print(f"attn {variant:10s}: {t*1e6:7.1f} us/layer", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"attn {variant:10s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
        tower_variants = ("xla", "flash", "fused")
        if cfg.num_patches > 2048:
            tower_variants = ("xla", "flash")
        for variant in tower_variants:
            try:
                t = tower(cfg, variant)
                print(f"tower {variant:9s}: {t*1e3:7.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"tower {variant:9s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

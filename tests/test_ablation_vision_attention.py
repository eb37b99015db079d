"""Fused vision-tower attention kernel (kernels/vision_attention.py).

The tower's MHA is full bidirectional attention over a fixed patch count
(ref: modeling_siglip.py:96-136) — no mask, no padding. The kernel must
match ops.attention.mha bit-for-tolerance at the real SigLIP-So400m
geometry (head_dim=72, which pads to the 128 lane tile).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.kernels.ablation.vision_attention import vision_attention
from paligemma_tpu.ops import attention


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (1, 256, 16, 72),  # So400m @ 224px
        (2, 128, 4, 64),
        (1, 1024, 16, 72),  # So400m @ 448px
    ],
)
def test_matches_mha(b, s, h, d):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        for _ in range(3)
    )
    out = vision_attention(q, k, v)
    ref = attention.mha(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_head_block_variants_agree():
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 256, 16, 72)), jnp.float32)
        for _ in range(3)
    )
    full = vision_attention(q, k, v, head_block=16)
    for hb in (8, 4, 1):
        np.testing.assert_allclose(
            vision_attention(q, k, v, head_block=hb), full, atol=1e-6
        )


def test_rejects_unaligned_seq():
    q = jnp.zeros((1, 100, 4, 64))
    with pytest.raises(NotImplementedError):
        vision_attention(q, q, q)


def test_bf16_close_to_fp32():
    rng = np.random.default_rng(2)
    qf, kf, vf = (
        jnp.asarray(rng.normal(size=(1, 128, 4, 72)), jnp.float32)
        for _ in range(3)
    )
    ref = attention.mha(qf, kf, vf)
    out = vision_attention(
        qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
        vf.astype(jnp.bfloat16),
    )
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.15


def test_dispatch_modes():
    """models/paligemma keeps XLA at pad-wasting head_dim off-mesh (the
    fused kernel measured ~parity there — ablation, not a default) and the
    sharded flash path under a mesh."""
    from paligemma_tpu.core.config import paligemma_3b_224
    from paligemma_tpu.models.paligemma import _vision_attn_mode

    cfg = paligemma_3b_224()  # head_dim 72, 256 patches
    assert _vision_attn_mode(cfg, None, False) == "xla"
    assert _vision_attn_mode(cfg, None, True) == "xla"

    class FakeMesh:
        pass

    assert _vision_attn_mode(cfg, FakeMesh(), True) == "flash"


def test_grad_not_required():
    """The kernel is inference-only (training towers use flash/XLA); it
    should still be jittable under vmap-free jit."""
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 128, 2, 32)), jnp.float32)
        for _ in range(3)
    )
    out = jax.jit(vision_attention)(q, k, v)
    np.testing.assert_allclose(out, attention.mha(q, k, v), atol=2e-5)

"""SigLIP vision tower — functional JAX, TPU-first.

Capabilities mirror the reference tower (ref: modeling_siglip.py): patch
embedding + learned positions, N pre-LN encoder blocks (MHA -> MLP with
tanh-GELU), final LayerNorm. Design differences (intentional, TPU-native):

* Parameters are a pytree of stacked per-layer arrays (leading layer axis) and
  the block stack runs under ``jax.lax.scan`` — one trace/compile of a single
  block instead of N inlined copies.
* The patch "convolution" (stride == kernel, ref: modeling_siglip.py:258-263)
  is an exact reshape + matmul: patches are extracted with reshapes and hit
  the MXU as one (B*P, p*p*C) x (p*p*C, D) GEMM instead of going through a
  conv lowering.
* Attention uses fp32-softmax MHA from ops.attention (Pallas flash-attention
  path for large token counts lives in kernels/).

All weights use (in, out) matmul layout; the HF checkpoint loader transposes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.config import SiglipVisionConfig
from ..ops import attention
from ..ops.activations import gelu_tanh
from ..ops.norms import layer_norm

Params = Dict[str, Any]


def _dense_init(key, in_dim, out_dim, dtype):
    scale = in_dim**-0.5
    return {
        "kernel": jax.random.normal(key, (in_dim, out_dim), dtype) * scale,
        "bias": jnp.zeros((out_dim,), dtype),
    }


def init_params(key: jax.Array, cfg: SiglipVisionConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    i = cfg.intermediate_size
    p = cfg.patch_size
    n_layers = cfg.num_hidden_layers
    keys = iter(jax.random.split(key, 8 + n_layers))

    def stack(fn):
        ks = jax.random.split(next(keys), n_layers)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(k) for k in ks])

    return {
        "patch_embed": _dense_init(next(keys), p * p * cfg.num_channels, d, dtype),
        "pos_embed": jax.random.normal(next(keys), (cfg.num_patches, d), dtype) * 0.02,
        "layers": stack(
            lambda k: {
                "ln1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "attn": {
                    "q": _dense_init(jax.random.fold_in(k, 0), d, d, dtype),
                    "k": _dense_init(jax.random.fold_in(k, 1), d, d, dtype),
                    "v": _dense_init(jax.random.fold_in(k, 2), d, d, dtype),
                    "o": _dense_init(jax.random.fold_in(k, 3), d, d, dtype),
                },
                "ln2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "mlp": {
                    "fc1": _dense_init(jax.random.fold_in(k, 4), d, i, dtype),
                    "fc2": _dense_init(jax.random.fold_in(k, 5), i, d, dtype),
                },
            }
        ),
        "post_ln": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nH*nW, p*p*C), row-major patch order.

    Flattening order per patch is (ph, pw, c) — the loader permutes the HF
    conv kernel (D, C, p, p) to match.
    """
    b, h, w, c = pixel_values.shape
    p = patch_size
    nh, nw = h // p, w // p
    x = pixel_values.reshape(b, nh, p, nw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, p, p, C)
    return x.reshape(b, nh * nw, p * p * c)


def _encoder_block(
    cfg: SiglipVisionConfig, x: jnp.ndarray, lp: Params, attn: str = "xla",
    mesh=None,
) -> jnp.ndarray:
    b, s, d = x.shape
    h = cfg.num_attention_heads
    hd = cfg.head_dim
    eps = cfg.layer_norm_eps

    residual = x
    y = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
    q = (y @ lp["attn"]["q"]["kernel"] + lp["attn"]["q"]["bias"]).reshape(b, s, h, hd)
    k = (y @ lp["attn"]["k"]["kernel"] + lp["attn"]["k"]["bias"]).reshape(b, s, h, hd)
    v = (y @ lp["attn"]["v"]["kernel"] + lp["attn"]["v"]["bias"]).reshape(b, s, h, hd)
    if attn == "flash":
        from ..kernels.flash_attention import flash_attention, flash_attention_sharded

        full = jnp.full((b,), s, jnp.int32)  # all patches, fully bidirectional
        if mesh is not None:
            a = flash_attention_sharded(q, k, v, full, full, mesh)
        else:
            a = flash_attention(q, k, v, full, full)
    elif attn == "fused":
        # ablation path: measured ~parity with XLA at these shapes
        # (kernels/ablation/vision_attention.py docstring); not a default
        from ..kernels.ablation.vision_attention import vision_attention

        a = vision_attention(q, k, v)
    else:
        a = attention.mha(q, k, v)  # non-causal full attention over patches
    a = a.reshape(b, s, d) @ lp["attn"]["o"]["kernel"] + lp["attn"]["o"]["bias"]
    x = residual + a

    residual = x
    y = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
    y = gelu_tanh(y @ lp["mlp"]["fc1"]["kernel"] + lp["mlp"]["fc1"]["bias"])
    y = y @ lp["mlp"]["fc2"]["kernel"] + lp["mlp"]["fc2"]["bias"]
    return residual + y


def encode(
    params: Params,
    cfg: SiglipVisionConfig,
    pixel_values: jnp.ndarray,
    use_flash: bool = False,
    mesh=None,
    attn: str = None,
):
    """Vision forward: (B, C, H, W) pixels -> (B, num_patches, hidden).

    Accepts NCHW for API parity with the reference processor output
    (ref: processing_paligemma.py:72); transposed to NHWC internally.

    ``attn`` selects the attention path: "xla" (materialized — measured
    FASTEST at So400m's head_dim=72 on this chip, the default on and off
    TPU; see models/paligemma._vision_attn_mode), "flash" (generic
    prefix-LM kernel, the sharded path), "fused" (the
    kernels/ablation/vision_attention.py head-block kernel, explicit
    opt-in only). ``attn=None`` derives it from the legacy ``use_flash``
    flag.
    """
    if attn is None:
        attn = "flash" if use_flash else "xla"
    x = pixel_values.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    dtype = params["pos_embed"].dtype
    patches = patchify(x, cfg.patch_size).astype(dtype)
    emb = patches @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    emb = emb + params["pos_embed"][None]

    def body(h, lp):
        return _encoder_block(cfg, h, lp, attn=attn, mesh=mesh), None

    h, _ = jax.lax.scan(body, emb, params["layers"])
    return layer_norm(
        h, params["post_ln"]["scale"], params["post_ln"]["bias"], cfg.layer_norm_eps
    )

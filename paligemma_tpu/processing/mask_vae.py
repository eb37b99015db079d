"""VQ-VAE mask decoder for PaliGemma ``<seg###>`` tokens.

A segmentation output encodes each object mask as 16 codebook indices
(the 128 ``<seg###>`` tokens the reference registers at
processing_paligemma.py:129-145 but never decodes). The public decoder —
big_vision's ``vae-oid.npz`` checkpoint used by every PaliGemma demo —
turns those 16 indices into a 64x64 soft mask inside the detection box:

    indices (B, 16) -> codebook lookup -> (B, 4, 4, D)
    -> Conv1x1(D->128) + ReLU
    -> 2 x ResBlock(128)      [Conv3x3-ReLU-Conv3x3-ReLU-Conv1x1 + skip]
    -> 4 x [ConvTranspose(k=4, s=2) + ReLU]   features 128, 64, 32, 16
    -> Conv1x1(->1)           raw logits, demo maps to [0,1] via x*0.5+0.5

This file reimplements that architecture as a pure-JAX function over a
params pytree (our convention: nested dicts, HWIO conv kernels) and ships
a loader for the official npz's torch-layout keys (``decoder.0.weight``,
``_vq_vae._embedding``, ...). With the official npz on disk you get
bit-faithful demo-parity masks; without it (this environment cannot
download weights) ``init_params`` gives a random decoder with the exact
same geometry so the full detect->segment->paste pipeline stays testable.

Everything jits; the decode is one small fused conv stack (a few MFLOPs),
negligible next to a single LM decode step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_TOKENS = 16          # seg tokens per mask -> 4x4 latent grid
GRID = 4
NUM_EMBEDDINGS = 128     # codebook size == number of <seg###> tokens
MASK_RES = 64


def _conv(x, p, *, stride=1):
    """NHWC conv, HWIO kernel, SAME->explicit 'torch' padding.

    Kernels here are 1x1 or 3x3 with torch padding k//2, which equals SAME
    for stride 1 — use SAME directly.
    """
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"],
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _conv_transpose(x, p):
    """Stride-2 k=4 transposed conv with torch ``padding=1`` semantics
    (doubles H and W): dilate input by 2, pad the dilated input by 2, run a
    stride-1 conv with the *transposed* kernel (flax transpose_kernel=True,
    matching the torch->flax conversion in the public demo)."""
    y = jax.lax.conv_transpose(
        x,
        p["kernel"],
        strides=(2, 2),
        padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    return y + p["bias"]


def _resblock(x, p):
    h = jax.nn.relu(_conv(x, p["conv0"]))
    h = jax.nn.relu(_conv(h, p["conv1"]))
    h = _conv(h, p["conv2"])
    return x + h


def reconstruct_masks(params: Dict, indices: jnp.ndarray) -> jnp.ndarray:
    """(B, 16) int32 codebook indices -> (B, 64, 64) float32 mask logits.

    Postprocess like the public demo: ``np.clip(m * 0.5 + 0.5, 0, 1)`` then
    threshold at 0.5 (see :func:`to_unit_range`).
    """
    assert indices.shape[-1] == NUM_TOKENS, indices.shape
    emb = params["embeddings"]  # (NUM_EMBEDDINGS, D)
    x = jnp.take(emb, indices.reshape(-1), axis=0)
    x = x.reshape(indices.shape[0], GRID, GRID, emb.shape[1])
    x = jax.nn.relu(_conv(x, params["conv_in"]))
    x = _resblock(x, params["res0"])
    x = _resblock(x, params["res1"])
    for i in range(4):
        x = jax.nn.relu(_conv_transpose(x, params[f"up{i}"]))
    x = _conv(x, params["conv_out"])
    return x[..., 0]


def to_unit_range(mask_logits: np.ndarray) -> np.ndarray:
    """Demo-parity mapping of decoder output to [0, 1] soft masks."""
    return np.clip(np.asarray(mask_logits) * 0.5 + 0.5, 0.0, 1.0)


def init_params(key, embedding_dim: int = 512, dtype=jnp.float32) -> Dict:
    """Random decoder with the official geometry (for tests / demos without
    the npz)."""
    ks = iter(jax.random.split(key, 16))

    def conv_p(k, kh, kw, cin, cout):
        scale = 1.0 / np.sqrt(kh * kw * cin)
        return {
            "kernel": (
                jax.random.normal(k, (kh, kw, cin, cout)) * scale
            ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    def convt_p(k, cin, cout):
        # transpose_kernel=True expects (H, W, out, in) -> stored as HWIO of
        # the *forward* conv, i.e. (4, 4, cout, cin) read transposed; keep
        # the same (H, W, I, O) = (4, 4, cout, cin) layout the loader emits.
        scale = 1.0 / np.sqrt(16 * cin)
        return {
            "kernel": (
                jax.random.normal(k, (4, 4, cout, cin)) * scale
            ).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    def res_p(k, dim):
        k0, k1, k2 = jax.random.split(k, 3)
        return {
            "conv0": conv_p(k0, 3, 3, dim, dim),
            "conv1": conv_p(k1, 3, 3, dim, dim),
            "conv2": conv_p(k2, 1, 1, dim, dim),
        }

    dim = 128
    p = {
        "embeddings": jax.random.normal(
            next(ks), (NUM_EMBEDDINGS, embedding_dim)
        ).astype(dtype),
        "conv_in": conv_p(next(ks), 1, 1, embedding_dim, dim),
        "res0": res_p(next(ks), dim),
        "res1": res_p(next(ks), dim),
    }
    # feature schedule: features=dim then dim//=2 after each upsample
    # (big_vision order) -> transposes output 128, 64, 32, 16
    cin = 128
    for i, cout in enumerate((128, 64, 32, 16)):
        p[f"up{i}"] = convt_p(next(ks), cin, cout)
        cin = cout
    p["conv_out"] = conv_p(next(ks), 1, 1, 16, 1)
    return p


def load_vae_oid_npz(path: str) -> Dict:
    """Load the official ``vae-oid.npz`` (torch-layout keys) into our
    pytree. Torch conv weights are (O, I, H, W) -> HWIO; transposed-conv
    weights are (I, O, H, W) in torch, and the public flax demo transposes
    them the same way as regular convs then sets transpose_kernel=True —
    we mirror that exactly so masks are bit-identical to the demo."""
    ckpt = dict(np.load(path))

    def conv(name):
        w = ckpt[f"{name}.weight"]
        return {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(ckpt[f"{name}.bias"]),
        }

    def res(name):
        return {
            "conv0": conv(f"{name}.net.0"),
            "conv1": conv(f"{name}.net.2"),
            "conv2": conv(f"{name}.net.4"),
        }

    return {
        "embeddings": jnp.asarray(ckpt["_vq_vae._embedding"]),
        "conv_in": conv("decoder.0"),
        "res0": res("decoder.2"),
        "res1": res("decoder.3"),
        "up0": conv("decoder.4"),
        "up1": conv("decoder.6"),
        "up2": conv("decoder.8"),
        "up3": conv("decoder.10"),
        "conv_out": conv("decoder.12"),
    }

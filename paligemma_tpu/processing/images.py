"""Image preprocessing.

Two paths with identical math (resize -> rescale 1/255 -> normalize with
mean=std=0.5 -> CHW; ref: processing_paligemma.py:13-73):

* ``process_images_host``: PIL bicubic resize on host — bit-compatible with
  the reference pipeline, used when exact parity with the PyTorch stack
  matters.
* ``preprocess_device``: fully jitted ``jax.image.resize`` bicubic path that
  runs on-device — raw uint8 HWC frames go to the TPU and the rescale/
  normalize/transpose fuse into the surrounding computation (the reference
  does all of this per-image in numpy on host).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_STANDARD_MEAN = (0.5, 0.5, 0.5)
IMAGENET_STANDARD_STD = (0.5, 0.5, 0.5)


# ---------------------------------------------------------------------------
# Host path (PIL) — exact reference parity
# ---------------------------------------------------------------------------
def process_images_host(
    images: Sequence,  # PIL images
    image_size: int,
    scale_factor: float = 1.0 / 255.0,
    mean=IMAGENET_STANDARD_MEAN,
    std=IMAGENET_STANDARD_STD,
) -> np.ndarray:
    """PIL bicubic resize + rescale + normalize + HWC->CHW; returns (B,C,H,W)."""
    from PIL import Image

    out = []
    for image in images:
        img = image.resize((image_size, image_size), resample=Image.Resampling.BICUBIC)
        arr = np.asarray(img.convert("RGB")).astype(np.float32) * scale_factor
        arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        out.append(arr.transpose(2, 0, 1))
    return np.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Device path (jitted)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("image_size",))
def preprocess_device(
    raw_images: jnp.ndarray,  # (B, H, W, 3) uint8 or float
    image_size: int,
) -> jnp.ndarray:
    """On-device bicubic resize + rescale + normalize. Returns (B, C, H, W)."""
    x = raw_images.astype(jnp.float32)
    b = x.shape[0]
    x = jax.image.resize(x, (b, image_size, image_size, 3), method="bicubic")
    x = x * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_STANDARD_MEAN)
    std = jnp.asarray(IMAGENET_STANDARD_STD)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)

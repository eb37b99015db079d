"""Native C++ preprocessor vs the PIL reference path."""

import numpy as np
import pytest

from paligemma_tpu.processing.images import process_images_host
from paligemma_tpu.processing.native import native_available, preprocess_images_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ not available to build native lib"
)

PIL = pytest.importorskip("PIL")
from PIL import Image


def _raw(seed, n=2, h=64, w=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_native_matches_pil_math():
    raw = _raw(0)
    got = preprocess_images_native(raw, image_size=32)
    want = process_images_host([Image.fromarray(r) for r in raw], image_size=32)
    assert got.shape == want.shape == (2, 3, 32, 32)
    # same filter family (antialiased bicubic); implementations differ in
    # rounding details — demand close agreement
    assert np.abs(got - want).mean() < 0.02
    assert np.abs(got - want).max() < 0.35


def test_native_identity_size_is_exact():
    """No resize => exactly the reference rescale/normalize math."""
    raw = _raw(1, n=1, h=32, w=32)
    got = preprocess_images_native(raw, image_size=32)
    want = (raw[0].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(got[0], want.transpose(2, 0, 1), atol=1e-5)


def test_native_multithreaded_deterministic():
    raw = _raw(2, n=8)
    a = preprocess_images_native(raw, image_size=28, num_threads=1)
    b = preprocess_images_native(raw, image_size=28, num_threads=8)
    np.testing.assert_array_equal(a, b)


def test_native_upscale():
    raw = _raw(3, n=1, h=16, w=16)
    out = preprocess_images_native(raw, image_size=28)
    assert out.shape == (1, 3, 28, 28)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6

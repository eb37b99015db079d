"""Int4 weight-only kernel tests (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from paligemma_tpu.kernels.ablation.quant4 import dequantize_int4, int4_matmul, quantize_int4


def test_pack_unpack_roundtrip_exact():
    """Quantized values survive the nibble pack/unpack exactly."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    q = quantize_int4(jnp.asarray(w))
    assert q["w4p"].shape == (4, 16) and q["w4p"].dtype == jnp.int8
    deq = np.asarray(dequantize_int4(q))
    # error bounded by half a quantization step per channel
    err = np.abs(deq - w)
    step = np.asarray(q["s"])
    assert (err <= step[None, :] * 0.5 + 1e-6).all()


def test_negative_nibbles_sign_extend():
    w = jnp.asarray([[-7.0, 7.0], [-1.0, 1.0], [3.0, -3.0], [-5.0, 5.0]])
    q = quantize_int4(w)
    deq = np.asarray(dequantize_int4(q))
    np.testing.assert_allclose(deq, np.asarray(w), atol=np.asarray(q["s"]).max() * 0.51)


def test_int4_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    for m, k, n in [(1, 64, 96), (4, 256, 200), (16, 512, 384)]:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.2)
        q = quantize_int4(w)
        got = int4_matmul(x, q["w4p"], q["s"])
        want = x @ dequantize_int4(q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_int4_error_vs_int8():
    """int4 is coarser than int8 but bounded: relative matmul error < 10%."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32) * 0.1)
    q = quantize_int4(w)
    got = np.asarray(int4_matmul(x, q["w4p"], q["s"]))
    want = np.asarray(x @ w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.2, rel  # per-channel int4 on gaussians ~13%; group scales (ROADMAP) tighten this

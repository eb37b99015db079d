"""Fused int8 GeGLU decode-MLP kernel (kernels/decode_mlp.py) vs the XLA
reference path, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.kernels.decode_mlp import (
    mlp_decode_fused,
    pick_block,
    reference_mlp,
    repack,
    supported,
)
from paligemma_tpu.kernels.quant import quantize_int8


def _make(L=3, K=256, I=512, seed=0):
    kg, kd, ky = jax.random.split(jax.random.PRNGKey(seed), 3)
    gateup = jax.random.normal(kg, (L, K, 2 * I), jnp.float32) * 0.05
    down = jax.random.normal(kd, (L, I, K), jnp.float32) * 0.05
    mlp = {"gateup": quantize_int8(gateup), "down": quantize_int8(down)}
    y = (jax.random.normal(ky, (1, 1, K), jnp.float32) * 0.3).astype(
        jnp.bfloat16
    )
    return mlp, y


@pytest.mark.parametrize("layer", [0, 1, 2])
def test_matches_xla_reference_every_layer(layer):
    mlp, y = _make()
    out = mlp_decode_fused(y, repack(mlp), layer, interpret=True)
    ref = reference_mlp(y, mlp, layer)
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    assert rel < 0.03, rel
    assert out.shape == y.shape and out.dtype == y.dtype


def test_multi_chunk_accumulation():
    # I=1024 with bs=512 -> 2 chunks: exercises the double-buffer ring
    mlp, y = _make(K=256, I=1024)
    out = mlp_decode_fused(y, repack(mlp), 1, interpret=True)
    ref = reference_mlp(y, mlp, 1)
    rel = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    rel /= np.max(np.abs(np.asarray(ref, np.float32))) + 1e-9
    assert rel < 0.03, rel


def test_under_scan_with_traced_layer_index():
    """The production shape: kernel inside lax.scan with the loop's layer
    index — the full stacked weights must be loop-invariant operands."""
    L = 4
    mlp, y = _make(L=L)
    packed = repack(mlp)

    @jax.jit
    def run(packed, y):
        def body(h, l):
            return h + mlp_decode_fused(h, packed, l, interpret=True), None

        h, _ = jax.lax.scan(body, y, jnp.arange(L, dtype=jnp.int32))
        return h

    out = run(packed, y)

    h = y
    for l in range(L):
        h = h + reference_mlp(h, mlp, l)
    rel = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(h, np.float32)))
    rel /= np.max(np.abs(np.asarray(h, np.float32))) + 1e-9
    assert rel < 0.05, rel


def test_pick_block_and_supported():
    assert pick_block(16384) == 1024
    assert pick_block(1024) == 1024
    assert pick_block(96) is None  # tiny test models -> XLA fallback
    mlp, _ = _make()
    assert supported(mlp)
    assert not supported({"gate": None, "up": None, "down": None})
    # dense (unquantized) tree -> unsupported
    assert not supported(
        {"gateup": jnp.zeros((2, 4, 8)), "down": jnp.zeros((2, 4, 4))}
    )

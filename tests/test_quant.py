"""Int8 weight-only quantization tests (kernel in interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from paligemma_tpu.core.config import tiny_test_config
from paligemma_tpu.kernels.quant import dequantize, matmul_any, quantize_int8
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving

CFG = tiny_test_config()


def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 0.3
    q = quantize_int8(w)
    assert q["w8"].dtype == jnp.int8 and q["s"].shape == (96,)
    err = np.abs(np.asarray(dequantize(q)) - np.asarray(w))
    # per-channel symmetric: max error <= scale/2 per channel
    assert err.max() <= float(np.asarray(q["s"]).max()) * 0.51


def test_quantize_chunked_2d_matches_unchunked():
    """Column-blocked 2-D quantization (the big-LM-head path that OOMed the
    round-2 driver bench) is bit-identical to the one-shot path: scales are
    per output channel, so column blocking changes nothing."""
    w = jax.random.normal(jax.random.PRNGKey(3), (32, 1000)) * 0.4
    ref = quantize_int8(w)
    chunked = quantize_int8(w, chunk_elems=32 * 128)  # forces ~128-col blocks
    np.testing.assert_array_equal(np.asarray(ref["w8"]), np.asarray(chunked["w8"]))
    np.testing.assert_array_equal(np.asarray(ref["s"]), np.asarray(chunked["s"]))


def test_int8_matmul_matches_dequant_matmul():
    # ablation-shelf Pallas variants (production dispatch is XLA)
    from paligemma_tpu.kernels.ablation.quant_pallas import (
        int8_matmul,
        int8_matmul_nmajor,
        quantize_int8_nmajor,
    )

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 200)) * 0.2  # unaligned N
    q = quantize_int8(w)
    want = x @ dequantize(q)
    got = int8_matmul(x, q["w8"], q["s"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    qn = quantize_int8_nmajor(w)
    got_n = int8_matmul_nmajor(x, qn["w8t"], qn["s"])
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_matmul_any_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    w = jax.random.normal(jax.random.PRNGKey(4), (32, 64))
    np.testing.assert_allclose(
        np.asarray(matmul_any(x, w)), np.asarray(x @ w), rtol=1e-6
    )
    q = quantize_int8(w)
    np.testing.assert_allclose(
        np.asarray(matmul_any(x, q)), np.asarray(x @ dequantize(q)),
        rtol=1e-4, atol=1e-4,
    )


def test_quantized_model_close_and_greedy_consistent():
    """int8 LM produces near-identical logits and the same greedy tokens."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)

    rng = np.random.default_rng(0)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), CFG.image_token_index), rng.integers(3, 100, (1, 6))],
        axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    eng = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    qeng = PaliGemmaEngine(qparams, CFG, max_seq_len=32, use_flash=False)
    lo, _ = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
    qlo, _ = qeng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
    # logits close in a relative sense
    denom = np.abs(np.asarray(lo)).max()
    assert np.abs(np.asarray(lo) - np.asarray(qlo)).max() / denom < 0.1

    # Token-level contract: int8 greedy tokens must equal bf16 greedy tokens
    # at every step where the bf16 top-2 logit margin exceeds the observed
    # int8 logit error (teacher-forced on the bf16 token so steps stay
    # aligned). A tiny random-weight model has near-tie logits, so a raw
    # array_equal would test tie-breaking luck, not quantization quality;
    # the margin-aware assert is the precise statement of the contract.
    # Strict full-sequence equality is covered at real-geometry scale in
    # test_hf_parity.py::test_midsize_int8_token_agreement.
    lo_b, st_b = lo, None
    lo_b, st_b = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids),
                             jnp.asarray(mask))
    lo_q, st_q = qeng.prefill(jnp.asarray(pixels), jnp.asarray(ids),
                              jnp.asarray(mask))
    checked = 0
    for _ in range(5):
        lb, lq = np.asarray(lo_b)[0], np.asarray(lo_q)[0]
        t_b, t_q = int(lb.argmax()), int(lq.argmax())
        err = np.abs(lb - lq).max()
        top2 = np.partition(lb, -2)[-2:]
        margin = float(top2[1] - top2[0])
        if margin > 2 * err:
            assert t_q == t_b, (t_b, t_q, margin, err)
            checked += 1
        tok = jnp.asarray([t_b], jnp.int32)  # teacher-force the bf16 token
        lo_b, st_b = eng.decode_step(tok, st_b)
        lo_q, st_q = qeng.decode_step(tok, st_q)
    assert checked >= 1  # the margin gate must not vacuously pass everything


def test_quantized_cache_dtype_override():
    """Engine must be constructible with a quantized tree (no embed dtype issue)."""
    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)
    eng = PaliGemmaEngine(qparams, CFG, max_seq_len=16, use_flash=False)
    assert eng.cache_dtype == qparams["lm"]["embed"].dtype


def test_quantize_4bit_roundtrip_and_matmul():
    """Blockwise NF4/int4: packed layout round-trips within the per-block
    absmax * half-max-grid-gap bound, and matmul_any dispatches it."""
    from paligemma_tpu.kernels.quant import dequantize_4bit, quantize_4bit

    w = jax.random.normal(jax.random.PRNGKey(7), (256, 96)) * 0.25
    for kind in ("nf4", "int4"):
        q = quantize_4bit(w, kind=kind, group=64)
        assert q["w4"].dtype == jnp.uint8 and q["w4"].shape == (128, 96)
        assert q["s4"].shape == (4, 96)
        wd = np.asarray(dequantize_4bit(q))
        err = np.abs(wd - np.asarray(w))
        bound = np.repeat(np.asarray(q["s4"]), 64, axis=0)
        grid = np.sort(np.asarray(q["grid"]))
        gap = float(np.diff(grid).max())
        assert np.all(err <= bound * gap / 2 + 1e-7), (kind, err.max())
        x = jax.random.normal(jax.random.PRNGKey(8), (3, 256))
        np.testing.assert_allclose(
            np.asarray(matmul_any(x, q)), x @ wd, rtol=1e-4, atol=1e-4
        )


def test_quantize_4bit_stacked_chunked_matches():
    from paligemma_tpu.kernels.quant import quantize_4bit

    w = jax.random.normal(jax.random.PRNGKey(9), (3, 128, 64))
    a = quantize_4bit(w, group=64)
    b = quantize_4bit(w, group=64, chunk_elems=1000)  # per-layer path
    np.testing.assert_array_equal(np.asarray(a["w4"]), np.asarray(b["w4"]))
    np.testing.assert_array_equal(np.asarray(a["s4"]), np.asarray(b["s4"]))


def test_quantize_lm_for_training_bytes_and_forward():
    """The 4-bit training base (reference QLoRA parity: NF4, ref:
    Paligemma_FT.ipynb cell 41) costs ~0.56x the int8 base's layer bytes
    (4 + 32/group bits/weight) and still runs the full forward."""
    from paligemma_tpu.runtime.quantize import (
        quantize_lm_for_training,
        quantized_bytes,
    )

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    q4 = quantize_lm_for_training(params, kind="nf4", group=32)
    q8 = quantize_lm_for_serving(params)
    b4 = quantized_bytes(q4["lm"]["layers"])
    b8 = quantized_bytes(q8["lm"]["layers"])
    assert b4 < 0.75 * b8, (b4, b8)  # tiny config: norms/scales overhead

    rng = np.random.default_rng(0)
    n_img = CFG.vision_config.num_patches
    ids = np.concatenate(
        [np.full((1, n_img), CFG.image_token_index), rng.integers(3, 100, (1, 6))],
        axis=1,
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    eng = PaliGemmaEngine(params, CFG, max_seq_len=32, use_flash=False)
    qeng = PaliGemmaEngine(q4, CFG, max_seq_len=32, use_flash=False)
    lo, _ = eng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
    qlo, _ = qeng.prefill(jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))
    denom = np.abs(np.asarray(lo)).max()
    # random-init tiny config: 4-bit blocks over few channels are noisy;
    # the bound checks ballpark fidelity, exactness lives in the
    # roundtrip test above
    assert np.abs(np.asarray(lo) - np.asarray(qlo)).max() / denom < 0.35


def test_qlora_train_over_int4_base():
    """LoRA fine-tune over the blockwise-NF4 base — exact parity with the
    reference's QLoRA recipe (ref: Paligemma_FT.ipynb cell 41: 4-bit NF4
    base + LoRA r=8). Loss decreases, adapter grads flow, base frozen."""
    from paligemma_tpu.runtime.quantize import quantize_lm_for_training
    from paligemma_tpu.train.trainer import TrainConfig, Trainer
    from test_train import _batch

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_training(params, kind="nf4")
    w4_before = np.asarray(
        qparams["lm"]["layers"]["attn"]["qkv"]["w4"]
    ).copy()
    tr = Trainer(qparams, CFG, TrainConfig(lora_rank=4, learning_rate=5e-3,
                                           use_flash=False))
    b_before = np.asarray(tr.lora["layers"]["q"]["b"]).copy()
    first = tr.train_step(_batch())
    assert np.isfinite(first)
    last = first
    for _ in range(10):
        last = tr.train_step(_batch())
    assert not np.allclose(np.asarray(tr.lora["layers"]["q"]["b"]), b_before)
    assert last < first
    np.testing.assert_array_equal(  # the quantized base never moves
        np.asarray(tr.params["lm"]["layers"]["attn"]["qkv"]["w4"]), w4_before
    )


def test_merge_lora_over_4bit_base():
    """merge_lora dequantizes a w4 base exactly like the int8 path."""
    from paligemma_tpu.kernels.quant import dequantize_4bit
    from paligemma_tpu.runtime.quantize import quantize_lm_for_training
    from paligemma_tpu.train.lora import init_lora, merge_lora

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    q4 = quantize_lm_for_training(params, kind="nf4", fuse=False)
    lora = init_lora(jax.random.PRNGKey(1), CFG.text_config, 4, 8.0)
    merged = merge_lora(q4["lm"], lora)
    base_q = np.asarray(dequantize_4bit(
        q4["lm"]["layers"]["attn"]["q"], jnp.bfloat16
    ).astype(jnp.float32))
    p = lora["layers"]["q"]
    scale = np.asarray((p["alpha"] / p["a"].shape[-1]))[:, None, None]
    delta = np.einsum(
        "lir,lro->lio", np.asarray(p["a"]), np.asarray(p["b"])
    ) * scale
    got = np.asarray(merged["layers"]["attn"]["q"].astype(jnp.float32))
    np.testing.assert_allclose(got, base_q + delta, rtol=2e-2, atol=2e-2)


def test_qlora_train_over_int8_base():
    """LoRA fine-tune over an int8-quantized base (reference QLoRA analog)."""
    from paligemma_tpu.train.trainer import TrainConfig, Trainer
    from test_train import _batch

    params = paligemma.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_lm_for_serving(params)
    tr = Trainer(qparams, CFG, TrainConfig(lora_rank=4, learning_rate=5e-3,
                                           use_flash=False))
    b_before = np.asarray(tr.lora["layers"]["q"]["b"]).copy()
    first = tr.train_step(_batch())
    assert np.isfinite(first)
    last = first
    for _ in range(10):
        last = tr.train_step(_batch())
    assert not np.allclose(np.asarray(tr.lora["layers"]["q"]["b"]), b_before)
    assert last < first


def test_w8a8_matmul_close_and_gated():
    """int8_act=True takes the W8A8 path only at prefill-sized shapes
    (>= 256 rows); small calls return the exact convert-path result.
    W8A8 output stays close to the float reference (activation rounding
    is the only new error source; int32 accumulation is exact)."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.05, jnp.float32)
    q = quantize_int8(w)

    # decode-sized: identical to the convert path bit-for-bit
    x_small = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(matmul_any(x_small, q, int8_act=True)),
        np.asarray(matmul_any(x_small, q)),
    )

    # prefill-sized: W8A8 engages; close to the float product
    x_big = jnp.asarray(rng.normal(size=(512, 64)), jnp.float32)
    got = np.asarray(matmul_any(x_big, q, int8_act=True), np.float32)
    ref = np.asarray(x_big, np.float32) @ np.asarray(
        dequantize(q, jnp.float32), np.float32
    )
    denom = np.maximum(np.abs(ref), 1e-3)
    assert np.median(np.abs(got - ref) / denom) < 0.02
    # and it is NOT the convert path's output (the path actually switched)
    conv = np.asarray(matmul_any(x_big, q), np.float32)
    assert np.abs(got - conv).max() > 0


def test_w8a8_prefill_forward_close_and_greedy_consistent():
    """gemma.forward(int8_act=True) at a prefill-sized S stays close to
    the weights-only int8 forward and picks the same greedy token."""
    tc = CFG.text_config
    params = gemma.init_params(jax.random.PRNGKey(0), tc, jnp.float32)
    q = quantize_lm_for_serving({"lm": params})["lm"]
    b, s, max_seq = 1, 384, 512
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(b, s, tc.hidden_size)) * 0.05,
                         jnp.float32)
    pos = jnp.arange(1, s + 1, dtype=jnp.int32)[None]
    valid = jnp.zeros((b, max_seq), bool).at[:, :s].set(True)

    def run(int8_act):
        cache = gemma.init_kv_cache(tc, b, max_seq, jnp.float32)
        logits, _ = gemma.forward(
            q, tc, embeds, pos, cache,
            cache_pos=jnp.zeros((), jnp.int32), kv_valid=valid,
            logits_idx=jnp.full((b,), s - 1, jnp.int32),
            int8_act=int8_act,
        )
        return np.asarray(logits[:, -1], np.float32)

    base = run(False)
    w8a8 = run(True)
    assert np.argmax(base) == np.argmax(w8a8)
    denom = np.maximum(np.abs(base), 1e-2)
    assert np.median(np.abs(w8a8 - base) / denom) < 0.05, (
        np.median(np.abs(w8a8 - base) / denom)
    )

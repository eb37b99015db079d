"""On-device Pallas kernel smoke tier (<60 s on the real chip).

CI runs every kernel in interpret mode on CPU (tests/conftest.py), where
Mosaic toolchain potholes (CLAUDE.md) cannot bite. This module compiles and
runs each production kernel family at tiny shapes on the REAL backend, so a
kernel regression fails fast with a *named* kernel instead of crashing
mid-benchmark. ``bench.py`` calls :func:`run` first; it is also runnable as
``python -m paligemma_tpu.tpu_smoke``.

Checks cover the production kernel surface only (ablation kernels are
excluded on purpose): flash attention fwd+bwd, the fused decode stack
(grid-over-layers layer kernel + fused MLP + greedy head, end to end
through gemma.forward), the tensor-parallel per-layer kernels at a TP8
per-shard geometry, and paged decode attention.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _check_decode_layer_tp():
    """TP per-layer kernels on a 1-device mesh at the TP8 per-shard
    geometry of the 3B model: ONE local q head — the shape the kernel only
    ever sees as a tensor-parallel shard, exercising its (1, W)-shaped
    attention ops on real Mosaic."""
    from .core.config import GemmaConfig
    from .core.mesh import make_mesh
    from .kernels import decode_layer_tp
    from .models import gemma
    from .runtime.quantize import quantize_lm_for_serving

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=2048,
        num_hidden_layers=2, num_attention_heads=1, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=1024,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(7), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    mesh = make_mesh(1, 1)

    B, S, n_prefill = 1, 512, 4
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(5, 250, (B, n_prefill)), jnp.int32)
    cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
    valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
    embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
    pos = jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None]
    logits, cache = gemma.forward(
        lm, cfg, embeds, pos, cache,
        cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    packed, specs = decode_layer_tp.repack_for_tp(lm, cfg, mesh)

    # XLA reference steps vs TP-kernel steps, same state threading
    def xla_steps(tok0, cache0, valid0):
        tok, cache, valid = tok0, dict(cache0), valid0
        out, write, p = [], n_prefill, n_prefill + 1
        for _ in range(2):
            valid = valid.at[:, write].set(True)
            emb = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(
                jnp.bfloat16
            )
            lg, cache = gemma.forward(
                lm, cfg, emb, jnp.full((B, 1), p, jnp.int32), cache,
                cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
                kv_bucket=512,
            )
            tok = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
            out.append(int(np.asarray(tok)[0]))
            write += 1
            p += 1
        return out

    def tp_steps(tok0, cache0, valid0):
        tok, cache, valid = tok0, dict(cache0), valid0
        out, write, p = [], n_prefill, n_prefill + 1
        for _ in range(2):
            valid = valid.at[:, write].set(True)
            tok, cache = decode_layer_tp.decode_step_greedy_tp(
                packed, specs, cfg, tok, cache,
                cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
                position_ids=jnp.full((B,), p, jnp.int32),
                kv_bucket=512, mesh=mesh,
            )
            out.append(int(np.asarray(tok)[0]))
            write += 1
            p += 1
        return out

    want = xla_steps(tok, cache, valid)
    got = tp_steps(tok, cache, valid)
    assert want == got, (want, got)


def _check_flash_attention():
    from .kernels import flash_attention as fa

    key = jax.random.PRNGKey(0)
    b, s, h, d = 2, 256, 2, 128
    q = jax.random.normal(key, (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.float32)
    prefix = jnp.asarray([64, 32], jnp.int32)
    kv_len = jnp.asarray([s, s - 16], jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, prefix, kv_len) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa.reference_attention(q, k, v, prefix, kv_len) ** 2)

    out = np.asarray(fa.flash_attention(q, k, v, prefix, kv_len))
    ref = np.asarray(fa.reference_attention(q, k, v, prefix, kv_len))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-2, atol=5e-2
        )


def _fused_stack_setup():
    from .core.config import GemmaConfig
    from .models import gemma
    from .runtime.quantize import quantize_lm_for_serving

    # Real Gemma-2B geometry ratios at reduced hidden size (8 q heads x 256
    # / 1 kv head). NOTE deliberately NOT the smallest legal shape: the
    # 4-head/128-dim toy geometry aborts this Mosaic build while the
    # production shape compiles fine, so smoke must track production.
    cfg = GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=2048,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=1024,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    return cfg, lm


def _fused_stack_decode(cfg, lm, fused: bool, n_decode: int = 2):
    from .kernels import decode_layer
    from .models import gemma

    B, S, n_prefill = 1, 512, 5
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 250, (B, n_prefill)), jnp.int32)
    cache = gemma.init_kv_cache(cfg, B, S, jnp.bfloat16)
    valid = jnp.zeros((B, S), bool).at[:, :n_prefill].set(True)
    embeds = jnp.take(lm["embed"], ids, axis=0).astype(jnp.bfloat16)
    pos = jnp.arange(1, n_prefill + 1, dtype=jnp.int32)[None]
    logits, cache = gemma.forward(
        lm, cfg, embeds, pos, cache,
        cache_pos=jnp.asarray(0, jnp.int32), kv_valid=valid,
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    layers = lm
    if fused:
        layers = dict(lm)
        layers["layers"] = decode_layer.repack_layers(lm["layers"])

    toks = [int(np.asarray(tok)[0])]
    write, p = n_prefill, n_prefill + 1
    for _ in range(n_decode):
        valid = valid.at[:, write].set(True)
        emb = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(jnp.bfloat16)
        logits, cache = gemma.forward(
            layers, cfg, emb, jnp.full((B, 1), p, jnp.int32), cache,
            cache_pos=jnp.asarray(write, jnp.int32), kv_valid=valid,
            kv_bucket=512, fused_layer=fused,
        )
        tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        toks.append(int(np.asarray(tok)[0]))
        write += 1
        p += 1
    return toks


def _check_fused_decode_layer():
    cfg, lm = _fused_stack_setup()
    ref = _fused_stack_decode(cfg, lm, fused=False)
    fus = _fused_stack_decode(cfg, lm, fused=True)
    assert ref == fus, (ref, fus)


def _check_decode_mlp():
    from .kernels import decode_mlp

    cfg, lm = _fused_stack_setup()
    mlp = decode_mlp.repack(lm["layers"]["mlp"])
    y = jax.random.normal(
        jax.random.PRNGKey(3), (1, 1, cfg.hidden_size), jnp.bfloat16
    )
    li = jnp.asarray(1, jnp.int32)
    out = np.asarray(decode_mlp.mlp_decode_fused(y, mlp, li), np.float32)
    ref = np.asarray(decode_mlp.reference_mlp(y, lm["layers"]["mlp"], li),
                     np.float32)
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.1)


def _check_decode_head():
    from .kernels import decode_head
    from .kernels.quant import quantize_int8

    k, v = 128, 16384  # nch=2 so the chunk ring actually cycles
    w = jax.random.normal(jax.random.PRNGKey(4), (k, v), jnp.float32)
    head_q = quantize_int8(w)
    blk = decode_head.repack_head(head_q)
    y = jax.random.normal(jax.random.PRNGKey(5), (2, k), jnp.bfloat16)
    tok = np.asarray(decode_head.head_argmax_fused(y, blk))
    ref = np.asarray(decode_head.reference_head_argmax(y, head_q))
    np.testing.assert_array_equal(tok, ref)


def _check_paged_attention():
    from .kernels import paged_attention as pa

    b, hq, d, page, npages, pmax = 2, 4, 128, 16, 8, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, hq, d), jnp.float32)
    kp = jax.random.normal(jax.random.PRNGKey(1), (npages, page, 1, d),
                           jnp.float32)
    vp = jax.random.normal(jax.random.PRNGKey(2), (npages, page, 1, d),
                           jnp.float32)
    table = jnp.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], jnp.int32)
    kv_len = jnp.asarray([35, 17], jnp.int32)
    out = np.asarray(pa.paged_decode_attention(q, kp, vp, table, kv_len))
    ref = np.asarray(
        pa.reference_paged_decode_attention(q, kp, vp, table, kv_len)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def _check_paged_attention_runs():
    from .kernels import paged_attention as pa

    b, hq, d, page, npages = 2, 8, 256, 16, 12
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, hq, d), jnp.bfloat16)
    kp = jax.random.normal(jax.random.PRNGKey(1), (npages, page, 1, d),
                           jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(2), (npages, page, 1, d),
                           jnp.bfloat16)
    # row 0 a physical run (fast path), row 1 scattered (per-page fallback)
    table = jnp.asarray([[1, 2, 3, 4], [9, 5, 11, 7]], jnp.int32)
    kv_len = jnp.asarray([35, 61], jnp.int32)
    out = np.asarray(pa.paged_decode_attention_runs(
        q, kp, vp, table, kv_len, pages_per_step=2, rows_per_matmul=2,
    ), np.float32)
    ref = np.asarray(
        pa.reference_paged_decode_attention(q, kp, vp, table, kv_len),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def _check_fused_paged_layer():
    """Grid-over-layers fused kernel with in-kernel page-table reads vs the
    XLA page walk, production Gemma ratios, mixed contiguity."""
    from .kernels import decode_layer
    from .models import gemma

    cfg, lm = _fused_stack_setup()
    L, ps, hd = cfg.num_hidden_layers, 16, cfg.head_dim
    n_pages = 10
    rng = np.random.default_rng(3)
    pool = {
        n: jnp.asarray(rng.normal(size=(L, n_pages, ps, 1, hd)) * 0.3,
                       jnp.bfloat16)
        for n in ("k", "v")
    }
    table = jnp.asarray([[1, 2, 0, 0], [7, 4, 0, 0]], jnp.int32)
    wp = jnp.asarray([5, 17], jnp.int32)
    lm_rp = dict(lm)
    lm_rp["layers"] = decode_layer.repack_layers(lm["layers"])
    tok = jnp.asarray([7, 9], jnp.int32)
    embeds = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(jnp.bfloat16)
    pos = (wp + 1)[:, None]
    ref, _ = gemma.forward_paged_decode(
        lm, cfg, embeds, pos, jax.tree.map(jnp.copy, pool), table, wp,
        use_kernel=False, pages_bucket=2,
    )
    got, _ = gemma.forward_paged_decode_fused(
        lm_rp, cfg, embeds, pos, pool, table, wp, pages_bucket=2,
    )
    a = np.argmax(np.asarray(ref[:, 0], np.float32), -1)
    b = np.argmax(np.asarray(got[:, 0], np.float32), -1)
    np.testing.assert_array_equal(a, b)


def _check_paged_layer_tp():
    """Per-layer TP paged kernel (decode_layer_paged_tp) on a 1-device mesh
    at the TP8 per-shard geometry (1 local q head), mixed page contiguity:
    one tick vs the XLA page walk."""
    from .core.config import GemmaConfig
    from .core.mesh import make_mesh
    from .kernels import decode_layer_paged_tp, decode_layer_tp
    from .models import gemma
    from .runtime.quantize import quantize_lm_for_serving

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=2048,
        num_hidden_layers=2, num_attention_heads=1, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=1024,
    )
    full = {"lm": gemma.init_params(jax.random.PRNGKey(9), cfg, jnp.bfloat16)}
    lm = quantize_lm_for_serving(full)["lm"]
    mesh = make_mesh(1, 1)
    packed, specs = decode_layer_tp.repack_for_tp(lm, cfg, mesh)

    L, ps, hd = cfg.num_hidden_layers, 64, cfg.head_dim
    n_pages = 8
    rng = np.random.default_rng(9)
    pool = {
        n: jnp.asarray(rng.normal(size=(L, n_pages, ps, 1, hd)) * 0.3,
                       jnp.bfloat16)
        for n in ("k", "v")
    }
    table = jnp.asarray([[0, 1], [3, 2]], jnp.int32)  # run / fragmented
    wp = jnp.asarray([70, 90], jnp.int32)
    tok = jnp.asarray([7, 9], jnp.int32)
    pos = (wp + 1)

    embeds = jnp.take(lm["embed"], tok, axis=0)[:, None].astype(jnp.bfloat16)
    ref, _ = gemma.forward_paged_decode(
        lm, cfg, embeds, pos[:, None], jax.tree.map(jnp.copy, pool),
        table, wp, use_kernel=False, pages_bucket=2,
    )
    hidden, _ = decode_layer_paged_tp.decode_step_paged_tp(
        packed, specs, cfg, tok, pool, table, wp,
        position_ids=pos, pages_bucket=2, mesh=mesh,
    )
    got = gemma.lm_head(lm, hidden[:, None, :]).astype(jnp.float32)
    a = np.argmax(np.asarray(ref[:, 0], np.float32), -1)
    b = np.argmax(np.asarray(got[:, 0], np.float32), -1)
    np.testing.assert_array_equal(a, b)


CHECKS: List[Tuple[str, Callable[[], None]]] = [
    ("flash_attention", _check_flash_attention),
    ("decode_mlp", _check_decode_mlp),
    ("decode_head", _check_decode_head),
    ("decode_layer_stack", _check_fused_decode_layer),
    ("decode_layer_tp", _check_decode_layer_tp),
    ("paged_attention", _check_paged_attention),
    ("paged_attention_runs", _check_paged_attention_runs),
    ("decode_layer_paged", _check_fused_paged_layer),
    ("decode_layer_paged_tp", _check_paged_layer_tp),
]


def run(verbose: bool = True) -> Dict[str, float]:
    """Run every check on the current default backend.

    Returns {check_name: seconds}. Raises RuntimeError naming every failed
    kernel (with the first line of each underlying error)."""
    timings: Dict[str, float] = {}
    failures: List[str] = []
    for name, fn in CHECKS:
        t0 = time.perf_counter()
        try:
            fn()
            timings[name] = round(time.perf_counter() - t0, 2)
            if verbose:
                print(f"[tpu_smoke] {name}: ok ({timings[name]:.1f}s)",
                      flush=True)
        except Exception as e:  # noqa: BLE001 — named re-raise below
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
            failures.append(f"{name}: {type(e).__name__}: {msg}")
            if verbose:
                print(f"[tpu_smoke] {name}: FAIL — {msg}", flush=True)
    if failures:
        raise RuntimeError(
            "tpu_smoke kernel failures: " + "; ".join(failures)
        )
    return timings


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    t = run()
    print(f"all kernels ok in {sum(t.values()):.1f}s", flush=True)

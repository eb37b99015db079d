"""Profile the 448px prefill (1024 image tokens + 10 text) — the
BASELINE-relevant prefill shape. Emits a jax.profiler trace plus a coarse
wall-time split (vision tower vs LM stack) via separate jits."""

import sys

sys.path.insert(0, "/root/repo")

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_448
from paligemma_tpu.models import gemma, paligemma, siglip
from paligemma_tpu.runtime.engine import PaliGemmaEngine


def sync(x):
    return np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(f, *args, reps=5):
    out = f(*args)
    sync(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        sync(o if isinstance(o, jnp.ndarray) else jax.tree.leaves(o)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    cfg = paligemma_3b_448()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    eng = PaliGemmaEngine(params, cfg, max_seq_len=2048, eos_token_id=1)

    b = 1
    n_img = cfg.vision_config.num_patches
    s_txt = 10
    s = n_img + s_txt
    rng = np.random.default_rng(0)
    ids = np.concatenate(
        [np.full((b, n_img), cfg.image_token_index), np.full((b, s_txt), 5)],
        axis=1,
    ).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    pixels = jnp.asarray(
        rng.normal(size=(b, 3, 448, 448)).astype(np.float32)
    )
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    # full prefill
    full = timeit(lambda: eng.prefill(pixels, ids_j, mask_j)[0])
    print(f"full prefill wall: {full*1e3:.2f} ms", flush=True)

    # vision tower alone
    vis = jax.jit(
        lambda p, px: siglip.encode(p["vision"], cfg.vision_config, px)
    )
    tv = timeit(vis, params, pixels)
    print(f"vision tower ({n_img} patches): {tv*1e3:.2f} ms", flush=True)

    # LM stack alone over pre-merged embeds (the flash prefill path)
    embeds = jnp.asarray(
        rng.normal(size=(b, s, cfg.text_config.hidden_size)) * 0.02,
        jnp.bfloat16,
    )
    pos = jnp.arange(1, s + 1, dtype=jnp.int32)[None]
    cache = gemma.init_kv_cache(cfg.text_config, b, 2048, jnp.bfloat16)
    prefix = jnp.full((b,), s, jnp.int32)

    def lm(params, embeds, cache):
        logits, c2 = gemma.forward(
            params["lm"], cfg.text_config, embeds, pos, cache,
            cache_pos=jnp.asarray(0, jnp.int32),
            kv_valid=jnp.ones((b, 2048), bool),
            flash_lens=(prefix, prefix), logits_idx=jnp.full((b,), s - 1,
                                                            jnp.int32),
        )
        return logits

    lmj = jax.jit(lm, donate_argnums=(2,))
    tl = timeit(lambda: lmj(params, embeds,
                            gemma.init_kv_cache(cfg.text_config, b, 2048,
                                                jnp.bfloat16)))
    print(f"LM stack ({s} tokens): {tl*1e3:.2f} ms", flush=True)

    # FLOPs: LM layers 18 * (qkv+o+mlp) matmuls
    tc = cfg.text_config
    K = tc.hidden_size
    lm_flops = 2 * s * 18 * (
        K * (tc.num_attention_heads * tc.head_dim + 2 * tc.head_dim)  # qkv
        + tc.num_attention_heads * tc.head_dim * K  # o
        + 3 * K * tc.intermediate_size  # gate/up/down
    ) + 2 * s * s * 18 * tc.num_attention_heads * tc.head_dim * 2  # attn
    head_flops = 2 * 1 * K * tc.vocab_size
    print(f"LM matmul TF: {(lm_flops+head_flops)/1e12:.2f} -> "
          f"{(lm_flops+head_flops)/tl/1e12:.1f} TF/s "
          f"({(lm_flops+head_flops)/tl/1e12/197*100:.0f}% of v5e peak)",
          flush=True)

    vc = cfg.vision_config
    Kv = vc.hidden_size
    vis_flops = 2 * n_img * vc.num_hidden_layers * (
        4 * Kv * Kv + 2 * Kv * vc.intermediate_size
    ) + 2 * n_img * n_img * vc.num_hidden_layers * Kv * 2
    print(f"vision matmul TF: {vis_flops/1e12:.2f} -> "
          f"{vis_flops/tv/1e12:.1f} TF/s "
          f"({vis_flops/tv/1e12/197*100:.0f}% of v5e peak)", flush=True)

    if os.environ.get("TRACE"):
        with jax.profiler.trace("/tmp/prefill448_trace"):
            for _ in range(3):
                lg, _ = eng.prefill(pixels, ids_j, mask_j)
            sync(lg)
        print("trace written to /tmp/prefill448_trace", flush=True)


if __name__ == "__main__":
    main()

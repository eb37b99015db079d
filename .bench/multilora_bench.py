"""Multi-LoRA serving overhead A/B at the 3B shape (int8 decode weights).

Workload: the driver bench's serving config (16 slots x 64 new tokens,
224px) run three ways: no bank (fused tick — the production base path),
no bank on the XLA tick (what the LoRA tick would be without adapters),
and a 4-adapter bank with requests spread across base + 4 adapters. The
bank cost = per-row (in, r) gathers + two rank-8 einsums per target per
layer, expected ~2% of the decode weight stream on top of the
fused->XLA tick gap.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.runtime.serving import Request, ServingEngine
from paligemma_tpu.train.lora import init_lora


def adapter(cfg, seed, rank=8):
    lora = init_lora(jax.random.PRNGKey(seed), cfg.text_config, rank=rank,
                     dtype=jnp.bfloat16)
    layers = {}
    for i, (name, p) in enumerate(sorted(lora["layers"].items())):
        k = jax.random.fold_in(jax.random.PRNGKey(seed + 50), i)
        layers[name] = {
            **p, "b": jax.random.normal(k, p["b"].shape, p["b"].dtype) * 0.02,
        }
    return {"layers": layers}


def reqs(cfg, n, base=0, names=(None,)):
    n_img = cfg.vision_config.num_patches
    out = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        ids = np.concatenate(
            [np.full((n_img,), cfg.image_token_index),
             rng.integers(3, 100, (10,))]
        ).astype(np.int32)
        out.append(Request(
            request_id=base + i, input_ids=ids,
            pixel_values=rng.normal(size=(3, 224, 224)).astype(np.float32),
            max_new_tokens=64, do_sample=False, eos_token_id=-1,
            lora=names[i % len(names)],
        ))
    return out


def run(params, cfg, qparams, name, req_names=(None,), **kw):
    eng = ServingEngine(
        params, cfg, max_slots=16, max_seq_len=512,
        decode_params=qparams, sync_every=8, **kw,
    )
    for r in reqs(cfg, 16, base=-100, names=req_names):
        eng.submit(r)
    eng.run_to_completion()
    rs = reqs(cfg, 16, names=req_names)
    for r in rs:
        eng.submit(r)
    t0 = time.perf_counter()
    done = eng.run_to_completion()
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in done)
    print(f"{name:26s} {total / dt:8.1f} tok/s  ({total} tok, {dt:.2f} s)",
          flush=True)


def main():
    cfg = paligemma_3b_224()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_lm_for_serving(params)
    bank = {f"a{i}": adapter(cfg, i) for i in range(4)}
    run(params, cfg, qparams, "base, fused tick", fused_decode=True)
    run(params, cfg, qparams, "base, xla tick", fused_decode=False)
    run(params, cfg, qparams, "4-adapter bank, mixed",
        req_names=(None, "a0", "a1", "a2", "a3"), lora_bank=bank)


if __name__ == "__main__":
    main()

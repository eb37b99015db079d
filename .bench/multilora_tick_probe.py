"""Device-graded multi-LoRA decode-tick A/B (VERDICT r4 #6).

The serving-wave A/B (.bench/multilora_bench.py) is ~70% prefill by
time, so 10-20% TICK differences drown in wave noise (its round-5 run
even shows base-XLA "beating" base-fused). This probe times the TICK
itself — token-chained fori loops at the driver serving geometry
(B=16 lockstep rows, 512-slot window, int8 weights):

  1. base, fused tick        (decode_step_greedy, grid-over-layers +
                              merged/fused argmax head)
  2. 4-adapter bank IN-KERNEL (round-5 concat-basis operands riding the
                              same kernel; per-row rank-block masks)
  3. 4-adapter bank, XLA tick (the round-4 path the in-kernel port
                              replaces: per-row (in, r) gathers + rank-8
                              einsums in XLA, materialized logits)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python .bench/multilora_tick_probe.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import timing  # noqa: F401,E402  (sets the persistent compile cache)

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.core.config import paligemma_3b_224
from paligemma_tpu.kernels import decode_head, decode_layer
from paligemma_tpu.models import paligemma
from paligemma_tpu.runtime.quantize import quantize_lm_for_serving
from paligemma_tpu.train.lora import init_lora, stack_lora_bank

B, W = 16, 512
STEPS = 50


def sync(x):
    return np.asarray(jax.device_get(x.reshape(-1)[0]))


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / STEPS * 1e3  # ms/step


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


def main():
    cfg = paligemma_3b_224()
    tc = cfg.text_config
    t0 = time.time()
    params = paligemma.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    q = quantize_lm_for_serving(params)
    bank = stack_lora_bank([adapter(cfg, i) for i in range(4)])
    del params
    lm = dict(q["lm"])
    lm["layers"] = jax.jit(decode_layer.repack_layers)(lm["layers"])
    lm["head_q"] = jax.jit(decode_head.repack_head)(lm["head_q"])
    qp = {**q, "lm": lm}
    gate_blk = lm["layers"]["mlp"]["gate_blk"]
    _, nc, _, bs = gate_blk.shape
    pack = decode_layer.repack_lora_bank_fused(
        bank["layers"], nc=nc, bs=bs, n_heads=tc.num_attention_heads,
        head_dim=tc.head_dim, hidden=tc.hidden_size,
    )
    print(f"setup: {time.time() - t0:.1f}s", flush=True)

    L, hd = tc.num_hidden_layers, tc.head_dim
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.normal(size=(L, B, W, 1, hd)) * 0.1, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, B, W, 1, hd)) * 0.1, jnp.bfloat16)
    pos = jnp.full((B,), W - 2, jnp.int32)
    valid = jnp.ones((B, W), bool)
    ids = jnp.asarray(np.arange(B) % 5, jnp.int32)  # base + 4 adapters mixed
    tok0 = jnp.full((B,), 7, jnp.int32)

    def make_loop(with_bank, fused):
        lora = None
        if with_bank:
            lora = dict(bank)
            if fused:
                lora["__fused_pack__"] = pack

        @jax.jit
        def loop(qp, lora, tok, kc, vc):
            def body(i, c):
                tok, kc, vc = c
                cache = {"k": kc, "v": vc}
                if fused:
                    t, cache = paligemma.decode_step_greedy(
                        qp, cfg, tok, cache, cache_pos=pos, kv_valid=valid,
                        position_ids=pos + 1, kv_bucket=W,
                        lora=lora, adapter_ids=ids if lora else None,
                    )
                else:
                    lg, cache = paligemma.decode_step(
                        qp, cfg, tok, cache, cache_pos=pos, kv_valid=valid,
                        position_ids=pos + 1, kv_bucket=W,
                        fused_layer=False,
                        lora=lora, adapter_ids=ids if lora else None,
                    )
                    t = jnp.argmax(lg, -1).astype(jnp.int32)
                return t, cache["k"], cache["v"]

            tok, kc, vc = jax.lax.fori_loop(0, STEPS, body, (tok, kc, vc))
            return tok

        return loop

    for name, with_bank, fused in (
        ("base, fused tick", False, True),
        ("4-adapter bank IN-KERNEL", True, True),
        ("4-adapter bank, XLA tick", True, False),
    ):
        loop = make_loop(with_bank, fused)
        lora = None
        if with_bank:
            lora = dict(bank)
            if fused:
                lora["__fused_pack__"] = pack
        ms = timeit(loop, qp, lora, tok0, kc, vc)
        print(f"{name:26s} {ms:.3f} ms/step  {B / ms * 1e3:7.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()

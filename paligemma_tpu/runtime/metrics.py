"""Observability: step metrics and profiler hooks.

The reference's only observability is print statements ("Prefilling Phase",
position-id dumps — ref: modeling_paligemma.py:150,160,197) and Lightning's
self.log in the notebook. Here:

* ``GenerationStats``: TTFT / decode tokens-per-sec collected around the
  engine without touching model code;
* ``trace`` context manager: a ``jax.profiler`` trace (view in Perfetto /
  TensorBoard);
* ``device_sync``: reliable synchronization for timing (on tunneled TPU
  platforms ``block_until_ready`` may not actually block — a one-element
  host readback does).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import List, Optional

import jax
import numpy as np


def device_sync(x) -> None:
    """Force execution of the async chain ending in array ``x``."""
    np.asarray(jax.device_get(x[(0,) * getattr(x, "ndim", 0)]))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class GenerationStats:
    ttft_s: Optional[float] = None
    step_times_s: List[float] = dataclasses.field(default_factory=list)

    @property
    def decode_tokens_per_sec(self) -> float:
        if not self.step_times_s:
            return 0.0
        return len(self.step_times_s) / sum(self.step_times_s)

    @property
    def p50_step_ms(self) -> float:
        return float(np.median(self.step_times_s) * 1e3) if self.step_times_s else 0.0

    def summary(self) -> dict:
        return {
            "ttft_ms": round((self.ttft_s or 0) * 1e3, 2),
            "decode_tokens_per_sec": round(self.decode_tokens_per_sec, 2),
            "p50_step_ms": round(self.p50_step_ms, 3),
            "steps": len(self.step_times_s),
        }


class TimedEngine:
    """Wraps PaliGemmaEngine, recording TTFT and per-step decode latency."""

    def __init__(self, engine):
        self.engine = engine
        self.stats = GenerationStats()

    def prefill(self, *args, **kwargs):
        t0 = time.perf_counter()
        logits, state = self.engine.prefill(*args, **kwargs)
        device_sync(logits)
        self.stats.ttft_s = time.perf_counter() - t0
        return logits, state

    def decode_step(self, token, state):
        t0 = time.perf_counter()
        logits, state = self.engine.decode_step(token, state)
        device_sync(logits)
        self.stats.step_times_s.append(time.perf_counter() - t0)
        return logits, state

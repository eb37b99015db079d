"""Differenced device timing for the tunneled chip.

A host sync costs ~32-40 ms HERE even on already-computed arrays (pure
tunnel round trip), so ``(k calls + 1 sync) / k`` overstates device time
by ~40/k ms. ``dev_time`` cancels every constant (sync + warm dispatch
pipeline fill) by differencing two run lengths:

    device ~= (wall(k2) - wall(k1)) / (k2 - k1)

Valid when per-call device time exceeds the ~0.7-2 ms host dispatch rate
(dispatches pipeline, so the longer run is device-bound end to end).
For lighter calls, raise k until k*device >> 40 ms or loop in-jit.
"""

import os
import time

import jax
import numpy as np

# Share bench.py's persistent compilation cache: the remote compiler charges
# 30-300 s per 3B executable, and each round starts on a fresh box with an
# empty cache — probes that skip this line pay every compile from scratch.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def wall(f, args, k):
    t0 = time.perf_counter()
    o = None
    for _ in range(k):
        o = f(*args)
    sync(o)
    return time.perf_counter() - t0


def dev_time(f, *args, k1=4, k2=16, reps=3):
    o = f(*args)
    sync(o)  # warm / compile
    est = []
    for _ in range(reps):
        w1 = wall(f, args, k1)
        w2 = wall(f, args, k2)
        est.append((w2 - w1) / (k2 - k1))
    return sorted(est)[reps // 2]

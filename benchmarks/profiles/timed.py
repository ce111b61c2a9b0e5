"""Shared TPU timing harness: the axon tunnel's block_until_ready can
return before the computation really finishes, so every measurement
must force completion by pulling a scalar derived from each output
leaf (a tiny dependent op + 4-byte D2H)."""

import time

import numpy as np
import jax


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[-1]))


def timed(fn, *args, reps=10, release=False, **kw):
    """``release=True`` syncs and frees each rep's output before the
    next launch — required when one output is a multi-GB buffer (two
    live copies OOM the chip). It serializes reps, so each pays the
    dispatch latency; use only for 100ms-scale programs."""
    out = fn(*args, **kw)
    _sync(out)
    if release:
        out = None
        t0 = time.perf_counter()
        for _ in range(reps):
            out = None  # free the previous rep's buffers pre-launch
            out = fn(*args, **kw)
            _sync(out)
        return (time.perf_counter() - t0) / reps * 1e3, out
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3, out

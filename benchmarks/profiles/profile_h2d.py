"""H2D tunnel characterization + encode-operand byte reduction A/B.

Round-4 attribution left the 50k headline ~10 ms/batch above the kernel
ceiling and blamed H2D serialization of the 5 encode arrays (21.9 ms
async-queued; one packed i32 buffer measured WORSE at 31.0 ms). This
profiler answers the two open questions before any code changes:

1. Is the tunnel H2D latency-bound or bandwidth-bound?  Sweep
   device_put sizes 64 KB..8 MB, async-queued x10 / one sync, and fit
   the per-transfer floor + effective GB/s.
2. Do smaller dtypes pay?  The encode operands are small integers
   (slot ids < K=2048 at 50k docs -> int16; per-term query counts
   < 128 -> int8), so the same logical content can ship in ~40% of
   the bytes.  A/B: current 5-array i32/f32 encode vs int16/int8
   reduced vs two packed buffers (hot = per-query frequent arrays,
   cold = tail-group arrays).

Run on the real TPU on a quiet host.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np
import jax

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx


def timed_put(arrays, dev, reps=20):
    """Async-queue all puts per rep, sync once at the end (the serving
    regime: transfers overlap the previous batch's kernel)."""
    outs = [jax.device_put(a, dev) for a in arrays]
    for o in outs:
        o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [jax.device_put(a, dev) for a in arrays]
    for o in outs:
        o.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # --- 1. size sweep ------------------------------------------------
    print("--- H2D size sweep (single array, async x20, one sync) ---",
          flush=True)
    for kb in (16, 64, 256, 1024, 4096, 8192):
        a = rng.integers(0, 1 << 30, size=kb * 256, dtype=np.int32)
        ms = timed_put([a], dev)
        print(f"  {kb:5d} KB: {ms:7.2f} ms  "
              f"({a.nbytes / ms / 1e3:6.1f} MB/s)", flush=True)
    # transfer-count sweep at fixed total bytes
    print("--- H2D count sweep (1 MB total, n arrays) ---", flush=True)
    for n in (1, 2, 4, 8):
        arrs = [rng.integers(0, 1 << 30, size=(1024 * 256) // n,
                             dtype=np.int32) for _ in range(n)]
        ms = timed_put(arrs, dev)
        print(f"  {n} x {1024 // n:4d} KB: {ms:7.2f} ms", flush=True)

    # --- 2. encode-operand A/B ---------------------------------------
    corpus = [[f"t{t}" for t in rng.zipf(1.3, size=150) % 30_000]
              for _ in range(50_000)]
    queries = [[f"t{t}" for t in rng.zipf(1.3, size=8) % 30_000]
               for _ in range(8192)]
    scorer = BayesianBM25Scorer(base_rate=0.01, impact_storage="int8")
    t0 = time.time()
    scorer.index(corpus, show_progress=False)
    print(f"index {time.time() - t0:.1f}s", flush=True)
    s = scorer._split

    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tslots, tqcnt = enc
    names = ["fslots", "fcnt", "trows", "tslots", "tqcnt"]
    tot = sum(a.nbytes for a in enc)
    for n, a in zip(names, enc):
        print(f"  {n:7s} {a.dtype} {a.shape} {a.nbytes / 1e3:.0f} KB")
    print(f"  total {tot / 1e3:.0f} KB")

    ms = timed_put(list(enc), dev)
    print(f"A) current 5-array i32/f32:      {ms:7.2f} ms", flush=True)

    # reduced dtypes: slot/row ids fit int16 here (K=2048, rare vocab
    # < 32k, nt <= 8192); counts are tiny ints -> int8
    red = [fslots.astype(np.int16), fcnt.astype(np.int8),
           trows.astype(np.int16), tslots.astype(np.int16),
           tqcnt.astype(np.int8)]
    print(f"  reduced total {sum(a.nbytes for a in red) / 1e3:.0f} KB")
    ms = timed_put(red, dev)
    print(f"B) reduced 5-array i16/i8:       {ms:7.2f} ms", flush=True)

    # host cost of the dtype narrowing itself
    t0 = time.perf_counter()
    for _ in range(20):
        _ = [fslots.astype(np.int16), fcnt.astype(np.int8),
             trows.astype(np.int16), tslots.astype(np.int16),
             tqcnt.astype(np.int8)]
    print(f"   (host astype cost {(time.perf_counter()-t0)/20*1e3:5.2f} ms)",
          flush=True)

    # two-buffer packing: hot (per-query, nq-major) vs cold (tail)
    hot = np.concatenate([fslots.astype(np.int16).ravel(),
                          fcnt.astype(np.int16).ravel()])
    cold = np.concatenate([trows.astype(np.int16).ravel(),
                           tslots.astype(np.int16).ravel(),
                           tqcnt.astype(np.int16).ravel()])
    print(f"  hot {hot.nbytes / 1e3:.0f} KB  cold {cold.nbytes / 1e3:.0f} KB")
    ms = timed_put([hot, cold], dev)
    print(f"C) two packed i16 buffers:       {ms:7.2f} ms", flush=True)

    one = np.concatenate([hot, cold])
    ms = timed_put([one], dev)
    print(f"D) one packed i16 buffer:        {ms:7.2f} ms", flush=True)

    # E: reduced arrays, pinned-order repeated puts interleaved with a
    # dummy kernel to approximate double-buffering benefit
    ms = timed_put(list(enc) + list(red), dev)
    print(f"E) A+B together (10 arrays):     {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

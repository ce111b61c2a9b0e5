"""Serving-loop overhead breakdown at the headline config (50k docs,
8192-query batches, int8 storage).

The kernel's cumulative stage ablation says ~45 ms (int8) of device
time per 8192-query batch, but e2e retrieve_many sustains ~70 ms per
batch — this profiler attributes the ~25 ms gap:
  - host encode (C++ one-pass)
  - H2D device_put latency for the 5 encode arrays, individually and
    as one packed i32 buffer (tunnel transfers are latency-dominated,
    so fewer transfers may matter more than fewer bytes)
  - kernel time proper (async reps, one sync)
  - D2H packed result pull
  - retrieve_many e2e for comparison
Run on the real TPU on a quiet host.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np
import jax
import jax.numpy as jnp

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx


def main():
    rng = np.random.default_rng(0)
    corpus = [[f"t{t}" for t in rng.zipf(1.3, size=150) % 30_000]
              for _ in range(50_000)]
    queries = [[f"t{t}" for t in rng.zipf(1.3, size=8) % 30_000]
               for _ in range(8192)]
    scorer = BayesianBM25Scorer(base_rate=0.01, impact_storage="int8")
    t0 = time.time()
    scorer.index(corpus, show_progress=False)
    print(f"index {time.time()-t0:.1f}s", flush=True)
    s = scorer._split

    # host encode
    scorer.retrieve(queries[:8192], k=10)  # warm compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        enc = sidx.encode_queries_split(queries, s)
    enc_ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"encode (host)            {enc_ms:7.2f} ms", flush=True)
    for a in enc:
        print(f"   {a.dtype} {a.shape} {a.nbytes/1e6:.2f} MB")

    # H2D: individual puts vs one packed buffer
    dev = jax.devices()[0]

    def put_individual():
        outs = [jax.device_put(a, dev) for a in enc]
        for o in outs:
            o.block_until_ready()
        return outs

    put_individual()
    t0 = time.perf_counter()
    for _ in range(reps):
        put_individual()
    print(f"H2D 5 arrays (sync each call) {(time.perf_counter()-t0)/reps*1e3:7.2f} ms",
          flush=True)

    packed = np.concatenate([np.ascontiguousarray(a, dtype=np.int32
                             if a.dtype != np.float32 else np.float32)
                             .view(np.int32).ravel() for a in enc])
    print(f"packed bytes {packed.nbytes/1e6:.2f} MB")

    def put_packed():
        o = jax.device_put(packed, dev)
        o.block_until_ready()
        return o

    put_packed()
    t0 = time.perf_counter()
    for _ in range(reps):
        put_packed()
    print(f"H2D 1 packed buffer      {(time.perf_counter()-t0)/reps*1e3:7.2f} ms",
          flush=True)

    # async-queued H2D: launch all 5 puts, sync once (the serving regime)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [jax.device_put(a, dev) for a in enc]
    for o in outs:
        o.block_until_ready()
    print(f"H2D 5 arrays (async x{reps}, one sync) {(time.perf_counter()-t0)/reps*1e3:7.2f} ms",
          flush=True)

    # launch-only loop: host cost per dispatch (encode + puts + trace
    # lookup), device runs async behind it
    reps_l = 10
    scorer._retrieve_launch(queries, 10, False, None)
    t0 = time.perf_counter()
    for _ in range(reps_l):
        out = scorer._retrieve_launch(queries, 10, False, None)
    host_ms = (time.perf_counter() - t0) / reps_l * 1e3
    print(f"launch host-side cost    {host_ms:7.2f} ms/batch", flush=True)
    # + one sync: steady-state pipeline floor (max of host rate and
    # device rate; excludes the final D2H pull)
    t0 = time.perf_counter()
    for _ in range(reps_l):
        out = scorer._retrieve_launch(queries, 10, False, None)
    out[1].block_until_ready()
    pipe_ms = (time.perf_counter() - t0) / reps_l * 1e3
    print(f"pipelined floor (launch+1 sync) {pipe_ms:7.2f} ms/batch "
          f"({8192/pipe_ms*1e3:,.0f} q/s)", flush=True)

    # D2H packed result pull
    pn, top_ids, probs = out[:3]
    from bayesian_bm25_tpu.engine import scoring
    pk = scoring.pack_ids_probs(top_ids, probs)
    pk.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps_l):
        np.asarray(pk)
    print(f"D2H packed pull          {(time.perf_counter()-t0)/reps_l*1e3:7.2f} ms",
          flush=True)

    # e2e retrieve_many (5 permuted batches, the bench.py protocol)
    batches = [queries] + [[queries[i] for i in rng.permutation(8192)]
                           for _ in range(4)]
    scorer.retrieve_many(batches, k=10)
    t0 = time.perf_counter()
    scorer.retrieve_many(batches, k=10)
    dt = (time.perf_counter() - t0) / 5
    print(f"retrieve_many e2e        {dt*1e3:7.2f} ms/batch "
          f"({8192/dt:,.0f} q/s)", flush=True)

    # single retrieve (per-call latency incl. D2H)
    t0 = time.perf_counter()
    for _ in range(5):
        scorer.retrieve(queries, k=10)
    print(f"retrieve (per-call)      {(time.perf_counter()-t0)/5*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

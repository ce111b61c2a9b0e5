"""1M-doc end-to-end serving refresh on the current kernel stack.

Measures the numbers BENCHMARK_RESULTS' scalability table reports:
  - pipelined `retrieve` q/s (16384 queries -> 16 auto-chunked
    1024-query chunks; the production any-batch serving path)
  - steady-state `retrieve_many` q/s (double-buffered server regime,
    same protocol as bench.py's 50k headline)
  - single-chunk latency (1024 queries, depth-1 pipeline)
Storage tier is whatever the auto rule picks at 1M padded docs
(int8 since the >=256k auto decision); also A/Bs the hilo tier for
the table's error-class note. Run on the real TPU; uses the cached
scorer archive from profile_1m_stages.py.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np

from profile_1m_stages import CACHE


def main():
    rng = np.random.default_rng(0)
    vocab = 120_000
    from bayesian_bm25_tpu.engine import split_index as sidx
    from bayesian_bm25_tpu.utils.io import load_scorer
    t0 = time.time()
    scorer = load_scorer(CACHE)
    sp = scorer._split
    storage = (scorer._split.dense_impact.dtype.name if sp.impact_scale
               is None else "int8")
    print(f"load {time.time()-t0:.0f}s  storage={storage}  "
          f"K={sp.n_frequent}  T_A={sp.tail_term_ids.shape[1]}",
          flush=True)
    post = (None if sp.post_doc_ids is None
            else tuple(sp.post_doc_ids.shape))
    post2 = (None if sp.post2_doc_ids is None
             else tuple(sp.post2_doc_ids.shape))
    print(f"kernel path: postings={post}  tier2={post2}  "
          f"light_heavy={sidx.LIGHT_HEAVY}  "
          f"({'sparse-candidate' if post else 'dense compare tail'})",
          flush=True)

    queries = [[f"t{q}" for q in rng.zipf(1.3, size=8) % vocab]
               for _ in range(16384)]
    chunk = queries[:1024]

    # pipelined retrieve (auto-chunked)
    scorer.retrieve(queries, k=10)  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        scorer.retrieve(queries, k=10)
    dt = (time.perf_counter() - t0) / reps
    print(f"retrieve 16384q pipelined: {dt*1e3:8.1f} ms  "
          f"{len(queries)/dt:8.0f} q/s", flush=True)

    # steady-state retrieve_many (distinct permuted batches)
    batches = [queries] + [
        [queries[i] for i in rng.permutation(len(queries))]
        for _ in range(2)]
    scorer.retrieve_many(batches, k=10)
    t0 = time.perf_counter()
    scorer.retrieve_many(batches, k=10)
    dt = (time.perf_counter() - t0) / len(batches)
    print(f"retrieve_many steady-state: {len(queries)/dt:8.0f} q/s",
          flush=True)

    # single-chunk latency
    scorer.retrieve(chunk, k=10)
    t0 = time.perf_counter()
    for _ in range(5):
        scorer.retrieve(chunk, k=10)
    dt = (time.perf_counter() - t0) / 5
    print(f"single 1024q chunk: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

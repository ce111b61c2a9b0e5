"""Sharded-retrieval scaling study on a virtual CPU mesh.

Measures the distributed sparse-candidate retrieve at 1/2/4/8 virtual
devices — throughput RATIOS and per-shard memory, not absolute speed:
every virtual device shares this host's core(s), so compute cannot
scale here; what the curve exposes is the sharding layer's overhead
(per-shard kernel launch, all_gather merge, replicated query encode)
and the per-shard HBM accounting that governs a real multi-chip
deployment. The merge-cost model it validates: each query ships
``local_k x 16 bytes`` (score, id, tf, dl as f32/i32) per shard over
ICI — k * n_shards * 16 B/query at the exact default, independent of
corpus size.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/sharded_scaling.py
(under the repo conftest-free CLI, the script forces the platform itself)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Force the virtual CPU mesh before jax initializes (the axon site hook
# pins a TPU platform; config.update must land pre-backend-init).
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_bm25_tpu import (  # noqa: E402
    BayesianBM25Scorer,
    ShardedBayesianBM25Scorer,
)


def make_corpus(rng, n_docs, doc_len=60, vocab=8000):
    zipf = rng.zipf(1.3, size=(n_docs, doc_len)) % vocab
    return [[f"t{t}" for t in row] for row in zipf]


def make_queries(rng, n, vocab=8000):
    return [[f"t{t}" for t in rng.zipf(1.3, size=6) % vocab]
            for _ in range(n)]


def nbytes(x):
    return 0 if x is None else x.size * x.dtype.itemsize


def shard_memory(scorer):
    """Per-shard device bytes of the split index + postings."""
    s = scorer._split
    n = getattr(scorer, "_n_shards", 1)
    total = (nbytes(s.dense_impact) + nbytes(s.dense_impact_lo)
             + nbytes(s.dense_presence) + nbytes(s.tail_term_ids)
             + nbytes(s.tail_weights))
    post = 0
    if getattr(scorer, "_post_sh", None) is not None:
        post = nbytes(scorer._post_sh[0]) + nbytes(scorer._post_sh[1])
    elif s.post_doc_ids is not None:
        post = nbytes(s.post_doc_ids) + nbytes(s.post_weights)
    return (total + post) / n


def bench(scorer, batches, k, reps=2):
    outs = scorer.retrieve_many(batches, k=k)  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        outs = scorer.retrieve_many(batches, k=k)
    dt = (time.time() - t0) / reps
    del outs
    return sum(len(b) for b in batches) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    corpus = make_corpus(rng, args.docs)
    batches = [make_queries(rng, args.queries)]

    rows = []
    single = BayesianBM25Scorer(base_rate=0.01)
    single.index(corpus, show_progress=False)
    qps1 = bench(single, batches, args.k)
    rows.append({"devices": 1, "qps": qps1, "ratio": 1.0,
                 "shard_MB": shard_memory(single) / 2**20,
                 "merge_B_per_query": 0})
    print(f"single-chip       : {qps1:8.0f} q/s  "
          f"{rows[-1]['shard_MB']:7.1f} MB/shard", flush=True)

    for n in (2, 4, 8):
        sc = ShardedBayesianBM25Scorer(base_rate=0.01, n_devices=n)
        sc.index(corpus, show_progress=False)
        qps = bench(sc, batches, args.k)
        rows.append({
            "devices": n, "qps": qps, "ratio": qps / qps1,
            "shard_MB": shard_memory(sc) / 2**20,
            "merge_B_per_query": args.k * n * 16,
        })
        print(f"{n}-device mesh    : {qps:8.0f} q/s  "
              f"ratio {qps/qps1:4.2f}  "
              f"{rows[-1]['shard_MB']:7.1f} MB/shard  "
              f"merge {args.k * n * 16} B/q", flush=True)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"written to {args.output}")


if __name__ == "__main__":
    main()

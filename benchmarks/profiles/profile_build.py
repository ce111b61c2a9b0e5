"""Index-build stage profile: where does BayesianBM25Scorer.index() spend
its time on the host?

Stages timed independently on a synthetic Zipf corpus (the bench.py
regime): native C++ corpus pass (tokenize-free pre-tokenized variant),
Python fallback builder, numpy weight table, split-accelerator build,
and the end-to-end scorer.index(). Runs entirely on the host plus
whatever jax backend is configured (pass --device cpu to force CPU).

Usage: python benchmarks/profiles/profile_build.py [--docs 50000]
       [--doc-len 150] [--vocab 30000] [--device auto] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_corpus(rng, n_docs, doc_len, vocab):
    zipf = rng.zipf(1.3, size=(n_docs, doc_len)) % vocab
    return [[f"t{t}" for t in row] for row in zipf]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--doc-len", type=int, default=150)
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--device", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    corpus = make_corpus(rng, args.docs, args.doc_len, args.vocab)
    n_tokens = sum(len(d) for d in corpus)
    print(f"corpus: {args.docs} docs, {n_tokens} tokens, "
          f"vocab ~{args.vocab}", flush=True)

    out: dict[str, float] = {}

    def timeit(name, fn, reps=args.reps):
        fn()  # warm (allocators, imports, jit)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        out[name] = best
        print(f"  {name:38s} {best * 1e3:9.1f} ms "
              f"({n_tokens / best / 1e6:6.1f} Mtok/s)", flush=True)
        return best

    # --- native C++ corpus pass (vocab + CSR from pre-tokenized) ---
    from bayesian_bm25_tpu.engine import native as nat

    res = {}

    def native_pass():
        res["r"] = nat.build_corpus_tokens_native(corpus)

    timeit("native corpus pass (vocab+CSR)", native_pass)
    vocab, indptr, tids, counts, dlens = res["r"]
    print(f"    -> n_vocab={len(vocab)} nnz={len(tids)}", flush=True)

    # --- Python fallback builder (dict interning + Counter) ---
    from bayesian_bm25_tpu.engine.index import _corpus_to_csr

    if args.docs <= 100_000:
        timeit("python corpus pass (_corpus_to_csr)", lambda: _corpus_to_csr(corpus, {}), reps=1)

    # --- weight table from CSR (numpy, float64) ---
    from bayesian_bm25_tpu.engine import index as eidx

    def weights():
        eidx.build_index(
            [None] * args.docs, vocab=vocab,
            csr=(indptr, tids.astype(np.int64), counts.astype(np.int64),
                 dlens.astype(np.int64)))

    timeit("build_index from CSR (weights+device)", weights)

    # --- split accelerator build ---
    from bayesian_bm25_tpu.engine.split_index import build_split_index

    idx = eidx.build_index(
        [None] * args.docs, vocab=vocab,
        csr=(indptr, tids.astype(np.int64), counts.astype(np.int64),
             dlens.astype(np.int64)))
    timeit("build_split_index", lambda: build_split_index(idx))

    # --- end-to-end scorer.index() ---
    from bayesian_bm25_tpu import BayesianBM25Scorer

    def full():
        s = BayesianBM25Scorer(base_rate=0.01)
        s.index(corpus, show_progress=False)

    timeit("scorer.index() end-to-end", full, reps=1)

    print(json.dumps({k: round(v * 1e3, 1) for k, v in out.items()}))


if __name__ == "__main__":
    main()

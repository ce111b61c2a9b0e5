"""1M-doc serving throughput with the current kernels (hilo storage,
auto-chunking, pipelined retrieve_many, single packed pull).
Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np

from bayesian_bm25_tpu import BayesianBM25Scorer


def main():
    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 1_000_000, 120, 120_000
    print("building corpus...", flush=True)
    zipf = rng.zipf(1.3, size=(n_docs, doc_len)) % vocab
    corpus = [[f"t{t}" for t in row] for row in zipf]
    print("indexing...", flush=True)
    t0 = time.time()
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    print(f"index time {time.time()-t0:.1f}s  auto-chunk "
          f"{scorer._auto_batch_size()}", flush=True)
    queries = [[f"t{t}" for t in rng.zipf(1.3, size=8) % vocab]
               for _ in range(4096)]
    batches = [queries] + [
        [queries[i] for i in rng.permutation(len(queries))]
        for _ in range(2)]
    scorer.retrieve_many(batches, k=10)  # warm all chunk shapes
    t0 = time.time()
    outs = scorer.retrieve_many(batches, k=10)
    dt = (time.time() - t0) / len(batches)
    print(f"1M docs: {len(queries)/dt:,.0f} q/s "
          f"({dt*1e3:.1f} ms per 4096-query batch)", flush=True)


if __name__ == "__main__":
    main()

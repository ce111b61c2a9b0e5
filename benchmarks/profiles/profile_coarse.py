"""Rank-only fast tier (coarse=True) A/B at the 50k serving regime.

Measures what the flag docs promise (round-4 VERDICT next #7):
steady-state throughput exact-int8 vs coarse-int8 (lo-residual matmul
pass dropped), plus top-10 agreement statistics between the tiers.
Run on the real TPU on a QUIET host.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np

from bayesian_bm25_tpu import BayesianBM25Scorer


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

    batches = [queries] + [
        [queries[i] for i in rng.permutation(len(queries))]
        for _ in range(4)]

    def bench(coarse):
        scorer.retrieve_many(batches, k=10, coarse=coarse)  # warm
        t0 = time.perf_counter()
        outs = scorer.retrieve_many(batches, k=10, coarse=coarse)
        dt = (time.perf_counter() - t0) / len(batches)
        return len(queries) / dt, outs[0]

    qps_e, (ids_e, p_e) = bench(False)
    qps_c, (ids_c, p_c) = bench(True)
    print(f"exact  int8: {qps_e:8.0f} q/s", flush=True)
    print(f"coarse int8: {qps_c:8.0f} q/s  ({qps_c / qps_e:.2f}x)",
          flush=True)

    # agreement stats on batch 0
    overlaps = np.array([
        len(set(ids_e[i]) & set(ids_c[i])) / ids_e.shape[1]
        for i in range(ids_e.shape[0])])
    top1 = float(np.mean(ids_e[:, 0] == ids_c[:, 0]))
    print(f"top-10 overlap: mean {overlaps.mean():.4f}  "
          f"p5 {np.quantile(overlaps, 0.05):.2f}  "
          f"min {overlaps.min():.2f}", flush=True)
    print(f"top-1 agreement: {top1:.4f}", flush=True)
    same = ids_e == ids_c
    if same.any():
        rel = np.abs(p_c[same] - p_e[same]) / np.maximum(p_e[same], 1e-9)
        print(f"prob rel-err at agreeing slots: mean {rel.mean():.2e} "
              f"max {rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()

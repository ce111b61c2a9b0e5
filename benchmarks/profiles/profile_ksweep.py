"""n_frequent (K) sweep for the sparse-candidate kernel, dense vs
rank-packed candidate build.

K trades MXU matmul width against rare-postings merge width; the 2048
default was tuned with the dense (Qt-grid) build. If the packed build
cuts the merge cost, a smaller K may win overall. Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import numpy as np
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx
from timed import timed


def main():
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    idx, k = scorer._index, 10
    prec = scorer._matmul_precision

    for K in (1024, 1536, 2048, 3072):
        s = sidx.build_split_index(idx, n_frequent=K, storage="hilo")
        if s.post_doc_ids is None:
            print(f"K {K}: no postings, skipped")
            continue
        enc = sidx.encode_queries_split(queries, s)
        fslots, fcnt, trows, tqids, tqcnt = enc
        tslots = sidx.map_tail_slots(tqids, s)
        cap = sidx.candidate_cap(s, tslots, k)
        R = s.post_doc_ids.shape[0] - 1
        pk, r_max = sidx.compact_tail_postings(tslots, tqcnt, R)
        P = s.post_doc_ids.shape[1]
        print(f"K {K}: P {P} Qt {tslots.shape[1]} r_max {r_max} "
              f"cap {cap} nt {len(trows)}", flush=True)
        common = (s.dense_impact, s.dense_presence, s.post_doc_ids,
                  s.post_weights, idx.doc_lengths, idx.avgdl,
                  jnp.asarray(fslots), jnp.asarray(fcnt),
                  jnp.asarray(trows), jnp.asarray(tslots),
                  jnp.asarray(tqcnt), k, cap, 1.0, 2.0, 0.05)
        kw = dict(n_docs=idx.n_docs, impact_lo=s.dense_impact_lo,
                  tf_from_sign=s.post_w_positive)
        packed = {"compact": jnp.asarray(pk), "compact_rmax": r_max}
        for name, extra in (("dense", {}), ("packed", packed)):
            ms, _ = timed(sidx.retrieve_topk_split_sparse, *common,
                          **kw, **extra)
            nq = len(queries)
            print(f"  K {K} {name:7s} {ms:7.2f} ms  "
                  f"{nq/ms*1000:9.0f} q/s", flush=True)


if __name__ == "__main__":
    main()

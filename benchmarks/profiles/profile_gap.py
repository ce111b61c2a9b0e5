"""Attribute the per-batch gap between kernel time and serving wall:
(a) 5 launches with pre-staged device inputs, one packed pull at end;
(b) same but with fresh H2D of the encoded arrays per batch;
(c) the real retrieve_many. Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import scoring, split_index as sidx


def main():
    rng = np.random.default_rng(7)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    s, idx, k = scorer._split, scorer._index, 10
    t = scorer._transform
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    host = (fslots, fcnt, trows, tslots, tqcnt)
    dev = tuple(jnp.asarray(a) for a in host)
    from bayesian_bm25_tpu.engine import pallas_gather as pg
    use_pg = pg.eligible(s.dense_impact.shape[0], len(trows), masked=False)

    def launch(args):
        return sidx.retrieve_topk_split_sparse(
            s.dense_impact, s.dense_presence, s.post_doc_ids,
            s.post_weights, idx.doc_lengths, idx.avgdl,
            args[0], args[1], args[2], args[3], args[4], k, cap,
            t.alpha, t.beta, t.base_rate, n_docs=idx.n_docs,
            approx=False, precision=scorer._matmul_precision,
            impact_lo=s.dense_impact_lo, pallas_gather=use_pg,
            tf_from_sign=s.post_w_positive)

    # warm
    o = launch(dev)
    np.asarray(scoring.pack_ids_probs(o[0], o[1]))

    for name, fresh in (("pre-staged", False), ("fresh H2D", True)):
        for _ in range(2):
            t0 = time.perf_counter()
            packs = []
            for _ in range(5):
                args = tuple(jnp.asarray(a) for a in host) if fresh else dev
                o = launch(args)
                packs.append(scoring.pack_ids_probs(o[0], o[1]))
            big = np.asarray(jnp.concatenate(packs, axis=1))
            ms = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{name:10s} 5-batch loop   {ms:7.2f} ms/batch")

    batches = [queries] + [[queries[i] for i in rng.permutation(len(queries))]
                           for _ in range(4)]
    scorer.retrieve_many(batches, k=k)
    t0 = time.perf_counter()
    scorer.retrieve_many(batches, k=k)
    ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"retrieve_many          {ms:7.2f} ms/batch")


if __name__ == "__main__":
    main()

"""Cumulative-stage ablation of retrieve_topk_split_sparse as shipped.

Times jitted prefixes of the real kernel (matmul -> +leader topk ->
+merge -> +tf/transform) on the bench regime; successive differences
are the stage costs. Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx
from bayesian_bm25_tpu.ops import transform as T
from timed import timed


def main():
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    s, idx, k = scorer._split, scorer._index, 10
    t = scorer._transform
    n_docs = idx.n_docs
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    fslots, fcnt, trows, tslots, tqcnt = map(
        jnp.asarray, (fslots, fcnt, trows, tslots, tqcnt))
    K = s.n_frequent
    prec = scorer._matmul_precision
    from bayesian_bm25_tpu.engine import pallas_gather as pg
    use_pg = pg.eligible(s.dense_impact.shape[0], len(trows), masked=False)
    print("pallas_gather eligible:", use_pg, " tf_from_sign:",
          s.post_w_positive, " cap:", cap, " nt:", len(trows))

    def prefix(stage):
        @jax.jit
        def f(impact, impact_lo, presence, post_ids, post_w, dl,
              fslots, fcnt, trows, tslots, tqcnt):
            qvec, qpres = sidx._densify_queries(fslots, fcnt, K)
            scores = sidx._impact_matmul(qvec, impact, impact_lo, prec)
            if stage == "matmul":
                return scores
            topm_s, topm_i = sidx.exact_topk_blockwise(
                scores, k, block=256, valid_upto=n_docs)
            if stage == "topk":
                return topm_s, topm_i
            out = sidx._sparse_merge(
                scores, topm_s, topm_i, post_ids, post_w, trows, tslots,
                tqcnt, k, cap, n_docs, pallas_gather=use_pg,
                tf_from_sign=s.post_w_positive)
            if stage == "merge":
                return out
            out_ids, out_scores, out_tail_tf = out
            dead = ~jnp.isfinite(out_scores)
            out_scores = jnp.where(dead, 0.0, out_scores)
            out_ids = jnp.where(dead, -1, out_ids)
            pres_rows = presence[jnp.maximum(out_ids, 0)]
            tf_freq = jnp.einsum("nkc,nc->nk", pres_rows,
                                 qpres.astype(presence.dtype),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
            top_tfs = tf_freq + out_tail_tf
            top_dlr = dl[jnp.maximum(out_ids, 0)] / idx.avgdl
            probs = T.score_to_probability(
                out_scores, top_tfs, top_dlr, t.alpha, t.beta, t.base_rate)
            return out_ids, jnp.where(out_scores > 0,
                                      probs.astype(out_scores.dtype), 0.0)
        return f

    args = (s.dense_impact, s.dense_impact_lo, s.dense_presence,
            s.post_doc_ids, s.post_weights, idx.doc_lengths,
            fslots, fcnt, trows, tslots, tqcnt)
    prev = 0.0
    for stage in ("matmul", "topk", "merge", "full"):
        ms, _ = timed(prefix(stage), *args)
        print(f"{stage:8s} cumulative {ms:7.2f} ms   stage {ms-prev:7.2f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

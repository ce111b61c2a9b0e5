"""E2E kernel A/B of the unique-key candidate sort (UNIQUE_KEY_SORT).

Measures the full retrieve_topk_split_sparse kernel at the 50k-doc
serving shapes with the unstable unique-key sort on vs the stable
id-key sort off, asserting bit-identical (ids, probs) first. The sort
stage in isolation measured 5.9-6.7 vs 6.7-8.9 ms (profile_merge4.py);
this decides whether the ~1-2 ms survives in-stream.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from timed import timed

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx


def main():
    k = 10
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng, n_docs=50_000)
    queries = make_queries(rng, n=8192)
    scorer = BayesianBM25Scorer(base_rate=0.01, impact_storage="int8")
    scorer.index(corpus, show_progress=False)
    s = scorer._split
    idx = scorer._index
    t = scorer._transform
    fslots, fcnt, trows, tqids, tqcnt = sidx.encode_queries_split(
        queries, s)
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    args = tuple(map(jnp.asarray, (fslots, fcnt, trows, tslots, tqcnt)))
    from bayesian_bm25_tpu.engine import pallas_gather as pg
    use_pg = pg.eligible(s.dense_impact.shape[0], len(trows))

    def run():
        return sidx.retrieve_topk_split_sparse(
            s.dense_impact, s.dense_presence, s.post_doc_ids,
            s.post_weights, idx.doc_lengths, idx.avgdl, *args, k, cap,
            t.alpha, t.beta, t.base_rate, n_docs=idx.n_docs,
            precision=scorer._matmul_precision,
            impact_lo=s.dense_impact_lo, pallas_gather=use_pg,
            tf_from_sign=s.post_w_positive, impact_scale=s.impact_scale,
            q_int8_ok=sidx._q_int8_ok(s, args[1]))

    outs = {}
    for flag in (False, True):
        sidx.UNIQUE_KEY_SORT = flag
        # distinct static config is needed to avoid the jit cache
        # returning the other variant's executable: the flag is read at
        # trace time, and retrieve_topk_split_sparse's cache key does
        # not include it — clear the cache between variants.
        sidx.retrieve_topk_split_sparse.clear_cache()
        outs[flag] = jax.block_until_ready(run())
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_array_equal(np.asarray(outs[False][1]),
                                  np.asarray(outs[True][1]))
    print("e2e bit-parity: OK", flush=True)

    for rep in range(3):
        for flag in (False, True):
            sidx.UNIQUE_KEY_SORT = flag
            sidx.retrieve_topk_split_sparse.clear_cache()
            run()  # compile outside timing
            ms, _ = timed(run)
            print(f"ukey={int(flag)} rep{rep}  kernel e2e {ms:7.2f} ms "
                  f"({8192 / ms * 1e3:,.0f} q/s)", flush=True)
    sidx.UNIQUE_KEY_SORT = True


if __name__ == "__main__":
    main()

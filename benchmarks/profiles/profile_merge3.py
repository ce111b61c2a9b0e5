"""Merge-stage experiment: packed single-key sort vs shipped 2-operand.

The shipped sparse-merge sorts (cand_ids, cand_v) as a 2-operand stable
lax.sort (engine/split_index.py:_sparse_merge). Hypothesis: packing
(id, column) into ONE int32 key — id * W + col, W = next pow2 >= C —
lets the sorter move half the bytes (one i32 array instead of i32+f32)
at the cost of one take_along_axis gather of v afterwards. Stability is
free: keys are unique and col-ascending within a doc id, so the
unstable single-key sort reproduces the stable 2-operand order exactly
(same float summation order downstream).

Fits 50k-doc serving shapes comfortably: id < D_pad (2^16) and
W = 1024 -> 26-bit keys. At 1M docs (2^20 id) * 1024 = 2^30 still fits
int32. Run on the real TPU; prints per-variant stage times and asserts
bit-identical merged outputs first.
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


def build_inputs(n_docs=50_000, nq=8192):
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng, n_docs=n_docs)
    queries = make_queries(rng, n=nq)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    s = scorer._split
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k=10)
    return scorer, s, map(jnp.asarray, (fslots, fcnt, trows, tslots,
                                        tqcnt)), cap


def main():
    k = 10
    scorer, s, (fslots, fcnt, trows, tslots, tqcnt), cap = build_inputs()
    idx = scorer._index
    n_docs = idx.n_docs
    K = s.n_frequent
    prec = scorer._matmul_precision
    post_ids, post_w = s.post_doc_ids, s.post_weights
    nt, Qt = tslots.shape
    P = post_ids.shape[1]
    print(f"nt={nt} Qt={Qt} P={P} cap={cap}", flush=True)

    # Matrices go in as ARGUMENTS — closure capture would embed them as
    # HLO constants and blow the tunnel's remote_compile limit (413).
    @jax.jit
    def pre(fslots, fcnt, imp, lo):
        qvec, _ = sidx._densify_queries(fslots, fcnt, K)
        scores = sidx._impact_matmul(qvec, imp, lo, prec)
        tm_s, tm_i = sidx.exact_topk_blockwise(scores, k, block=256,
                                               valid_upto=n_docs)
        return scores, tm_s, tm_i

    scores, topm_s, topm_i = jax.block_until_ready(
        pre(fslots, fcnt, s.dense_impact, s.dense_impact_lo))
    nq = scores.shape[0]
    D_pad = scores.shape[1]

    def build(trows, tslots, tqcnt, post_ids, post_w, topm_i):
        pid = post_ids[tslots]
        v = tqcnt[:, :, None] * post_w[tslots]
        cand_ids = jnp.concatenate(
            [topm_i[trows], pid.reshape(nt, -1)], axis=1)
        cand_v = jnp.concatenate(
            [jnp.zeros((nt, k), jnp.float32), v.reshape(nt, -1)], axis=1)
        return cand_ids, cand_v

    C = k + Qt * P
    cc = min(max(cap, k), C)

    @jax.jit
    def shipped(trows, tslots, tqcnt, post_ids, post_w, topm_i):
        cand_ids, cand_v = build(trows, tslots, tqcnt,
                                 post_ids, post_w, topm_i)
        sid, sv = jax.lax.sort((cand_ids, cand_v), dimension=1,
                               is_stable=True, num_keys=1)
        return sid[:, :cc], sv[:, :cc]

    W = 1 << int(np.ceil(np.log2(C)))

    @jax.jit
    def packed(trows, tslots, tqcnt, post_ids, post_w, topm_i):
        cand_ids, cand_v = build(trows, tslots, tqcnt,
                                 post_ids, post_w, topm_i)
        col = jnp.arange(C, dtype=jnp.int32)[None, :]
        key = cand_ids.astype(jnp.int32) * W + col
        skey = jax.lax.sort(key, dimension=1, is_stable=False)
        sid = skey // W
        scol = skey - sid * W
        sv = jnp.take_along_axis(cand_v, scol, axis=1)
        return sid[:, :cc], sv[:, :cc]

    # correctness first: identical sorted ids AND values
    margs = (post_ids, post_w, topm_i)
    a = jax.block_until_ready(shipped(trows, tslots, tqcnt, *margs))
    b = jax.block_until_ready(packed(trows, tslots, tqcnt, *margs))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    print("bit-parity: OK", flush=True)

    for name, fn in (("shipped-2op", shipped), ("packed-1key", packed),
                     ("shipped-2op#2", shipped), ("packed-1key#2", packed)):
        ms, _ = timed(fn, trows, tslots, tqcnt, *margs)
        print(f"{name:14s} build+sort+slice {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

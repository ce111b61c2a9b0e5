"""Selection-stage block-size A/B for exact_topk_blockwise.

The tail after the Pallas block-max is dominated by the (nq, k, block)
candidate-tile gather (~84 MB at block 256); halving the block halves
that traffic but doubles the block-max output width. Times the
matmul+selection prefix at block {128, 256, 512} plus sub-stages.
Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx
from bayesian_bm25_tpu.engine import pallas_reduce as pr
from timed import timed


def main():
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    s, idx, k = scorer._split, scorer._index, 10
    n_docs = idx.n_docs
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt = map(jnp.asarray, enc[:2])
    K = s.n_frequent
    prec = scorer._matmul_precision
    D_pad = s.dense_impact.shape[0]
    print(f"D_pad {D_pad}  n_docs {n_docs}")

    @jax.jit
    def mm_only(impact, impact_lo, fslots, fcnt):
        qvec, _ = sidx._densify_queries(fslots, fcnt, K)
        return sidx._impact_matmul(qvec, impact, impact_lo, prec)

    base_ms, scores = timed(mm_only, s.dense_impact, s.dense_impact_lo,
                            fslots, fcnt)
    print(f"matmul only   {base_ms:7.2f} ms")

    def sel(block):
        @jax.jit
        def f(impact, impact_lo, fslots, fcnt):
            qvec, _ = sidx._densify_queries(fslots, fcnt, K)
            sc = sidx._impact_matmul(qvec, impact, impact_lo, prec)
            return sidx.exact_topk_blockwise(sc, k, block=block,
                                             valid_upto=n_docs)
        return f

    ref = None
    for block in (128, 256, 512):
        if D_pad % block:
            print(f"block {block}: skipped (D_pad % block != 0)")
            continue
        ms, out = timed(sel(block), s.dense_impact, s.dense_impact_lo,
                        fslots, fcnt)
        print(f"block {block:4d}  mm+select {ms:7.2f} ms  "
              f"select {ms-base_ms:7.2f} ms  "
              f"pallas={pr.eligible(scores.shape[0], D_pad, block)}")
        if ref is None:
            ref = tuple(np.asarray(o) for o in out)
        else:
            for a, b in zip(ref, out):
                np.testing.assert_array_equal(a, np.asarray(b))

    # Sub-stages at the current default (standalone, input pre-staged —
    # overstates each by ~one dispatch RPC but the ratio is what matters)
    nq = scores.shape[0]
    for block in (128, 256):
        if D_pad % block or not pr.eligible(nq, D_pad, block):
            continue
        G = D_pad // block
        bmax_f = jax.jit(lambda sc, b=block: pr.block_max(
            sc, b, valid_upto=n_docs))
        ms, bmax = timed(bmax_f, scores)
        print(f"block {block:4d}  bmax        {ms:7.2f} ms")

        @jax.jit
        def tail(sc, bmax, b=block, g=G):
            _, bids = jax.lax.top_k(bmax, k)
            bids = jnp.sort(bids, axis=1)
            rows = jnp.arange(sc.shape[0])[:, None]
            tiles = sc.reshape(sc.shape[0], g, b)
            cand = tiles[rows, bids].reshape(sc.shape[0], k * b)
            cand_ids = (bids[:, :, None] * b
                        + jnp.arange(b)[None, None, :]).reshape(
                sc.shape[0], k * b)
            cand = jnp.where(cand_ids < n_docs, cand, -jnp.inf)
            v, p = jax.lax.top_k(cand, k)
            return v, jnp.take_along_axis(cand_ids, p, axis=1)

        ms, tail_out = timed(tail, scores, bmax)
        print(f"block {block:4d}  tail        {ms:7.2f} ms")

        @jax.jit
        def tail_onehot(sc, bmax, b=block, g=G):
            # One-hot MXU gather of the k candidate tiles: reads the
            # score matrix once at full HBM bandwidth instead of XLA's
            # slice-at-a-time tile gather.
            n = sc.shape[0]
            _, bids = jax.lax.top_k(bmax, k)
            bids = jnp.sort(bids, axis=1)
            onehot = (bids[:, :, None]
                      == jnp.arange(g)[None, None, :]).astype(jnp.float32)
            tiles = sc.reshape(n, g, b)
            # HIGHEST = full-f32 MXU emulation; with an exact 0/1
            # one-hot the per-element sum is v_hi + v_mid + v_lo, which
            # reconstructs the f32 value bit-exactly (finite scores).
            cand = jnp.einsum("nkg,ngb->nkb", onehot, tiles,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            cand = cand.reshape(n, k * b)
            cand_ids = (bids[:, :, None] * b
                        + jnp.arange(b)[None, None, :]).reshape(n, k * b)
            cand = jnp.where(cand_ids < n_docs, cand, -jnp.inf)
            v, p = jax.lax.top_k(cand, k)
            return v, jnp.take_along_axis(cand_ids, p, axis=1)

        ms, oh_out = timed(tail_onehot, scores, bmax)
        ok = all(bool(jnp.all(a == o))
                 for a, o in zip(tail_out, oh_out))
        print(f"block {block:4d}  tail-onehot {ms:7.2f} ms  match={ok}")


if __name__ == "__main__":
    main()

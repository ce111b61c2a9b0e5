"""Merge-stage sub-profile as shipped (2-operand sort, pallas gather).
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
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    fslots, fcnt, trows, tslots, tqcnt = map(
        jnp.asarray, (fslots, fcnt, trows, tslots, tqcnt))
    K = s.n_frequent
    prec = scorer._matmul_precision
    post_ids, post_w = s.post_doc_ids, s.post_weights
    print("P (postings width):", post_ids.shape, " cap:", cap,
          " nt:", len(trows), " Qt:", tslots.shape[1])

    @jax.jit
    def pre(fslots, fcnt, impact, impact_lo):
        qvec, _ = sidx._densify_queries(fslots, fcnt, K)
        scores = sidx._impact_matmul(qvec, impact, impact_lo, prec)
        tm_s, tm_i = sidx.exact_topk_blockwise(scores, k, block=256,
                                               valid_upto=n_docs)
        return scores, tm_s, tm_i

    _, (scores, topm_s, topm_i) = timed(pre, fslots, fcnt,
                                        s.dense_impact, s.dense_impact_lo)
    scores, topm_s, topm_i = jax.block_until_ready(
        (scores, topm_s, topm_i))
    nt, Qt = tslots.shape
    nq = scores.shape[0]
    D_pad = scores.shape[1]

    def stage(which):
        @jax.jit
        def f(scores, topm_s, topm_i, post_ids, post_w, trows, tslots,
              tqcnt):
            pid = post_ids[tslots]
            pw = post_w[tslots]
            v = tqcnt[:, :, None] * pw
            C = k + Qt * pid.shape[2]
            cc = min(max(cap, k), C)
            cand_ids = jnp.concatenate(
                [topm_i[trows], pid.reshape(nt, -1)], axis=1)
            cand_v = jnp.concatenate(
                [jnp.zeros((nt, k), jnp.float32), v.reshape(nt, -1)],
                axis=1)
            if which == "build":
                return cand_ids, cand_v
            sid, sv = jax.lax.sort((cand_ids, cand_v), dimension=1,
                                   is_stable=True, num_keys=1)
            sid = sid[:, :cc]
            sv = sv[:, :cc]
            stf = (sv > 0).astype(jnp.float32)
            if which == "sort":
                return sid, sv, stf
            from bayesian_bm25_tpu.engine.pallas_gather import row_gather
            sbase = row_gather(scores, sid, trows)
            if which == "gather":
                return sbase
            neg = jnp.full((nt, 1), -1, sid.dtype)
            tail_tot = jnp.zeros_like(sv)
            tf_tot = jnp.zeros_like(stf)
            for d in range(min(Qt, cc - 1), -1, -1):
                if d == 0:
                    same = jnp.ones(sid.shape, bool)
                    sv_d, stf_d = sv, stf
                else:
                    shift_id = jnp.concatenate(
                        [jnp.broadcast_to(neg, (nt, d)), sid[:, :-d]],
                        axis=1)
                    same = shift_id == sid
                    zpad = jnp.zeros((nt, d), jnp.float32)
                    sv_d = jnp.concatenate([zpad, sv[:, :-d]], axis=1)
                    stf_d = jnp.concatenate([zpad, stf[:, :-d]], axis=1)
                tail_tot = tail_tot + jnp.where(same, sv_d, 0.0)
                tf_tot = tf_tot + jnp.where(same, stf_d, 0.0)
            if which == "segsum":
                return tail_tot, tf_tot
            nxt = jnp.concatenate([sid[:, 1:], neg], axis=1)
            is_last = (sid != nxt) & (sid < n_docs)
            total = sbase + tail_tot
            cand_score = jnp.where(is_last, total, -jnp.inf)
            m_scores, m_pos = jax.lax.top_k(cand_score, k)
            m_ids = jnp.take_along_axis(sid, m_pos, axis=1)
            m_tf = jnp.take_along_axis(tf_tot, m_pos, axis=1)
            is_pad_row = tslots[:, 0] >= post_ids.shape[0] - 1
            trow_safe = jnp.where(is_pad_row, nq, trows)
            zi = jnp.zeros((1, k), topm_i.dtype)
            zf = jnp.zeros((1, k), jnp.float32)
            out_ids = jnp.concatenate([topm_i, zi]).at[trow_safe].set(
                m_ids.astype(topm_i.dtype))[:nq]
            out_sc = jnp.concatenate([topm_s, zf]).at[trow_safe].set(
                m_scores)[:nq]
            return out_ids, out_sc, m_tf
        return f

    args = (scores, topm_s, topm_i, post_ids, post_w, trows, tslots,
            tqcnt)
    prev = 0.0
    for which in ("build", "sort", "gather", "segsum", "full"):
        ms, _ = timed(stage(which), *args)
        print(f"{which:7s} cumulative {ms:7.2f} ms  stage {ms-prev:7.2f}",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()

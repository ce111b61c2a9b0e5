"""Stage ablation of the 1M-doc sparse-candidate kernel (mid tier).

The capped-postings mid tier moved 1M-doc serving off the dense
compare tail onto the sparse-candidate kernel; this profiler attributes
the per-chunk cost (1024-query chunks) across jitted prefixes of the
shipped kernel — densify+matmul -> +mid sweep -> +leader select ->
+merge -> full — and A/Bs the >=256k-doc storage tiers (int8 2-pass vs
bf16 1-pass at equal K) on the SAME loaded index. Run on the real TPU
on a quiet host; uses the cached archive from profile_1m_stages.py.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np
import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.engine import split_index as sidx
from bayesian_bm25_tpu.ops import transform as T
from profile_1m_stages import CACHE
from timed import timed


def stage_ablation(scorer, queries, k=10):
    s, idx = scorer._split, scorer._index
    t = scorer._transform
    n_docs = idx.n_docs
    K = s.n_frequent
    prec = scorer._matmul_precision

    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    mid_rows = mid_qids = mid_qcnt = None
    if s.mid_term_ids is not None:
        mr, mq, mc = sidx.build_mid_queries(trows, tqids, tqcnt, s,
                                            fslots.shape[0])
        if mq is not None:
            mid_rows, mid_qids, mid_qcnt = map(jnp.asarray, (mr, mq, mc))
    from bayesian_bm25_tpu.engine import pallas_gather as pg
    use_pg = pg.eligible(s.dense_impact.shape[0], len(trows), masked=False)
    comp, r_max = None, 0
    if sidx.PACKED_BUILD:
        R = s.post_doc_ids.shape[0] - 1
        packed, r_max = sidx.compact_tail_postings(tslots, tqcnt, R)
        if r_max < tslots.shape[1]:
            comp = jnp.asarray(packed)
        else:
            r_max = 0
    print(f"  cap={cap} nt={len(trows)} r_max={r_max} "
          f"pallas_gather={use_pg} "
          f"mid_nm={None if mid_qids is None else tuple(mid_qids.shape)}",
          flush=True)
    fslots, fcnt, trows, tslots, tqcnt = map(
        jnp.asarray, (fslots, fcnt, trows, tslots, tqcnt))

    def prefix(stage):
        @jax.jit
        def f(impact, impact_lo, presence, post_ids, post_w, dl,
              fslots, fcnt, trows, tslots, tqcnt, mrows, mq, mc,
              mid_ids, mid_w):
            qvec, qpres = sidx._densify_queries(fslots, fcnt, K)
            scores = sidx._impact_matmul(qvec, impact, impact_lo, prec,
                                         scale=s.impact_scale)
            if stage == "matmul":
                return scores.max(axis=1)
            if mq is not None:
                m_sc, _ = sidx._compare_table(mid_ids, mid_w, mq, mc)
                scores = scores.at[mrows].add(m_sc)
            if stage == "mid":
                return scores.max(axis=1)
            topm_s, topm_i = sidx.exact_topk_blockwise(
                scores, k, block=256, valid_upto=n_docs)
            if stage == "select":
                return topm_s, topm_i
            out = sidx._sparse_merge(
                scores, topm_s, topm_i, post_ids, post_w, trows, tslots,
                tqcnt, k, cap, n_docs, pallas_gather=use_pg,
                tf_from_sign=s.post_w_positive,
                compact=(None if comp is None else (comp, r_max)))
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
            if mq is not None:
                w_mid = mid_ids[jnp.maximum(out_ids[mrows], 0)]
                cnt = jnp.sum(
                    (w_mid[:, :, :, None] == mq[:, None, None, :])
                    .astype(jnp.float32), axis=(2, 3))
                top_tfs = top_tfs.at[mrows].add(cnt)
            top_dlr = dl[jnp.maximum(out_ids, 0)] / idx.avgdl
            probs = T.score_to_probability(
                out_scores, top_tfs, top_dlr, t.alpha, t.beta, t.base_rate)
            return out_ids, jnp.where(out_scores > 0,
                                      probs.astype(out_scores.dtype), 0.0)
        return f

    args = (s.dense_impact, s.dense_impact_lo, s.dense_presence,
            s.post_doc_ids, s.post_weights, idx.doc_lengths,
            fslots, fcnt, trows, tslots, tqcnt, mid_rows, mid_qids,
            mid_qcnt, s.mid_term_ids, s.mid_weights)
    prev = 0.0
    stages = ("matmul", "mid", "select", "merge", "full")
    if mid_qids is None:
        stages = ("matmul", "select", "merge", "full")
    for stage in stages:
        ms, out = timed(prefix(stage), *args)
        del out  # drop giant intermediates before the next prefix runs
        print(f"  {stage:8s} cumulative {ms:7.2f} ms   "
              f"stage {ms-prev:7.2f} ms", flush=True)
        prev = ms


def steady_state(scorer, queries, rng, label):
    batches = [queries] + [[queries[i] for i in rng.permutation(len(queries))]
                           for _ in range(2)]
    scorer.retrieve_many(batches, k=10)
    t0 = time.perf_counter()
    scorer.retrieve_many(batches, k=10)
    dt = (time.perf_counter() - t0) / len(batches)
    print(f"{label} steady-state: {len(queries)/dt:8.0f} q/s "
          f"({dt/16*1e3:.1f} ms/1024q-chunk)", flush=True)


def main():
    rng = np.random.default_rng(0)
    vocab = 120_000
    from bayesian_bm25_tpu.utils.io import load_scorer
    t0 = time.time()
    scorer = load_scorer(CACHE)
    print(f"load {time.time()-t0:.0f}s", flush=True)
    queries16k = [[f"t{q}" for q in rng.zipf(1.3, size=8) % vocab]
                  for _ in range(16384)]
    chunk = queries16k[:1024]

    # how often does a 1024q chunk carry mid terms?
    s = scorer._split
    n_mid, widths = 0, []
    for i in range(16):
        part = queries16k[i * 1024:(i + 1) * 1024]
        enc = sidx.encode_queries_split(part, s)
        mr, mq, _ = sidx.build_mid_queries(enc[2], enc[3], enc[4], s, 1024)
        n_mid += mq is not None
        if mq is not None:
            widths.append(f"{mq.shape[0]}x{mq.shape[1]}")
    print(f"chunks with mid terms: {n_mid}/16  nm x Qm: {widths}",
          flush=True)

    print("int8 (shipped auto tier) stage ablation, 1024q:", flush=True)
    stage_ablation(scorer, chunk)
    steady_state(scorer, queries16k, rng, "int8")

    # A/B: single-bf16 storage (1-pass matmul, ~3e-3 max rel err) at the
    # same K — rebuilt from the SAME loaded base index.
    t0 = time.time()
    scorer._impact_storage = "bf16"
    scorer._maybe_build_split()
    print(f"rebuild split storage=bf16 {time.time()-t0:.0f}s  "
          f"K={scorer._split.n_frequent}", flush=True)
    print("bf16 stage ablation, 1024q:", flush=True)
    stage_ablation(scorer, chunk)
    steady_state(scorer, queries16k, rng, "bf16")


if __name__ == "__main__":
    main()

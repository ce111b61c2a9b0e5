"""Stage ablation of the 1M-doc sparse-candidate kernel (tier-2 pass).

The width-capped postings design moved 1M-doc serving off the dense
compare tail onto the sparse-candidate kernel; this profiler attributes
the per-chunk cost (1024-query chunks) across jitted prefixes of the
shipped kernel — densify+matmul -> +leader select -> +tier-1 merge ->
+tier-2 merge -> full. Run on the real TPU on a quiet host; uses the
cached archive from profile_1m_stages.py.

History: the first mid-tier design (doc-major compare sweep over the
over-cap terms) measured 99 ms/chunk for the sweep alone — term-major
tier-2 postings replaced it (a mid term has <= ~3.8k postings; the
doc-major sweep scanned all 1M docs x 16 slots per mid row).
int8 vs bf16 storage A/B (measured 2026-08-19 before the redesign):
matmul 17.2 vs 14.2 ms — int8 kept (~20x tighter error for ~3 ms).
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
    (trows, tslots, tqcnt), grpB = sidx.split_tail_groups(
        trows, tqids, tqcnt, s)
    H, capH = None, 0
    if sidx.LIGHT_HEAVY:
        lh = sidx.split_light_heavy(trows, tslots, tqcnt, s, k)
        if lh is not None:
            (trows, tslots, tqcnt), (hrows, hslots, hqcnt) = lh
            capH = sidx.candidate_cap(s, hslots, k)
            compH, r_maxH = None, 0
            if sidx.PACKED_BUILD:
                R = s.post_doc_ids.shape[0] - 1
                packedH, r_maxH = sidx.compact_tail_postings(
                    hslots, hqcnt, R)
                if r_maxH < hslots.shape[1]:
                    compH = jnp.asarray(packedH)
                else:
                    r_maxH = 0
            H = (jnp.asarray(hrows), jnp.asarray(hslots),
                 jnp.asarray(hqcnt), compH, r_maxH)
            print(f"  light/heavy split: ntL={len(trows)} "
                  f"ntH={len(hrows)} capH={capH} r_maxH={r_maxH}",
                  flush=True)
    cap = sidx.candidate_cap(s, tslots, k)
    B, cap2 = None, 0
    if grpB is not None:
        trB, s1B, qcB, s2B, qc2B = grpB
        cap2 = sidx.candidate_cap2(s, s1B, s2B, k)
        B = tuple(map(jnp.asarray, (trB, s1B, qcB, s2B, qc2B)))
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
    print(f"  capA={cap} ntA={len(trows)} r_max={r_max} "
          f"pallas_gather={use_pg} "
          + ("no tier-2 rows" if B is None else
             f"ntB={len(B[0])} Q2={B[3].shape[1]} cap2={cap2}"),
          flush=True)
    fslots, fcnt, trows, tslots, tqcnt = map(
        jnp.asarray, (fslots, fcnt, trows, tslots, tqcnt))

    def prefix(stage):
        @jax.jit
        def f(impact, impact_lo, presence, post_ids, post_w, p2_ids,
              p2_w, dl, fslots, fcnt, trows, tslots, tqcnt, B):
            qvec, qpres = sidx._densify_queries(fslots, fcnt, K)
            scores = sidx._impact_matmul(qvec, impact, impact_lo, prec,
                                         scale=s.impact_scale)
            if stage == "matmul":
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
            if stage == "mergeA":
                return out
            out_ids, out_scores, out_tail_tf = out
            if H is not None:
                hrows, hslots, hqcnt, compH, r_maxH = H
                out_ids, out_scores, out_tail_tf = sidx._sparse_merge(
                    scores, out_scores, out_ids, post_ids, post_w,
                    hrows, hslots, hqcnt, k, capH, n_docs,
                    tf_from_sign=s.post_w_positive,
                    compact=(None if compH is None else (compH, r_maxH)),
                    base_tail_tf=out_tail_tf)
            if stage == "mergeH":
                return out_ids, out_scores, out_tail_tf
            if B is not None:
                trB, s1B, qcB, s2B, qc2B = B
                R2 = p2_ids.shape[0] - 1
                out_ids, out_scores, out_tail_tf = sidx._sparse_merge(
                    scores, out_scores, out_ids, post_ids, post_w,
                    trB, s1B, qcB, k, cap2, n_docs,
                    tf_from_sign=s.post_w_positive,
                    postings2=(p2_ids, p2_w, s2B, qc2B),
                    pad_row_mask=jnp.all(s2B >= R2, axis=1),
                    base_tail_tf=out_tail_tf)
            if stage == "mergeB":
                return out_ids, out_scores, out_tail_tf
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
            s.post_doc_ids, s.post_weights, s.post2_doc_ids,
            s.post2_weights, idx.doc_lengths,
            fslots, fcnt, trows, tslots, tqcnt, B)
    prev = 0.0
    stages = ["matmul", "select", "mergeA"]
    if H is not None:
        stages.append("mergeH")
    if B is not None:
        stages.append("mergeB")
    stages.append("full")
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
        _, grpB = sidx.split_tail_groups(enc[2], enc[3], enc[4], s)
        n_mid += grpB is not None
        if grpB is not None:
            widths.append(f"{grpB[0].shape[0]}x{grpB[3].shape[1]}")
    print(f"chunks with tier-2 rows: {n_mid}/16  ntB x Q2: {widths}",
          flush=True)

    print("int8 (shipped auto tier) stage ablation, 1024q:", flush=True)
    stage_ablation(scorer, chunk)
    steady_state(scorer, queries16k, rng, "int8")


if __name__ == "__main__":
    main()

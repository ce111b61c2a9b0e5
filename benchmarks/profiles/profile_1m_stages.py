"""1M-doc stage ablation of the lean dense-tail kernel + rare-df stats
(is a width-capped postings tier viable?). Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import time

import numpy as np
import jax
import jax.numpy as jnp

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx
from timed import timed


CACHE = "/tmp/bb25_1m_scorer.npz"


def build_scorer():
    """Deterministic 1M-doc synthetic scorer; cached to disk so the TPU
    profiling run skips the ~10-min single-core host build (the archive
    is platform-independent — build on CPU, load on TPU)."""
    t0 = time.time()
    if _os.path.exists(CACHE):
        from bayesian_bm25_tpu.utils.io import load_scorer
        scorer = load_scorer(CACHE)
        print(f"load cached index {time.time()-t0:.0f}s", flush=True)
        return scorer
    rng = np.random.default_rng(0)
    n_docs, doc_len, vocab = 1_000_000, 120, 120_000
    zipf = rng.zipf(1.3, size=(n_docs, doc_len)) % vocab
    corpus = [[f"t{t}" for t in row] for row in zipf]
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    print(f"index {time.time()-t0:.0f}s", flush=True)
    from bayesian_bm25_tpu.utils.io import save_scorer
    save_scorer(CACHE, scorer)
    print(f"cached to {CACHE} {time.time()-t0:.0f}s", flush=True)
    return scorer


def main():
    rng = np.random.default_rng(0)
    vocab = 120_000
    scorer = build_scorer()
    s, idx, k = scorer._split, scorer._index, 10
    t = scorer._transform
    n_real = idx.n_docs

    # --- rare-df stats from the base index (host) -------------------
    import collections
    K = s.n_frequent
    slot_of = np.asarray(s.freq_slot_of_term)
    tid_tab = np.asarray(idx.term_ids)
    flat = tid_tab[tid_tab >= 0]
    df = np.bincount(flat, minlength=len(slot_of))
    rare_mask = slot_of >= K
    rare_df = df[rare_mask]
    rare_df = rare_df[rare_df > 0]
    print(f"rare terms {len(rare_df)}  max df {rare_df.max()}", flush=True)
    for p in (50, 90, 99, 99.9, 99.99):
        print(f"  rare df p{p}: {np.percentile(rare_df, p):.0f}")
    for cap in (512, 1024, 2048, 4096):
        inside = rare_df[rare_df <= cap]
        n_mid = int((rare_df > cap).sum())
        print(f"  P_cap {cap}: postings entries {len(inside)}x{cap} "
              f"rect = {len(inside)*cap/1e6:.0f}M (real {inside.sum()/1e6:.0f}M), "
              f"{n_mid} mid terms left for the compare tail", flush=True)

    # Stage attribution runs at 512 queries: each stage prefix RETURNS
    # its (nq, D_pad) f32 matrix, and at 1M docs a 1024-query output is
    # 4 GB — the prefix programs (input + output live) OOM the 16 GB
    # chip next to the resident index. Per-query stage costs scale
    # linearly; the end-to-end retrieve below still uses the
    # production 1024-query auto-chunk.
    queries = [[f"t{q}" for q in rng.zipf(1.3, size=8) % vocab]
               for _ in range(512)]
    queries_e2e = [[f"t{q}" for q in rng.zipf(1.3, size=8) % vocab]
                   for _ in range(1024)]
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = map(jnp.asarray, enc)
    nt = trows.shape[0]
    print(f"nt {nt} Qt {tqids.shape[1]} T_A {s.tail_term_ids.shape[1]}",
          flush=True)
    prec = scorer._matmul_precision
    Kd = s.dense_impact.shape[1]
    qok = sidx._q_int8_ok(s, np.asarray(fcnt))  # host-side, pre-trace

    def prefix(stage):
        @jax.jit
        def f(impact, impact_lo, presence, tids, tw, dl, fslots, fcnt,
              trows, tqids, tqcnt):
            from bayesian_bm25_tpu.ops import transform as T
            nq = fslots.shape[0]
            qvec, qpres = sidx._densify_queries(fslots, fcnt, Kd)
            scores = sidx._impact_matmul(
                qvec, impact, impact_lo, prec, scale=s.impact_scale,
                q_int8_ok=qok)
            if stage == "matmul":
                return scores
            t_scores, _ = sidx._compare_table(tids, tw, tqids, tqcnt)
            if stage == "compare":
                return t_scores
            scores = scores.at[trows].add(t_scores)
            if stage == "scatter":
                return scores
            top_s, top_i = sidx.exact_topk_blockwise(
                scores, k, block=256, valid_upto=n_real)
            if stage == "select":
                return top_s, top_i
            dead = ~jnp.isfinite(top_s)
            top_s = jnp.where(dead, 0.0, top_s)
            top_i = jnp.where(dead, -1, top_i)
            safe = jnp.maximum(top_i, 0)
            pres_rows = presence[safe]
            tf_freq = jnp.einsum("nkc,nc->nk", pres_rows,
                                 qpres.astype(presence.dtype),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
            Qt = tqids.shape[1]
            is_pad = tqids[:, 0] < 0
            safe_rows = jnp.where(is_pad, nq, trows)
            qt_full = jnp.full((nq + 1, Qt), -2, tqids.dtype).at[
                safe_rows].set(tqids)[:nq]
            w_tail = tids[safe]
            tf_tail = jnp.sum(
                (w_tail[:, :, :, None] == qt_full[:, None, None, :])
                .astype(jnp.float32), axis=(2, 3))
            tfs = tf_freq + tf_tail
            dlr = dl[safe] / idx.avgdl
            probs = T.score_to_probability(top_s, tfs, dlr, t.alpha,
                                           t.beta, t.base_rate)
            return top_i, jnp.where(top_s > 0, probs, 0.0)
        return f

    args = (s.dense_impact, s.dense_impact_lo, s.dense_presence,
            s.tail_term_ids, s.tail_weights, idx.doc_lengths,
            fslots, fcnt, trows, tqids, tqcnt)
    prev = 0.0
    for stage in ("matmul", "compare", "scatter", "select", "full"):
        # release=True: a single (nq, D_pad) f32 stage output is 4 GB
        # at 1M docs — two live copies (prev rep + in-flight) OOM the
        # 16 GB chip.
        ms, out = timed(prefix(stage), *args, reps=3, release=True)
        del out
        print(f"{stage:8s} cumulative {ms:8.2f} ms  stage {ms-prev:8.2f}",
              flush=True)
        prev = ms

    # end-to-end single chunk through the public API
    scorer.retrieve(queries_e2e, k=10)
    t0 = time.perf_counter()
    for _ in range(3):
        scorer.retrieve(queries_e2e, k=10)
    print(f"retrieve() wall          {(time.perf_counter()-t0)/3*1e3:8.2f}"
          " ms/chunk", flush=True)


if __name__ == "__main__":
    main()

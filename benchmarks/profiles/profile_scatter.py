"""Compact-gather + scatter candidate build vs the dense row gather.

Only ~17% of (tail row, slot) positions hold a real rare term; the
dense post_ids[tslots] gather fetches the sentinel row for the rest.
Variant: host compacts the real (row, j) pairs; device gathers (nr, P)
rows and scatters them into the padded (nt*Qt, P) layout.
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
    enc = sidx.encode_queries_split(queries, s)
    fslots, fcnt, trows, tqids, tqcnt = enc
    tslots_np = np.asarray(sidx.map_tail_slots(tqids, s))
    tqcnt_np = np.asarray(tqcnt)
    post_ids, post_w = s.post_doc_ids, s.post_weights
    R1, P = post_ids.shape
    R = R1 - 1
    nt, Qt = tslots_np.shape
    nq = 8192
    D_pad = s.dense_impact.shape[0]
    topm_i = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (nq, 1))
    trows_d = jnp.asarray(trows)
    tslots_d = jnp.asarray(tslots_np)
    tqcnt_d = jnp.asarray(tqcnt_np)

    @jax.jit
    def dense_build(topm_i, post_ids, post_w, trows, tslots, tqcnt):
        pid = post_ids[tslots]
        pw = post_w[tslots]
        v = tqcnt[:, :, None] * pw
        cand_ids = jnp.concatenate(
            [topm_i[trows], pid.reshape(nt, -1)], axis=1)
        cand_v = jnp.concatenate(
            [jnp.zeros((nt, k), jnp.float32), v.reshape(nt, -1)], axis=1)
        return cand_ids, cand_v

    ms, (ri, rv) = timed(dense_build, topm_i, post_ids, post_w, trows_d,
                         tslots_d, tqcnt_d)
    print(f"dense build             {ms:7.2f} ms")

    # host compaction
    rows, js = np.nonzero(tslots_np < R)
    nr_real = len(rows)
    nr = 64
    while nr < nr_real:
        nr *= 2
    flat_slots = np.full(nr, R, np.int32)
    flat_dest = np.full(nr, nt * Qt, np.int32)
    flat_qcnt = np.zeros(nr, np.float32)
    flat_slots[:nr_real] = tslots_np[rows, js]
    flat_dest[:nr_real] = rows * Qt + js
    flat_qcnt[:nr_real] = tqcnt_np[rows, js]
    print(f"nr_real {nr_real}  nr {nr}  (dense gather rows {nt*Qt})")
    fs_d, fd_d, fq_d = map(jnp.asarray, (flat_slots, flat_dest, flat_qcnt))

    @jax.jit
    def compact_build(topm_i, post_ids, post_w, trows, fs, fd, fq):
        g_ids = post_ids[fs]                       # (nr, P)
        g_v = fq[:, None] * post_w[fs]
        pid_flat = jnp.full((nt * Qt + 1, P), D_pad, jnp.int32
                            ).at[fd].set(g_ids, mode="drop")
        v_flat = jnp.zeros((nt * Qt + 1, P), jnp.float32
                           ).at[fd].set(g_v, mode="drop")
        cand_ids = jnp.concatenate(
            [topm_i[trows], pid_flat[:nt * Qt].reshape(nt, -1)], axis=1)
        cand_v = jnp.concatenate(
            [jnp.zeros((nt, k), jnp.float32),
             v_flat[:nt * Qt].reshape(nt, -1)], axis=1)
        return cand_ids, cand_v

    ms, (ci, cv) = timed(compact_build, topm_i, post_ids, post_w,
                         trows_d, fs_d, fd_d, fq_d)
    oki = bool(jnp.all(ci == ri)) and bool(jnp.all(cv == rv))
    print(f"compact gather+scatter  {ms:7.2f} ms   match={oki}")

    # gather-only (how much is the scatter?)
    @jax.jit
    def gonly(post_ids, post_w, fs, fq):
        return post_ids[fs], fq[:, None] * post_w[fs]

    ms, _ = timed(gonly, post_ids, post_w, fs_d, fq_d)
    print(f"compact gather only     {ms:7.2f} ms")

    # Full-kernel A/B through the library entry point.
    enc_d = tuple(map(jnp.asarray, (fslots, fcnt, trows, tslots_np,
                                    tqcnt)))
    cap = sidx.candidate_cap(s, tslots_np, k)
    pk, r_max = sidx.compact_tail_postings(tslots_np,
                                           np.asarray(tqcnt), R)
    flat_d = jnp.asarray(pk)
    print(f"r_max {r_max}  Qt {Qt}  cap {cap}")
    common = (s.dense_impact, s.dense_presence, post_ids, post_w,
              idx.doc_lengths, idx.avgdl, *enc_d, k, cap, 1.0, 2.0, 0.05)
    kw = dict(n_docs=idx.n_docs, impact_lo=s.dense_impact_lo,
              tf_from_sign=s.post_w_positive)
    packed = {"compact": flat_d, "compact_rmax": r_max}
    ref = None
    for name, extra in (("dense", {}), ("packed", packed),
                        ("dense2", {}), ("packed2", packed)):
        ms, out = timed(sidx.retrieve_topk_split_sparse, *common,
                        **kw, **extra)
        if ref is None:
            ref = [np.asarray(o) for o in out]
            okmsg = ""
        else:
            ok = all((np.asarray(o) == r).all() for o, r in zip(out, ref))
            okmsg = f"  match={ok}"
        print(f"full kernel {name:9s} {ms:7.2f} ms{okmsg}")


if __name__ == "__main__":
    main()

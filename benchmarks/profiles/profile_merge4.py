"""Merge-stage experiments round 5: wider-row candidate build + sort keys.

Two hypotheses against the shipped sparse-merge candidate build and
sort (engine/split_index.py:_sparse_merge, compact path):

1. **Interleaved postings table (one wide gather).** The compact build
   issues TWO row gathers over the same ``flat_slots`` — ids from the
   (R+1, P) int32 table and weights from the (R+1, P) float32 table.
   The row gather is latency-bound (~830 ns/row, profile_scatter.py),
   so fetch count, not bytes, is the cost: an interleaved (R+1, 2P)
   int32 table (ids ++ f32-bitcast weights) halves the number of
   gathered rows for ~0 extra bytes. Same trick for the two scatters
   into the (nt*r_max, P) packed layout (one (nr, 2P) scatter).

2. **Unique packed sort key (unstable).** profile_merge3.py's packed
   single-key sort lost 10x because of the take_along_axis value
   re-gather. This variant keeps the value array as a co-sorted
   OPERAND (2 operands either way) but replaces the stable id-key sort
   with an UNSTABLE sort on the unique key id*W + col — stability is
   what the shipped sort pays for (it is what makes downstream float
   summation order reproducible), and the unique key provides it for
   free.

Both are checked bit-identical against the shipped build/sort before
timing. Run on the real TPU at the 50k-doc serving shapes.
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
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(corpus, show_progress=False)
    s = scorer._split
    idx = scorer._index
    fslots, fcnt, trows, tqids, tqcnt = sidx.encode_queries_split(
        queries, s)
    tslots = sidx.map_tail_slots(tqids, s)
    cap = sidx.candidate_cap(s, tslots, k)
    R = s.post_doc_ids.shape[0] - 1
    packed, r_max = sidx.compact_tail_postings(tslots, tqcnt, R)
    nt, Qt = tslots.shape
    P = s.post_doc_ids.shape[1]
    nr = packed.shape[1]
    D_pad = s.dense_impact.shape[0]
    print(f"nt={nt} Qt={Qt} r_max={r_max} nr={nr} P={P} cap={cap}",
          flush=True)

    flat_slots = jnp.asarray(packed[0])
    flat_dest = jnp.asarray(packed[1])
    flat_qcnt = jnp.asarray(packed[2])
    post_ids, post_w = s.post_doc_ids, s.post_weights
    # Interleaved table: ids ++ f32 weights bitcast to i32, one row per
    # term. Built host-side once at index time in a real deployment.
    inter = jnp.concatenate(
        [post_ids.astype(jnp.int32),
         jax.lax.bitcast_convert_type(
             post_w.astype(jnp.float32), jnp.int32)], axis=1)

    # ---------------- Experiment 1: candidate build ----------------
    @jax.jit
    def build_shipped(post_ids, post_w, flat_slots, flat_dest, flat_qcnt):
        qc = flat_qcnt.astype(jnp.float32)
        g_ids = post_ids[flat_slots]
        g_v = qc[:, None] * post_w[flat_slots]
        pid = jnp.full((nt * r_max + 1, P), D_pad, post_ids.dtype).at[
            flat_dest].set(g_ids, mode="drop")[:nt * r_max].reshape(
            nt, r_max, P)
        v = jnp.zeros((nt * r_max + 1, P), jnp.float32).at[
            flat_dest].set(g_v, mode="drop")[:nt * r_max].reshape(
            nt, r_max, P)
        return pid, v

    @jax.jit
    def build_inter(inter, flat_slots, flat_dest, flat_qcnt):
        qc = flat_qcnt.astype(jnp.float32)
        g = inter[flat_slots]                                 # (nr, 2P)
        g_ids = g[:, :P]
        g_w = jax.lax.bitcast_convert_type(g[:, P:], jnp.float32)
        g_v = qc[:, None] * g_w
        pid = jnp.full((nt * r_max + 1, P), D_pad, jnp.int32).at[
            flat_dest].set(g_ids, mode="drop")[:nt * r_max].reshape(
            nt, r_max, P)
        v = jnp.zeros((nt * r_max + 1, P), jnp.float32).at[
            flat_dest].set(g_v, mode="drop")[:nt * r_max].reshape(
            nt, r_max, P)
        return pid, v

    @jax.jit
    def build_inter2(inter, flat_slots, flat_dest, flat_qcnt):
        # one gather AND one scatter (ids ++ bitcast(v) in one buffer)
        qc = flat_qcnt.astype(jnp.float32)
        g = inter[flat_slots]
        g_ids = g[:, :P]
        g_w = jax.lax.bitcast_convert_type(g[:, P:], jnp.float32)
        g_v = qc[:, None] * g_w
        both = jnp.concatenate(
            [g_ids, jax.lax.bitcast_convert_type(g_v, jnp.int32)], axis=1)
        sentinel = jnp.concatenate(
            [jnp.full((1, P), D_pad, jnp.int32),
             jnp.zeros((1, P), jnp.int32)], axis=1)
        buf = jnp.broadcast_to(sentinel, (nt * r_max + 1, 2 * P)).at[
            flat_dest].set(both, mode="drop")[:nt * r_max]
        pid = buf[:, :P].reshape(nt, r_max, P)
        v = jax.lax.bitcast_convert_type(
            buf[:, P:], jnp.float32).reshape(nt, r_max, P)
        return pid, v

    a = jax.block_until_ready(
        build_shipped(post_ids, post_w, flat_slots, flat_dest, flat_qcnt))
    for name, got in (("inter", build_inter(inter, flat_slots, flat_dest,
                                            flat_qcnt)),
                      ("inter2", build_inter2(inter, flat_slots, flat_dest,
                                              flat_qcnt))):
        got = jax.block_until_ready(got)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(got[1]))
    print("build bit-parity: OK", flush=True)

    for name, fn, args in (
            ("build shipped 2g+2s", build_shipped,
             (post_ids, post_w, flat_slots, flat_dest, flat_qcnt)),
            ("build inter  1g+2s", build_inter,
             (inter, flat_slots, flat_dest, flat_qcnt)),
            ("build inter2 1g+1s", build_inter2,
             (inter, flat_slots, flat_dest, flat_qcnt)),
            ("build shipped #2", build_shipped,
             (post_ids, post_w, flat_slots, flat_dest, flat_qcnt)),
            ("build inter  #2", build_inter,
             (inter, flat_slots, flat_dest, flat_qcnt)),
            ("build inter2 #2", build_inter2,
             (inter, flat_slots, flat_dest, flat_qcnt)),
    ):
        ms, _ = timed(fn, *args)
        print(f"{name:22s} {ms:7.2f} ms", flush=True)

    # ---------------- Experiment 2: sort keys ----------------
    # Candidates at the packed width, as _sparse_merge builds them.
    @jax.jit
    def pre(fslots, fcnt, imp, lo, post_ids, post_w,
            flat_slots, flat_dest, flat_qcnt):
        qvec, _ = sidx._densify_queries(fslots, fcnt, s.n_frequent)
        scores = sidx._impact_matmul(qvec, imp, lo,
                                     scorer._matmul_precision,
                                     scale=s.impact_scale)
        tm_s, tm_i = sidx.exact_topk_blockwise(scores, k, block=256,
                                               valid_upto=idx.n_docs)
        pid, v = build_shipped(post_ids, post_w, flat_slots, flat_dest,
                               flat_qcnt)
        cand_ids = jnp.concatenate(
            [tm_i[trows], pid.reshape(nt, -1)], axis=1)
        cand_v = jnp.concatenate(
            [jnp.zeros((nt, k), jnp.float32), v.reshape(nt, -1)], axis=1)
        return cand_ids, cand_v

    cand_ids, cand_v = jax.block_until_ready(pre(
        jnp.asarray(fslots), jnp.asarray(fcnt), s.dense_impact,
        s.dense_impact_lo, post_ids, post_w, flat_slots, flat_dest,
        flat_qcnt))
    C = cand_ids.shape[1]
    cc = min(max(cap, k), C)
    W = 1 << int(np.ceil(np.log2(C)))
    print(f"C={C} cc={cc} W={W} (key bits {int(np.ceil(np.log2(D_pad)))}"
          f"+{int(np.log2(W))})", flush=True)

    @jax.jit
    def sort_shipped(cand_ids, cand_v):
        sid, sv = jax.lax.sort((cand_ids, cand_v), dimension=1,
                               is_stable=True, num_keys=1)
        return sid[:, :cc], sv[:, :cc]

    @jax.jit
    def sort_unique(cand_ids, cand_v):
        col = jnp.arange(C, dtype=jnp.int32)[None, :]
        key = cand_ids.astype(jnp.int32) * W + col
        skey, sv = jax.lax.sort((key, cand_v), dimension=1,
                                is_stable=False, num_keys=1)
        return (skey // W)[:, :cc], sv[:, :cc]

    a = jax.block_until_ready(sort_shipped(cand_ids, cand_v))
    b = jax.block_until_ready(sort_unique(cand_ids, cand_v))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    print("sort bit-parity: OK", flush=True)

    for name, fn in (("sort stable-id  ", sort_shipped),
                     ("sort unique-key ", sort_unique),
                     ("sort stable-id#2", sort_shipped),
                     ("sort unique-key#2", sort_unique)):
        ms, _ = timed(fn, cand_ids, cand_v)
        print(f"{name:18s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

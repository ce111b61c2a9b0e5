"""Pallas one-hot MXU row-gather (engine/pallas_gather.py).

On the CPU test backend the kernel runs in interpret mode — the same
kernel body the TPU executes — so these tests pin the semantics the
on-device path relies on: bit-identical gathers for valid ids, literal
0.0 for the D_pad sentinel, and end-to-end equality of the sparse
retrieval kernel with the gather swapped in."""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesian_bm25_tpu.engine import pallas_gather as pg


class TestRowGather:
    def test_matches_fancy_gather_bitwise(self):
        rng = np.random.default_rng(0)
        nq, d_pad, nt, cap = 16, 256, 8, 10
        scores = jnp.asarray(
            rng.standard_normal((nq, d_pad)).astype(np.float32) * 100.0)
        sid = jnp.asarray(rng.integers(0, d_pad, (nt, cap)).astype(np.int32))
        trows = jnp.asarray(
            rng.integers(0, nq, (nt,)).astype(np.int32))
        got = pg.row_gather(scores, sid, trows)
        want = scores[trows[:, None], sid]
        assert got.dtype == jnp.float32
        assert bool(jnp.all(got == want))

    def test_sentinel_ids_gather_zero(self):
        rng = np.random.default_rng(1)
        nq, d_pad, nt, cap = 4, 128, 4, 6
        scores = jnp.asarray(
            rng.standard_normal((nq, d_pad)).astype(np.float32) + 5.0)
        sid_np = rng.integers(0, d_pad, (nt, cap)).astype(np.int32)
        sid_np[:, -2:] = d_pad  # sentinel: one past the last column
        trows = jnp.arange(nt, dtype=jnp.int32)
        got = np.asarray(pg.row_gather(scores, jnp.asarray(sid_np), trows))
        assert np.all(got[:, -2:] == 0.0)
        want = np.asarray(scores)[np.arange(nt)[:, None], sid_np[:, :-2]]
        assert np.array_equal(got[:, :-2], want)

    def test_extreme_magnitudes_exact(self):
        # The 3-way bf16 split reassembles any f32 in the documented
        # domain (|x| in [2^-110, ~3.38e38] or zero) exactly.
        vals = np.array([2.0**-110, -(2.0**-100), 1e38, -1e38,
                         1.0 + 2**-23, np.pi, -np.e, 0.0, -0.0, 65504.0,
                         2.0**-90, 123456.789, -0.1, 7.0, 1e30, -1e-30],
                        dtype=np.float32)
        scores = jnp.asarray(np.tile(vals, (2, 8)))          # (2, 128)
        sid = jnp.asarray(
            np.arange(128, dtype=np.int32).reshape(1, 128))
        trows = jnp.zeros((1,), jnp.int32)
        got = np.asarray(pg.row_gather(scores, sid, trows))
        assert np.array_equal(got[0], np.asarray(scores)[0])

    def test_duplicate_and_repeated_rows(self):
        rng = np.random.default_rng(2)
        nq, d_pad, nt, cap = 3, 384, 9, 12
        scores = jnp.asarray(
            rng.standard_normal((nq, d_pad)).astype(np.float32))
        sid_np = np.sort(
            rng.integers(0, d_pad, (nt, cap)).astype(np.int32), axis=1)
        sid_np[:, :3] = sid_np[:, :1]  # duplicated ids within a row
        trows_np = (np.arange(nt) % nq).astype(np.int32)  # repeated rows
        got = pg.row_gather(scores, jnp.asarray(sid_np),
                            jnp.asarray(trows_np))
        want = scores[jnp.asarray(trows_np)[:, None], jnp.asarray(sid_np)]
        assert bool(jnp.all(got == want))


class TestEligibility:
    def test_gates(self):
        assert pg.eligible(51200, 4096)
        assert not pg.eligible(51200, 4096, masked=True)
        assert not pg.eligible(51200, 8)          # too few tail rows
        assert not pg.eligible(100, 4096)         # not lane-aligned
        assert not pg.eligible((1 << 18) + 128, 4096)  # VMEM bound


class TestSparseKernelWithPallasGather:
    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(7)
        vocab = [f"t{i}" for i in range(300)]
        docs = [list(rng.choice(vocab, size=rng.integers(3, 30)))
                for _ in range(500)]
        queries = [list(rng.choice(vocab, size=rng.integers(1, 6)))
                   for _ in range(96)]
        return docs, queries

    def test_end_to_end_equality(self, corpus):
        from bayesian_bm25_tpu.engine import index as eidx
        from bayesian_bm25_tpu.engine import split_index as sidx

        docs, queries = corpus
        idx = eidx.build_index(docs)
        split = sidx.build_split_index(idx, n_frequent=64)
        if split.post_doc_ids is None:
            pytest.skip("corpus produced no rare postings")
        k = 10
        enc = sidx.encode_queries_split(queries, split)
        fslots, fcnt, trows, tqids, tqcnt = enc
        tslots = sidx.map_tail_slots(tqids, split)
        cap = sidx.candidate_cap(split, tslots, k)
        common = (split.dense_impact, split.dense_presence,
                  split.post_doc_ids, split.post_weights,
                  idx.doc_lengths, idx.avgdl,
                  jnp.asarray(fslots), jnp.asarray(fcnt),
                  jnp.asarray(trows), jnp.asarray(tslots),
                  jnp.asarray(tqcnt), k, cap, 1.0, 2.0, None)
        kw = dict(n_docs=idx.n_docs, impact_lo=split.dense_impact_lo)
        ids0, p0, s0, tf0 = sidx.retrieve_topk_split_sparse(
            *common, **kw, pallas_gather=False)
        ids1, p1, s1, tf1 = sidx.retrieve_topk_split_sparse(
            *common, **kw, pallas_gather=True)
        assert np.array_equal(np.asarray(ids0), np.asarray(ids1))
        assert np.array_equal(np.asarray(s0), np.asarray(s1))
        assert np.array_equal(np.asarray(tf0), np.asarray(tf1))
        assert np.array_equal(np.asarray(p0), np.asarray(p1))

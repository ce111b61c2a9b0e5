"""Fused Pallas matmul+block-max (engine/pallas_matmul.py): bit-parity
with the unfused _impact_matmul + pallas_reduce.block_max pair on every
supported storage mode, and end-to-end sparse-kernel equality. Runs in
interpret mode on CPU (same code path as the TPU kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.engine import pallas_matmul as pm
from bayesian_bm25_tpu.engine import pallas_reduce as pr
from bayesian_bm25_tpu.engine import split_index as sidx


def _mats(rng, D=2048, K=128, storage="hilo"):
    w = rng.gamma(2.0, 2.0, (D, K)).astype(np.float32)
    w[rng.random((D, K)) < 0.85] = 0.0  # sparse like a real impact
    if storage == "hilo":
        hi = jnp.asarray(w, jnp.bfloat16)
        lo = jnp.asarray(w - np.asarray(hi, np.float32), jnp.bfloat16)
        return jnp.asarray(w), hi, lo, None
    if storage == "int8":
        amax = np.abs(w).max(axis=1)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = w / s[:, None]
        hi = np.clip(np.rint(q), -127, 127)
        resid = (q - hi) * s[:, None]
        rmax = np.abs(resid).max(axis=1)
        s2 = np.where(rmax > 0, rmax / 127.0, 1.0).astype(np.float32)
        lo = np.clip(np.rint(resid / s2[:, None]), -127, 127)
        return (jnp.asarray(w), jnp.asarray(hi.astype(np.int8)),
                jnp.asarray(lo.astype(np.int8)),
                jnp.asarray(np.stack([s, s2])))
    return jnp.asarray(w), jnp.asarray(w, jnp.bfloat16), None, None


@pytest.mark.parametrize("storage", ["hilo", "int8", "bf16"])
def test_bit_parity_with_unfused(storage):
    rng = np.random.default_rng(5)
    nq, D, K = 256, 2048, 128
    _, hi, lo, scale = _mats(rng, D, K, storage)
    qvec = jnp.asarray(
        rng.integers(0, 4, (nq, K)).astype(np.float32))
    n_docs = D - 700  # exercises the validity mask in the epilogue

    scores_f, bmax_f = pm.impact_matmul_bmax(qvec, hi, lo, scale, n_docs)
    scores_u = sidx._impact_matmul(
        qvec, hi, lo, jax.lax.Precision.HIGHEST, scale=scale)
    bmax_u = pr.block_max(scores_u, 256, valid_upto=n_docs)
    if storage == "int8":
        # int8's scale epilogue (s0*hidot + s1*lodot) may round through
        # an fma on one side and mul+add on the other — last-ulp class;
        # the integer dots themselves are exact on both paths.
        np.testing.assert_allclose(np.asarray(scores_f),
                                   np.asarray(scores_u), rtol=3e-7)
        np.testing.assert_allclose(
            np.asarray(bmax_f), np.asarray(bmax_u), rtol=3e-7)
    else:
        np.testing.assert_array_equal(np.asarray(scores_f),
                                      np.asarray(scores_u))
        np.testing.assert_array_equal(np.asarray(bmax_f),
                                      np.asarray(bmax_u))


def test_eligibility_rules():
    assert pm.eligible(256, 128, 2048, 256)
    assert not pm.eligible(255, 128, 2048, 256)   # nq not tile-aligned
    assert not pm.eligible(256, 128, 2048, 128)   # other block size
    assert not pm.eligible(256, 128, 1024, 256)   # G not 8-aligned
    assert not pm.eligible(256, 130, 2048, 256)   # K not lane-aligned
    assert not pm.eligible(256, 1 << 14, 2048, 256)  # VMEM blow-up


def test_single_f32_rejected():
    rng = np.random.default_rng(0)
    w, _, _, _ = _mats(rng, 2048, 128, "hilo")
    q = jnp.zeros((256, 128), jnp.float32)
    with pytest.raises(ValueError):
        pm.impact_matmul_bmax(q, w, None, None, 2048)


class TestSparseKernelFused:
    def test_end_to_end_equal(self):
        """retrieve_topk_split_sparse(fused_mm=True) must be bit-equal
        to the unfused kernel (hilo storage; shapes eligibility-padded
        via a scorer-sized corpus is too slow in interpret mode, so the
        kernel operands are driven directly)."""
        rng = np.random.default_rng(9)
        corpus = [[f"t{t}" for t in rng.zipf(1.35, size=40) % 1200]
                  for _ in range(1200)]
        from bayesian_bm25_tpu.engine import index as eidx
        idx = eidx.build_index(corpus)
        split = sidx.build_split_index(idx, n_frequent=128,
                                       storage="hilo")
        if split.post_doc_ids is None:
            pytest.skip("no rare postings")
        queries = [[f"t{t}" for t in rng.zipf(1.35, size=5) % 1200]
                   for _ in range(14)] + [[], ["t1199"]]
        # pad the query axis to the fused tile height
        queries += [[]] * (256 - len(queries))
        enc = sidx.encode_queries_split(queries, split)
        fslots, fcnt, trows, tqids, tqcnt = enc
        tslots = sidx.map_tail_slots(tqids, split)
        cap = sidx.candidate_cap(split, tslots, 7)
        D_pad, K = split.dense_impact.shape
        assert pm.eligible(fslots.shape[0], K, D_pad, 256)
        common = (split.dense_impact, split.dense_presence,
                  split.post_doc_ids, split.post_weights,
                  idx.doc_lengths, idx.avgdl,
                  jnp.asarray(fslots), jnp.asarray(fcnt),
                  jnp.asarray(trows), jnp.asarray(tslots),
                  jnp.asarray(tqcnt), 7, cap, 1.0, 2.0, 0.05)
        kw = dict(n_docs=idx.n_docs, impact_lo=split.dense_impact_lo,
                  tf_from_sign=split.post_w_positive)
        base = sidx.retrieve_topk_split_sparse(*common, **kw)
        fused = sidx.retrieve_topk_split_sparse(*common, **kw,
                                                fused_mm=True)
        for a, b in zip(base, fused):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

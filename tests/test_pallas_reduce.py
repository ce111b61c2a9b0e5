"""Pallas stripe block-max: parity with the XLA reshape-max and with
``lax.top_k`` through ``exact_topk_blockwise`` (interpret mode on CPU
drives the identical kernel code path the TPU runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.engine import pallas_reduce as pr
from bayesian_bm25_tpu.engine import split_index as sidx


@pytest.fixture(scope="module")
def scores():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.normal(size=(32, 2048)).astype(np.float32))


class TestBlockMax:
    def test_eligibility(self):
        assert pr.eligible(32, 2048, 256)
        assert not pr.eligible(7, 2048, 256)      # nq % 8 != 0
        assert not pr.eligible(32, 2304, 256) or 2304 % 256 == 0
        assert not pr.eligible(32, 2048, 100)     # block % 128 != 0
        assert not pr.eligible(16, 4 << 20, 256)  # stripe over VMEM

    def test_matches_xla_reshape_max(self, scores):
        nq, d = scores.shape
        b = 256
        ref = scores.reshape(nq, d // b, b).max(axis=2)
        out = pr.block_max(scores, b)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("vu", [2048, 2000, 1792, 300, 1])
    def test_valid_upto_masks_in_kernel(self, scores, vu):
        nq, d = scores.shape
        b = 256
        masked = jnp.where(jnp.arange(d)[None] < vu, scores, -jnp.inf)
        ref = masked.reshape(nq, d // b, b).max(axis=2)
        out = pr.block_max(scores, b, valid_upto=vu)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_neg_inf_entries_pass_through(self, scores):
        s2 = scores.at[:, ::3].set(-jnp.inf)
        b = 256
        nq, d = s2.shape
        ref = s2.reshape(nq, d // b, b).max(axis=2)
        out = pr.block_max(s2, b)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestBlockwiseTopkPallasPath:
    @pytest.mark.parametrize("vu", [2048, 2000, 1792, 300])
    def test_topk_matches_lax(self, scores, vu):
        k = min(5, vu)
        rv, ri = jax.lax.top_k(scores[:, :vu], k)
        bv, bi = sidx.exact_topk_blockwise(scores, k, block=256,
                                           valid_upto=vu)
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))

    def test_with_doc_mask_neg_inf(self, scores):
        s2 = scores.at[:, ::3].set(-jnp.inf)
        rv, ri = jax.lax.top_k(s2[:, :2000], 5)
        bv, bi = sidx.exact_topk_blockwise(s2, 5, block=256,
                                           valid_upto=2000)
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))

    def test_ineligible_shape_falls_back(self):
        rng = np.random.default_rng(5)
        s3 = jnp.asarray(rng.normal(size=(7, 1024)).astype(np.float32))
        rv, ri = jax.lax.top_k(s3[:, :1000], 3)
        bv, bi = sidx.exact_topk_blockwise(s3, 3, block=256,
                                           valid_upto=1000)
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))

    def test_tie_break_prefers_lower_id(self):
        s = jnp.zeros((8, 1024), jnp.float32)
        s = s.at[:, [3, 700, 900]].set(1.0)
        bv, bi = sidx.exact_topk_blockwise(s, 4, block=256,
                                           valid_upto=1000)
        rv, ri = jax.lax.top_k(s[:, :1000], 4)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))


class TestBlockMax2DGrid:
    """Large-D shapes route to the 2-D (row-block, column-chunk) grid
    variant with transposed output; parity must hold there too."""

    def test_routes_to_2d(self):
        nq, d, b = 128, 1 << 19, 256
        assert pr._stripe_rows(nq, d) == 0
        assert pr._grid2d_ok(nq, d, b)
        assert pr.eligible(nq, d, b)

    def test_parity_with_mask(self):
        rng = np.random.default_rng(9)
        nq, d, b = 128, 1 << 19, 256
        s = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
        vu = d - 777
        masked = jnp.where(jnp.arange(d)[None] < vu, s, -jnp.inf)
        ref = masked.reshape(nq, d // b, b).max(axis=2)
        out = pr.block_max(s, b, valid_upto=vu)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_topk_through_blockwise(self):
        rng = np.random.default_rng(10)
        nq, d, b = 128, 1 << 19, 256
        s = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
        vu = d - 100
        rv, ri = jax.lax.top_k(s[:, :vu], 4)
        bv, bi = sidx.exact_topk_blockwise(s, 4, block=b, valid_upto=vu)
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ri))

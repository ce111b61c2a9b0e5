"""Iterative Pallas top-k prototype (engine/pallas_topk.py).

Interpret mode on CPU drives the same kernel code the TPU runs. The
contract is bit-parity with ``lax.top_k`` in values AND positions —
including tie order (equal values emit in ascending index order) and
rows with fewer than k finite entries (the taken-mask steps through
-inf entries in index order, never repeating a position).

Status: measured on v5e 2026-08-19 at (8192, 2560) k=10 — 5.9 ms vs
lax.top_k's 6.3 standalone, but NO net win inside the retrieval kernel
(the final top-k is ~0.6 ms in-stream; the stage cost was dispatch
latency). Kept as an A/B-able prototype like split_index.FUSED_MM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.engine import pallas_topk as pt


def _check(x, k):
    v, p = pt.topk(jnp.asarray(x), k)
    rv, rp = jax.lax.top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(rp))


class TestPallasTopk:
    def test_random_parity(self):
        rng = np.random.default_rng(0)
        for nq, c, k in ((32, 256, 10), (64, 2560, 10), (8, 128, 5)):
            assert pt.eligible(nq, c, k)
            _check(rng.standard_normal((nq, c)).astype(np.float32), k)

    def test_tie_order_matches_lax(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 4, (16, 256)).astype(np.float32)  # many ties
        _check(x, 10)

    def test_rows_with_few_finite_entries(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((16, 256)).astype(np.float32)
        x[0, :] = -np.inf                 # all -inf
        x[1, : 256 - 3] = -np.inf         # 3 finite < k
        x[2, :5] = 2.0                    # leading tie group
        _check(x, 10)
        # explicitly: no duplicate positions even on the all--inf row
        _, p = pt.topk(jnp.asarray(x), 10)
        assert len(set(np.asarray(p)[0].tolist())) == 10

    def test_eligibility_gates(self):
        assert not pt.eligible(32, 250, 10)   # width not lane-aligned
        assert not pt.eligible(32, 256, 65)   # k too large
        assert not pt.eligible(33, 256, 10)   # no stripe divides 33

    def test_matches_selection_tail_usage(self):
        """The shape class the retrieval kernel's tail would use:
        (nq, k*block) candidates with -inf pad re-masking."""
        rng = np.random.default_rng(3)
        nq, c, k = 64, 2560, 10
        x = rng.gamma(2.0, 2.0, (nq, c)).astype(np.float32)
        ids = np.tile(np.arange(c)[None], (nq, 1))
        x = np.where(ids < 2400, x, -np.inf).astype(np.float32)
        _check(x, k)

"""Sharded tier-2 + light/heavy: the distributed sparse kernel runs the
same multi-pass merge as single-chip at width-capped scale.

Round-4 closed the single-chip tier-2/light-heavy story but the sharded
kernel refused width-capped postings and fell back to the slow
doc-major tail compare exactly at the >=1M-doc scale where sharding
matters. These tests pin the closed gap on an 8-way virtual CPU mesh:
a width-capped build (budget monkeypatched small so an 800-doc corpus
exercises the tier) must take the sharded sparse-candidate path — NOT
the fallback — and agree with the single-chip scorer on ids exactly
and probabilities to float tolerance, with and without the light/heavy
split and doc masks. Mirrors tests/test_mid_tier.py single-chip
protocol; ref intent: scorer.py:525-529 retrieve parity + SURVEY
§5.8/§7.8 first-class sharding.
"""

import numpy as np
import pytest

import jax

from bayesian_bm25_tpu import BayesianBM25Scorer, ShardedBayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _corpus(seed=0, D=800, V=900, L=80):
    rng = np.random.default_rng(seed)
    return [[f"t{t}" for t in rng.zipf(1.25, size=L) % V] for _ in range(D)]


def _queries(seed=1, n=40, V=900):
    rng = np.random.default_rng(seed)
    qs = [[f"t{t}" for t in rng.zipf(1.3, size=6) % V] for _ in range(n)]
    # edge rows: duplicate tokens, OOV, empty, single rare term
    return qs + [["t1", "t1", "t2"], ["zzz-oov"], [], [f"t{V - 1}"]]


def _patch(monkeypatch, budget, light_heavy=False):
    monkeypatch.setattr(BayesianBM25Scorer, "_SPLIT_BUDGET_BYTES", 2_000_000)
    monkeypatch.setattr(sidx, "_POSTINGS_MAX_ENTRIES", budget)
    monkeypatch.setattr(sidx, "LIGHT_HEAVY", light_heavy)
    if light_heavy:
        monkeypatch.setattr(sidx, "_LH_MIN_SAVE", 0)
        monkeypatch.setattr(sidx, "_LH_MIN_RATIO", 1.0)


def _build_pair(budget):
    single = BayesianBM25Scorer(base_rate=0.01)
    single.index(_corpus(), show_progress=False)
    shard = ShardedBayesianBM25Scorer(base_rate=0.01, n_devices=8)
    shard.index(_corpus(), show_progress=False)
    return single, shard


class TestShardedTier2:
    def test_capped_takes_sparse_path(self, monkeypatch):
        _patch(monkeypatch, 20000)
        _, shard = _build_pair(20000)
        s = shard._split
        assert s.post2_doc_ids is not None, "cap did not engage"
        assert shard._post_sh is not None, \
            "sharded kernel fell back off the sparse path"
        assert shard._post2_sh is not None, "tier-2 tables not sharded"
        # per-shard tier-2 tables honor the row count of the global one
        assert shard._post2_sh[0].shape[1] == s.post2_doc_ids.shape[0]

    def test_capped_matches_single_chip(self, monkeypatch):
        _patch(monkeypatch, 20000)
        single, shard = _build_pair(20000)
        qs = _queries()
        # group B must be non-empty for at least one batch or the pass
        # under test never runs
        enc = shard._encode_split(qs)
        tslots = None
        (_, tslots, _), grpB = sidx.split_tail_groups(
            enc[2], enc[3], enc[4], shard._split)
        assert grpB is not None, "no tier-2 rows in the test batch"
        i1, p1 = single.retrieve(qs, k=10)
        i2, p2 = shard.retrieve(qs, k=10)
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=1e-6)

    def test_capped_light_heavy_matches(self, monkeypatch):
        _patch(monkeypatch, 20000, light_heavy=True)
        single, shard = _build_pair(20000)
        qs = _queries()
        enc = shard._encode_split(qs)
        (tr, ts, tc), grpB = sidx.split_tail_groups(
            enc[2], enc[3], enc[4], shard._split)
        assert grpB is not None
        assert sidx.split_light_heavy(tr, ts, tc, shard._split, 10) \
            is not None, "light/heavy did not engage"
        i1, p1 = single.retrieve(qs, k=10)
        i2, p2 = shard.retrieve(qs, k=10)
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=1e-6)

    def test_capped_with_doc_mask(self, monkeypatch):
        _patch(monkeypatch, 20000, light_heavy=True)
        single, shard = _build_pair(20000)
        qs = _queries()
        rng = np.random.default_rng(3)
        mask = rng.random(single.num_docs) > 0.3
        i1, p1 = single.retrieve(qs, k=10, doc_mask=mask)
        i2, p2 = shard.retrieve(qs, k=10, doc_mask=mask)
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=1e-6)

    def test_capped_explain_tf_parity(self, monkeypatch):
        _patch(monkeypatch, 20000)
        single, shard = _build_pair(20000)
        qs = _queries()[:12]
        e1 = single.retrieve(qs, k=5, explain=True)
        e2 = shard.retrieve(qs, k=5, explain=True)
        np.testing.assert_array_equal(e2.doc_ids, e1.doc_ids)
        for row1, row2 in zip(e1.explanations, e2.explanations):
            for t1, t2 in zip(row1, row2):
                if t1 is None:
                    assert t2 is None
                else:
                    assert t2.tf == t1.tf

    def test_uncapped_unchanged(self, monkeypatch):
        """The wide-budget common case still takes the one-pass path."""
        _patch(monkeypatch, 128_000_000)
        single, shard = _build_pair(None)
        assert shard._split.post2_doc_ids is None
        assert shard._post2_sh is None
        qs = _queries()
        i1, p1 = single.retrieve(qs, k=10)
        i2, p2 = shard.retrieve(qs, k=10)
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=1e-6)

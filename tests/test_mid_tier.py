"""Width-capped postings (tier-2 rectangle): parity with uncapped paths.

At huge corpus scale the term-major rare postings rectangle is width-
capped by the entries budget; over-cap terms move to a narrow-but-tall
tier-2 rectangle folded by a second merge pass over only the query rows
that carry them (engine/split_index.py). The cap must be a pure
performance transform: retrieval ids / tf counts equal both the
uncapped sparse-candidate path and the dense compare-tail path, scores
within float reassociation tolerance. The budget is monkeypatched small
here so an 800-doc corpus exercises the tier.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx


def _corpus(seed=0, D=800, V=900, L=80):
    rng = np.random.default_rng(seed)
    return [[f"t{t}" for t in rng.zipf(1.25, size=L) % V] for _ in range(D)]


def _queries(seed=1, n=40, V=900):
    rng = np.random.default_rng(seed)
    qs = [[f"t{t}" for t in rng.zipf(1.3, size=6) % V] for _ in range(n)]
    # edge rows: duplicate tokens, OOV, empty, single rare term
    return qs + [["t1", "t1", "t2"], ["zzz-oov"], [], [f"t{V - 1}"]]


def _build(monkeypatch, budget):
    # Shrink the split budget so K=128 and the 600-term vocab has a real
    # rare tail (the auto K would otherwise cover every term). The SAME
    # K applies to every build in a test, so paths stay comparable.
    monkeypatch.setattr(BayesianBM25Scorer, "_SPLIT_BUDGET_BYTES", 2_000_000)
    if budget is not None:
        monkeypatch.setattr(sidx, "_POSTINGS_MAX_ENTRIES", budget)
    else:
        monkeypatch.setattr(sidx, "_POSTINGS_MAX_ENTRIES", 128_000_000)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(_corpus(), show_progress=False)
    return scorer


class TestMidTier:
    def test_cap_engages_and_matches_uncapped(self, monkeypatch):
        full = _build(monkeypatch, None)
        assert full._split.post2_doc_ids is None
        ids_full, p_full = full.retrieve(_queries(), k=10)

        capped = _build(monkeypatch, 20000)
        s = capped._split
        assert s.post2_doc_ids is not None, "cap did not engage"
        assert s.post_doc_ids is not None, "postings dropped entirely"
        # the capped rectangle honors the budget
        assert s.post_doc_ids.shape[0] * s.post_doc_ids.shape[1] <= 20000
        ids_cap, p_cap = capped.retrieve(_queries(), k=10)

        np.testing.assert_array_equal(ids_cap, ids_full)
        np.testing.assert_allclose(p_cap, p_full, rtol=2e-5, atol=1e-6)

    def test_matches_dense_compare_path(self, monkeypatch):
        # budget too small for any rectangle -> pure dense compare tail
        dense = _build(monkeypatch, 1)
        assert dense._split.post_doc_ids is None
        ids_d, p_d = dense.retrieve(_queries(), k=10)

        capped = _build(monkeypatch, 20000)
        ids_c, p_c = capped.retrieve(_queries(), k=10)
        np.testing.assert_array_equal(ids_c, ids_d)
        np.testing.assert_allclose(p_c, p_d, rtol=2e-5, atol=1e-6)

    def test_tf_and_explain_parity(self, monkeypatch):
        full = _build(monkeypatch, None)
        capped = _build(monkeypatch, 20000)
        qs = _queries()
        e_full = full.retrieve(qs, k=5, explain=True)
        e_cap = capped.retrieve(qs, k=5, explain=True)
        for row_f, row_c in zip(e_full.explanations, e_cap.explanations):
            for tf, tc in zip(row_f, row_c):
                assert (tf is None) == (tc is None)
                if tf is not None:
                    assert tf.tf == tc.tf  # integer-valued, bit-equal

    def test_doc_mask_and_approx(self, monkeypatch):
        full = _build(monkeypatch, None)
        capped = _build(monkeypatch, 20000)
        qs = _queries()
        mask = np.ones(800, bool)
        mask[::3] = False
        ids_f, p_f = full.retrieve(qs, k=8, doc_mask=mask)
        ids_c, p_c = capped.retrieve(qs, k=8, doc_mask=mask)
        np.testing.assert_array_equal(ids_c, ids_f)
        np.testing.assert_allclose(p_c, p_f, rtol=2e-5, atol=1e-6)
        # approx path: rare merge stays exact, frequent side approximate —
        # just exercise compile + sane output
        ids_a, _ = capped.retrieve(qs, k=8, approx=True)
        assert ids_a.shape == (len(qs), 8)

    def test_tier2_group_shapes(self, monkeypatch):
        capped = _build(monkeypatch, 20000)
        s = capped._split
        enc = sidx.encode_queries_split(_queries(), s)
        _, _, trows, tqids, tqcnt = enc
        (ra, s1a, ca), grpB = sidx.split_tail_groups(trows, tqids, tqcnt, s)
        if grpB is None:
            pytest.skip("no tier-2 terms drawn in this batch")
        rb, s1b, cb, s2b, c2b = grpB
        R = s.post_doc_ids.shape[0] - 1
        R2 = s.post2_doc_ids.shape[0] - 1
        # group A rows carry NO tier-2 terms; group B rows carry >= 1
        rs2 = s.rare2_slot_of_term
        assert s2b.shape == c2b.shape and rb.shape == (s2b.shape[0],)
        for d in (len(ra), len(rb), s2b.shape[1]):
            assert d & (d - 1) == 0
        n_real_b = int((s2b < R2).any(axis=1).sum())
        assert n_real_b >= 1
        # pad rows of both groups are all-sentinel with zero counts
        assert (s1a[(s1a >= R).all(axis=1)] == R).all()
        assert (s2b[n_real_b:] == R2).all()
        assert (c2b[s2b == R2] == 0).all()
        # A and B rows partition the real tail rows
        assert not (set(ra[(s1a < R).any(axis=1)].tolist())
                    & set(rb[:n_real_b].tolist()))

    def test_batch_without_mid_terms(self, monkeypatch):
        """A batch whose rare terms are all in-cap skips pass B."""
        capped = _build(monkeypatch, 20000)
        full = _build(monkeypatch, None)
        # frequent-only queries (low term ids are the most frequent)
        qs = [["t1", "t2"], ["t3"], []]
        ids_c, p_c = capped.retrieve(qs, k=5)
        ids_f, p_f = full.retrieve(qs, k=5)
        np.testing.assert_array_equal(ids_c, ids_f)
        np.testing.assert_allclose(p_c, p_f, rtol=2e-5, atol=1e-6)

    def test_save_load_rebuilds_mid_tier(self, monkeypatch, tmp_path):
        from bayesian_bm25_tpu.utils.io import save_scorer, load_scorer
        capped = _build(monkeypatch, 20000)
        p = str(tmp_path / "s.npz")
        save_scorer(p, capped)
        loaded = load_scorer(p)
        assert loaded._split.post2_doc_ids is not None
        qs = _queries()
        ids_a, p_a = capped.retrieve(qs, k=6)
        ids_b, p_b = loaded.retrieve(qs, k=6)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_allclose(p_a, p_b, rtol=2e-5, atol=1e-6)

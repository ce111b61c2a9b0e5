"""Light/heavy cap split of the tier-1 merge: parity with the single pass.

At huge corpus scale the sparse merge's candidate cap is set by the
heaviest tail row in the batch, so one query carrying a high-df rare
term widens every row's sbase gather/sort. ``split_light_heavy``
(engine/split_index.py) partitions the tier-1 group by per-row postings
total and the kernel folds the heavy rows in a second ``_sparse_merge``
pass at their own cap. A pure performance transform: ids / tf bit-equal
to the single-pass kernel, scores within float reassociation tolerance.
The engagement thresholds are monkeypatched to 0 here so an 800-doc
corpus exercises the split (production engages at >= 1M gathered-element
savings — the 1M-doc regime).
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx


def _corpus(seed=0, D=800, V=900, L=80):
    rng = np.random.default_rng(seed)
    return [[f"t{t}" for t in rng.zipf(1.25, size=L) % V] for _ in range(D)]


def _queries(seed=1, n=48, V=900):
    rng = np.random.default_rng(seed)
    qs = [[f"t{t}" for t in rng.zipf(1.3, size=6) % V] for _ in range(n)]
    # edge rows: duplicate tokens, OOV, empty, single rare term
    return qs + [["t1", "t1", "t2"], ["zzz-oov"], [], [f"t{V - 1}"]]


def _build(monkeypatch, light_heavy: bool, budget=None):
    monkeypatch.setattr(BayesianBM25Scorer, "_SPLIT_BUDGET_BYTES", 2_000_000)
    if budget is not None:
        monkeypatch.setattr(sidx, "_POSTINGS_MAX_ENTRIES", budget)
    monkeypatch.setattr(sidx, "LIGHT_HEAVY", light_heavy)
    if light_heavy:
        monkeypatch.setattr(sidx, "_LH_MIN_SAVE", 0)
        monkeypatch.setattr(sidx, "_LH_MIN_RATIO", 1.0)
    scorer = BayesianBM25Scorer(base_rate=0.01)
    scorer.index(_corpus(), show_progress=False)
    return scorer


def _split_engages(scorer, qs, k=10):
    s = scorer._split
    enc = sidx.encode_queries_split(qs, s)
    (tr, ts, tc), _ = sidx.split_tail_groups(enc[2], enc[3], enc[4], s)
    return sidx.split_light_heavy(tr, ts, tc, s, k) is not None


class TestLightHeavy:
    def test_matches_single_pass(self, monkeypatch):
        base = _build(monkeypatch, light_heavy=False)
        qs = _queries()
        ids_1, p_1 = base.retrieve(qs, k=10)

        split = _build(monkeypatch, light_heavy=True)
        assert _split_engages(split, qs), "split did not engage"
        ids_2, p_2 = split.retrieve(qs, k=10)

        np.testing.assert_array_equal(ids_2, ids_1)
        np.testing.assert_allclose(p_2, p_1, rtol=2e-5, atol=1e-6)

    def test_with_tier2_and_mask(self, monkeypatch):
        """Light + heavy + tier-2 passes compose; doc_mask flows through."""
        base = _build(monkeypatch, light_heavy=False, budget=20000)
        split = _build(monkeypatch, light_heavy=True, budget=20000)
        assert split._split.post2_doc_ids is not None
        qs = _queries()
        mask = np.ones(800, bool)
        mask[::3] = False
        ids_1, p_1 = base.retrieve(qs, k=8, doc_mask=mask)
        ids_2, p_2 = split.retrieve(qs, k=8, doc_mask=mask)
        np.testing.assert_array_equal(ids_2, ids_1)
        np.testing.assert_allclose(p_2, p_1, rtol=2e-5, atol=1e-6)

    def test_tf_parity(self, monkeypatch):
        base = _build(monkeypatch, light_heavy=False)
        split = _build(monkeypatch, light_heavy=True)
        qs = _queries()
        e_1 = base.retrieve(qs, k=5, explain=True)
        e_2 = split.retrieve(qs, k=5, explain=True)
        for row_1, row_2 in zip(e_1.explanations, e_2.explanations):
            for t1, t2 in zip(row_1, row_2):
                assert (t1 is None) == (t2 is None)
                if t1 is not None:
                    assert t1.tf == t2.tf  # integer-valued, bit-equal

    def test_group_shapes_and_partition(self, monkeypatch):
        split = _build(monkeypatch, light_heavy=True)
        s = split._split
        qs = _queries()
        enc = sidx.encode_queries_split(qs, s)
        (tr, ts, tc), _ = sidx.split_tail_groups(enc[2], enc[3], enc[4], s)
        lh = sidx.split_light_heavy(tr, ts, tc, s, 10)
        assert lh is not None
        (lr, lsl, lc), (hr, hsl, hc) = lh
        R = s.post_doc_ids.shape[0] - 1
        for d in (len(lr), len(hr)):
            assert d & (d - 1) == 0
        # every heavy row is heavier than every light row's cap bucket
        lt = s.rare_df[lsl].sum(axis=1)
        ht = s.rare_df[hsl[(hsl < R).any(axis=1)]].sum(axis=1)
        assert ht.min() > lt.max()
        # light ∪ heavy real rows == original real rows, disjoint
        real_in = set(np.asarray(tr)[(np.asarray(ts) < R).any(axis=1)].tolist())
        real_l = set(lr[(lsl < R).any(axis=1)].tolist())
        real_h = set(hr[(hsl < R).any(axis=1)].tolist())
        assert not (real_l & real_h)
        assert real_l | real_h == real_in
        # pad rows are all-sentinel with zero counts
        assert (lc[lsl == R] == 0).all() and (hc[hsl == R] == 0).all()
        # per-group caps: light strictly narrower
        assert sidx.candidate_cap(s, lsl, 10) < sidx.candidate_cap(s, hsl, 10)

    def test_disengages_below_thresholds(self, monkeypatch):
        """Production thresholds keep small regimes on the single pass."""
        monkeypatch.setattr(BayesianBM25Scorer, "_SPLIT_BUDGET_BYTES",
                            2_000_000)
        scorer = BayesianBM25Scorer(base_rate=0.01)
        scorer.index(_corpus(), show_progress=False)
        assert not _split_engages(scorer, _queries())


class TestGroupBSplit:
    """Group-B (tier-2) cap split: the heavy tier-2 pass is a pure
    performance transform — ids/tf bit-equal to the unsplit tier-2
    path, scores within float reassociation tolerance."""

    def _build_b(self, monkeypatch, engage: bool):
        monkeypatch.setattr(BayesianBM25Scorer, "_SPLIT_BUDGET_BYTES",
                            2_000_000)
        monkeypatch.setattr(sidx, "_POSTINGS_MAX_ENTRIES", 20000)
        monkeypatch.setattr(sidx, "LIGHT_HEAVY", True)
        # keep the tier-1 split off so only the B split varies
        monkeypatch.setattr(sidx, "_LH_MIN_SAVE", 10**12)
        if engage:
            monkeypatch.setattr(sidx, "_LHB_MIN_SAVE", 0)
            monkeypatch.setattr(sidx, "_LHB_MIN_RATIO", 1.0)
        else:
            monkeypatch.setattr(sidx, "_LHB_MIN_SAVE", 10**12)
        scorer = BayesianBM25Scorer(base_rate=0.01)
        scorer.index(_corpus(), show_progress=False)
        return scorer

    def _b_split_engages(self, scorer, qs, k=10):
        s = scorer._split
        enc = sidx.encode_queries_split(qs, s)
        _, grpB = sidx.split_tail_groups(enc[2], enc[3], enc[4], s)
        assert grpB is not None, "no tier-2 rows in the test batch"
        return sidx.split_light_heavy_b(*grpB, s, k) is not None

    def test_matches_unsplit_tier2(self, monkeypatch):
        base = self._build_b(monkeypatch, engage=False)
        qs = _queries()
        ids_1, p_1 = base.retrieve(qs, k=10)

        split = self._build_b(monkeypatch, engage=True)
        assert self._b_split_engages(split, qs), "B split did not engage"
        ids_2, p_2 = split.retrieve(qs, k=10)
        np.testing.assert_array_equal(ids_2, ids_1)
        np.testing.assert_allclose(p_2, p_1, rtol=2e-5, atol=1e-6)

    def test_partition_properties(self, monkeypatch):
        split = self._build_b(monkeypatch, engage=True)
        s = split._split
        qs = _queries()
        enc = sidx.encode_queries_split(qs, s)
        _, grpB = sidx.split_tail_groups(enc[2], enc[3], enc[4], s)
        lhb = sidx.split_light_heavy_b(*grpB, s, 10)
        assert lhb is not None
        (lr, ls1, lc1, ls2, lc2), (hr, hs1, hc1, hs2, hc2) = lhb
        R2 = s.post2_doc_ids.shape[0] - 1
        for d in (len(lr), len(hr)):
            assert d & (d - 1) == 0
        # light ∪ heavy real rows == original real rows, disjoint
        # (real B rows carry >= 1 real tier-2 slot)
        trB, s1B = grpB[0], grpB[1]
        real_in = set(np.asarray(trB)[
            (np.asarray(grpB[3]) < R2).any(axis=1)].tolist())
        real_l = set(lr[(ls2 < R2).any(axis=1)].tolist())
        real_h = set(hr[(hs2 < R2).any(axis=1)].tolist())
        assert not (real_l & real_h)
        assert real_l | real_h == real_in
        # per-group caps: light strictly narrower
        assert (sidx.candidate_cap2(s, ls1, ls2, 10)
                < sidx.candidate_cap2(s, hs1, hs2, 10))

    def test_with_mask_and_explain(self, monkeypatch):
        base = self._build_b(monkeypatch, engage=False)
        split = self._build_b(monkeypatch, engage=True)
        qs = _queries()
        mask = np.ones(800, bool)
        mask[::4] = False
        i1, p1 = base.retrieve(qs, k=6, doc_mask=mask)
        i2, p2 = split.retrieve(qs, k=6, doc_mask=mask)
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=1e-6)
        e1 = base.retrieve(qs[:8], k=5, explain=True)
        e2 = split.retrieve(qs[:8], k=5, explain=True)
        for r1, r2 in zip(e1.explanations, e2.explanations):
            for t1, t2 in zip(r1, r2):
                if t1 is not None:
                    assert t1.tf == t2.tf

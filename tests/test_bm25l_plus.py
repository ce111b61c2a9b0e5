"""bm25l / bm25+ variant parity (bm25s semantics, Lv & Zhai 2011).

The reference passes ``method`` straight to ``bm25s.BM25`` with no
validation (ref scorer.py:213), so bm25s's bm25l and bm25+ are part of
its accepted surface. bm25s semantics, frozen here as hand-derived
literals (plain-float computation, no engine code — bm25s itself is
not installable in this no-egress environment):

    norm = 1 - b + b * dl / avgdl
    bm25l:  idf = ln((N+1)/(df+0.5));
            tfc = (k1+1)(c + d)/(k1 + c + d),  c = tf / norm
    bm25+:  idf = ln((N+1)/df);
            tfc = (k1+1) tf/(k1*norm + tf) + d
    d (delta) default 0.5

Both have a NONZERO tf=0 contribution, so bm25s adds a per-query
"nonoccurrence" shift sat0 * sum_t idf_t. Engine contract (engine/
index.py module docstring): the weight table stores idf*(sat - sat0)
(non-negative — rankings, WAND bounds, sparse completeness all carry
over); ``get_scores``/``get_scores_batch`` add the shift for bm25s
score parity; the calibrated probability pipeline works on the
unshifted score (a per-query recentering — rank-identical, and
alpha/beta are fitted on the same unshifted distribution).

Fixture: CORPUS/QUERY of test_bm25_golden (k1=1.2, b=0.75, delta=0.5,
dl=[4,2,6,3], avgdl=3.75, df: cat/dog/fish/bird=2, rare=1; 'unicorn'
is OOV and contributes nothing, matching bm25s query tokenization).
Doc 1 contains no query term, so its full score equals the shift
exactly and its table-only score is 0.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import index as eidx

CORPUS = [
    ["cat", "dog", "cat", "fish"],
    ["dog", "bird"],
    ["cat", "cat", "cat", "bird", "bird", "rare"],
    ["fish", "fish", "fish"],
]
QUERY = ["cat", "rare", "unicorn", "fish"]

GOLDEN_FULL = {
    "bm25l": [2.631340701077, 1.6760552247, 2.806547566242, 2.402545752065],
    "bm25+": [3.849685534603, 1.721009688091, 4.289106961342,
              3.225367606094],
}
GOLDEN_SHIFT = {"bm25l": 1.6760552247, "bm25+": 1.721009688091}


class TestGoldenScores:
    @pytest.mark.parametrize("method", ["bm25l", "bm25+"])
    def test_get_scores_matches_bm25s_goldens(self, method):
        s = BayesianBM25Scorer(method=method)
        s.index(CORPUS, show_progress=False)
        np.testing.assert_allclose(s.get_scores(QUERY), GOLDEN_FULL[method],
                                   rtol=1e-6, atol=1e-9)

    @pytest.mark.parametrize("method", ["bm25l", "bm25+"])
    def test_shift_decomposition(self, method):
        s = BayesianBM25Scorer(method=method)
        s.index(CORPUS, show_progress=False)
        shift = eidx.query_score_shift(s.bm25_index, [QUERY])
        assert shift[0] == pytest.approx(GOLDEN_SHIFT[method], rel=1e-9)
        internal = s._scores_internal([QUERY])[0]
        # table weights are non-negative and 0 for the no-match doc
        assert internal[1] == 0.0
        assert np.all(internal >= 0)
        np.testing.assert_allclose(internal + shift[0], GOLDEN_FULL[method],
                                   rtol=1e-6)

    def test_classic_methods_zero_shift(self):
        for method in ("robertson", "lucene", "atire"):
            s = BayesianBM25Scorer(method=method)
            s.index(CORPUS, show_progress=False)
            assert not eidx.query_score_shift(s.bm25_index, [QUERY]).any()

    def test_nonoccurrence_values(self):
        assert eidx.nonoccurrence_score("bm25l", 1.2, 0.5) == \
            pytest.approx(2.2 * 0.5 / 1.7)
        assert eidx.nonoccurrence_score("bm25+", 1.2, 0.5) == 0.5
        assert eidx.nonoccurrence_score("robertson", 1.2, 0.5) == 0.0


class TestPipelineIntegration:
    @pytest.mark.parametrize("method", ["bm25l", "bm25+"])
    def test_retrieve_and_probabilities(self, method):
        rng = np.random.default_rng(5)
        corpus = [[f"t{t}" for t in rng.integers(0, 60, 12)]
                  for _ in range(120)]
        s = BayesianBM25Scorer(method=method, base_rate=0.05)
        s.index(corpus, show_progress=False)
        qs = [[f"t{t}" for t in rng.integers(0, 60, 4)] for _ in range(6)]
        ids, probs = s.retrieve(qs, k=5)
        assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) < 1))
        # ranking equals the brute-force full-score ranking (shift is
        # rank-neutral, so either scoring surface gives the same order)
        full = s.get_scores_batch(qs)
        for qi in range(len(qs)):
            order = np.argsort(-full[qi], kind="stable")[:5]
            np.testing.assert_array_equal(np.asarray(ids)[qi], order)

    @pytest.mark.parametrize("method", ["bm25l", "bm25+"])
    def test_append_equals_rebuild(self, method):
        s = BayesianBM25Scorer(method=method, base_rate=0.05)
        s.index(CORPUS, show_progress=False)
        s.add_documents([["rare", "cat"], ["dog", "dog", "unicorn"]])
        full = BayesianBM25Scorer(method=method, base_rate=0.05)
        full.index(CORPUS + [["rare", "cat"], ["dog", "dog", "unicorn"]],
                   show_progress=False)
        np.testing.assert_array_equal(
            np.asarray(s.get_scores(QUERY)),
            np.asarray(full.get_scores(QUERY)))

    def test_delta_knob(self):
        a = BayesianBM25Scorer(method="bm25+", delta=0.5)
        c = BayesianBM25Scorer(method="bm25+", delta=1.5)
        a.index(CORPUS, show_progress=False)
        c.index(CORPUS, show_progress=False)
        sa, sc = a.get_scores(QUERY), c.get_scores(QUERY)
        # larger delta raises every matched doc's score by idf-sum * ddelta
        assert np.all(np.asarray(sc) > np.asarray(sa))
        with pytest.raises(ValueError, match="delta"):
            BayesianBM25Scorer(delta=0.0)

    def test_checkpoint_roundtrip(self, tmp_path):
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        s = BayesianBM25Scorer(method="bm25+", base_rate=0.05, delta=0.7)
        s.index(CORPUS, show_progress=False)
        p = str(tmp_path / "ck.npz")
        save_scorer(p, s)
        r = load_scorer(p)
        assert r._method == "bm25+" and r._delta == 0.7
        assert r.bm25_index.delta == 0.7
        np.testing.assert_array_equal(
            np.asarray(s.get_scores(QUERY)), np.asarray(r.get_scores(QUERY)))

    def test_tombstones_stay_zero_on_public_scores(self):
        s = BayesianBM25Scorer(method="bm25+", base_rate=0.05)
        s.index(CORPUS, show_progress=False)
        s.delete_documents([0])
        out = s.get_scores(QUERY)
        assert out[0] == 0.0  # shift must not resurrect deleted docs


class TestShardedParity:
    def test_sharded_public_scores_match_single_chip(self):
        from bayesian_bm25_tpu.parallel.sharded_scorer import (
            ShardedBayesianBM25Scorer)

        rng = np.random.default_rng(9)
        corpus = [[f"t{t}" for t in rng.integers(0, 40, 10)]
                  for _ in range(80)]
        qs = [[f"t{t}" for t in rng.integers(0, 40, 4)] for _ in range(4)]
        single = BayesianBM25Scorer(method="bm25+", base_rate=0.05)
        single.index(corpus, show_progress=False)
        sharded = ShardedBayesianBM25Scorer(method="bm25+", base_rate=0.05,
                                            n_devices=4)
        sharded.index(corpus, show_progress=False)
        np.testing.assert_allclose(
            single.get_scores_batch(qs), sharded.get_scores_batch(qs),
            rtol=1e-6, atol=1e-9)


class TestVariantInteractions:
    def test_score_scale_is_noop_for_bm25l_plus(self):
        """bm25l/bm25+ ARE bm25s formulas in both scales (the k1+1
        handling is part of their definition, not the scale knob)."""
        for method in ("bm25l", "bm25+"):
            a = BayesianBM25Scorer(method=method)
            b = BayesianBM25Scorer(method=method, score_scale="bm25s")
            a.index(CORPUS, show_progress=False)
            b.index(CORPUS, show_progress=False)
            np.testing.assert_array_equal(
                np.asarray(a.get_scores(QUERY)),
                np.asarray(b.get_scores(QUERY)))

    def test_int8_storage_rank_parity(self):
        """int8 impact storage composes with the shifted variants: same
        top-k ids as f32 storage on a tie-free corpus."""
        rng = np.random.default_rng(17)
        corpus = [[f"t{t}" for t in rng.integers(0, 80, rng.integers(8, 20))]
                  for _ in range(300)]
        qs = [[f"t{t}" for t in rng.integers(0, 80, 5)] for _ in range(4)]
        a = BayesianBM25Scorer(method="bm25+", base_rate=0.05,
                               impact_storage="f32",
                               matmul_precision="highest")
        b = BayesianBM25Scorer(method="bm25+", base_rate=0.05,
                               impact_storage="int8")
        a.index(corpus, show_progress=False)
        b.index(corpus, show_progress=False)
        ids_a, _ = a.retrieve(qs, k=5)
        ids_b, _ = b.retrieve(qs, k=5)
        np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))

"""WAND-pruned retrieve_thresholded: output-invariance vs the dense scan.

The pruned path inverts the certified probability upper bound
(ops/transform.py:wand_score_threshold, the inverse of the reference's
WAND bound probability.py:205-236) into a score prefilter and computes
exact probabilities only for survivors. These tests assert the results
are IDENTICAL to the dense full-corpus scan — ids, probabilities, and
n_passing — over fuzzed corpora, thresholds, masks, and transform modes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import scoring
from bayesian_bm25_tpu.ops import transform as T


def dense_reference(scorer, queries, threshold, k, doc_mask=None):
    """The pre-pruning implementation: full (nq, D) probability scan."""
    nq = len(queries)
    dense = scorer._dense_probs_device(queries)
    if doc_mask is not None:
        dense = dense * jnp.asarray(doc_mask)[None, :]
    ids, probs, n_passing = scoring.thresholded_topk(
        dense, float(threshold), min(k, scorer._index.n_docs))
    return (np.asarray(ids)[:nq], np.asarray(probs)[:nq].astype(np.float64),
            np.asarray(n_passing)[:nq].astype(int))


def make_corpus(rng, n_docs, vocab):
    return [[f"t{t}" for t in rng.zipf(1.35, size=rng.integers(5, 40)) % vocab]
            for _ in range(n_docs)]


def make_queries(rng, n, vocab):
    return [[f"t{t}" for t in rng.zipf(1.35, size=rng.integers(1, 7)) % vocab]
            for _ in range(n)]


class TestScoreThresholdInversion:
    def test_inverse_is_conservative(self):
        """wand_upper_bound at the returned score must sit at/above the
        probability threshold (the margin keeps it safe, not tight)."""
        rng = np.random.default_rng(0)
        for _ in range(200):
            alpha = float(rng.uniform(0.2, 3.0))
            beta = float(rng.uniform(0.5, 8.0))
            br = float(rng.uniform(1e-4, 0.5)) if rng.random() < 0.7 else None
            t = float(rng.uniform(0.01, 0.99))
            s_min = T.wand_score_threshold(t, alpha, beta, br)
            assert np.isfinite(s_min)
            # Safety: at s_min the bound sits at/below the threshold
            # (margin pushes it down), so no doc below s_min can pass.
            ub_at = float(T.wand_upper_bound(s_min, alpha, beta, br))
            assert ub_at <= t + 1e-6, (t, alpha, beta, br, s_min, ub_at)
            # Tightness: just past the margin the bound reaches t.
            probe = s_min + 3e-4 * max(1.0, abs(s_min))
            ub = float(T.wand_upper_bound(probe, alpha, beta, br))
            assert ub >= t - 1e-5, (t, alpha, beta, br, s_min, ub)

    def test_no_passing_doc_below_threshold_score(self):
        """Certification: any (score, tf, dlr) with P >= t has
        score >= s_min."""
        rng = np.random.default_rng(1)
        alpha, beta, br = 0.9, 3.0, 0.05
        t = 0.3
        s_min = T.wand_score_threshold(t, alpha, beta, br)
        scores = rng.uniform(0, 12, 20000)
        tfs = rng.integers(0, 12, 20000).astype(float)
        dlr = rng.uniform(0.2, 2.0, 20000)
        P = np.asarray(T.score_to_probability(scores, tfs, dlr, alpha,
                                              beta, br))
        passing = P >= t
        assert passing.any()
        assert (scores[passing] >= s_min).all()

    def test_edge_thresholds(self):
        assert T.wand_score_threshold(0.0, 1.0, 2.0) == float("-inf")
        assert T.wand_score_threshold(-1.0, 1.0, 2.0) == float("-inf")
        assert T.wand_score_threshold(1.0, 1.0, 2.0) == float("inf")
        assert T.wand_score_threshold(0.5, -1.0, 2.0) == float("-inf")


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(7)
    corpus = make_corpus(rng, 800, 900)
    s = BayesianBM25Scorer(base_rate="auto")
    s.index(corpus, show_progress=False)
    assert s._split is not None
    queries = make_queries(rng, 24, 900)
    return s, queries, rng


class TestPrunedMatchesDense:
    @pytest.mark.parametrize("threshold", [0.05, 0.2, 0.5, 0.8, 0.97])
    def test_identical_results(self, built, threshold):
        s, queries, _ = built
        got = s.retrieve_thresholded(queries, threshold, k=10)
        ref = dense_reference(s, queries, threshold, 10)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_array_equal(got[2], ref[2])

    def test_identical_with_doc_mask(self, built):
        s, queries, _ = built
        rng = np.random.default_rng(3)
        mask = rng.uniform(size=s.num_docs) < 0.6
        got = s.retrieve_thresholded(queries, 0.3, k=10, doc_mask=mask)
        ref = dense_reference(s, queries, 0.3, 10, doc_mask=mask)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_array_equal(got[2], ref[2])

    def test_threshold_zero_falls_back_dense(self, built):
        """t=0 can't prune (s_min = -inf); the dense path serves it with
        the threshold-0 contract intact."""
        s, queries, _ = built
        got = s.retrieve_thresholded(queries[:4], 0.0, k=10)
        ref = dense_reference(s, queries[:4], 0.0, 10)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[2], ref[2])

    def test_threshold_above_one_returns_empty(self, built):
        s, queries, _ = built
        ids, probs, n_passing = s.retrieve_thresholded(queries[:4], 1.0, k=5)
        assert (ids == -1).all()
        assert (probs == 0).all()
        assert (n_passing == 0).all()

    def test_fuzz_many_corpora(self):
        """Small fuzzed corpora across base-rate modes and both engine
        paths (split and compare-only)."""
        rng = np.random.default_rng(11)
        for trial in range(4):
            n_docs = int(rng.integers(60, 400))
            vocab = int(rng.integers(80, 600))
            corpus = make_corpus(rng, n_docs, vocab)
            s = BayesianBM25Scorer(
                base_rate=[None, "auto", 0.05, None][trial])
            s.index(corpus, show_progress=False)
            queries = make_queries(rng, 8, vocab)
            for threshold in (0.1, 0.45, 0.9):
                got = s.retrieve_thresholded(queries, threshold, k=7)
                ref = dense_reference(s, queries, threshold, 7)
                np.testing.assert_array_equal(got[0], ref[0])
                np.testing.assert_array_equal(got[1], ref[1])
                np.testing.assert_array_equal(got[2], ref[2])

    def test_prior_free_mode(self, built):
        rng = np.random.default_rng(13)
        corpus = make_corpus(rng, 300, 400)
        s = BayesianBM25Scorer()
        s.index(corpus, show_progress=False)
        s._transform._training_mode = "prior_free"
        queries = make_queries(rng, 8, 400)
        got = s.retrieve_thresholded(queries, 0.4, k=5)
        ref = dense_reference(s, queries, 0.4, 5)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_array_equal(got[2], ref[2])


class TestThresholdedChunking:
    def test_chunked_matches_one_shot(self, built):
        s, queries, _ = built
        ref = s.retrieve_thresholded(queries, 0.3, k=7)
        old = s._SCORES_BUDGET_BYTES
        try:
            s._SCORES_BUDGET_BYTES = 1  # floor 256 -> chunk 128
            assert max(s._auto_batch_size() // 2, 128) == 128
            # 24 queries < 128: force smaller chunks by slicing manually
            parts = [queries[i:i + 5] for i in range(0, len(queries), 5)]
            got = [s.retrieve_thresholded(p, 0.3, k=7) for p in parts]
            ids = np.concatenate([g[0] for g in got])
            probs = np.concatenate([g[1] for g in got])
            n = np.concatenate([g[2] for g in got])
        finally:
            s._SCORES_BUDGET_BYTES = old
        np.testing.assert_array_equal(ids, ref[0])
        np.testing.assert_array_equal(probs, ref[1])
        np.testing.assert_array_equal(n, ref[2])

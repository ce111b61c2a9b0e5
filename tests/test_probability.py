"""Transform math tests: analytic expectations + learning behavior.

Mirrors the invariants of the reference suite (tests/test_probability.py):
sigmoid symmetry/monotonicity, prior bounds and peak locations, posterior
log-odds equivalence, base-rate semantics, fit/update convergence, pickle
round-trips.
"""

import copy
import pickle

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianProbabilityTransform, TemporalBayesianTransform
from bayesian_bm25_tpu.models.probability import logit, sigmoid


class TestSigmoidLogit:
    def test_sigmoid_midpoint(self):
        assert sigmoid(0.0) == pytest.approx(0.5)

    def test_sigmoid_symmetry(self):
        xs = np.linspace(-30, 30, 101)
        np.testing.assert_allclose(sigmoid(xs) + sigmoid(-xs), 1.0, atol=1e-12)

    def test_sigmoid_monotone_and_stable(self):
        xs = np.array([-1000.0, -100.0, 0.0, 100.0, 1000.0])
        ys = sigmoid(xs)
        assert np.all(np.diff(ys) >= 0)
        assert np.all(np.isfinite(ys))

    def test_logit_inverts_sigmoid(self):
        xs = np.linspace(-10, 10, 41)
        np.testing.assert_allclose(logit(sigmoid(xs)), xs, atol=1e-8)

    def test_logit_clamped_at_extremes(self):
        assert np.isfinite(logit(0.0))
        assert np.isfinite(logit(1.0))
        assert logit(0.5) == pytest.approx(0.0)


class TestPriors:
    def test_tf_prior_values(self):
        t = BayesianProbabilityTransform
        assert t.tf_prior(0.0) == pytest.approx(0.2)
        assert t.tf_prior(5.0) == pytest.approx(0.2 + 0.7 * 0.5)
        assert t.tf_prior(10.0) == pytest.approx(0.9)
        assert t.tf_prior(100.0) == pytest.approx(0.9)  # saturates

    def test_norm_prior_peak_and_floor(self):
        t = BayesianProbabilityTransform
        assert t.norm_prior(0.5) == pytest.approx(0.9)
        assert t.norm_prior(0.0) == pytest.approx(0.3)
        assert t.norm_prior(1.0) == pytest.approx(0.3)
        assert t.norm_prior(5.0) == pytest.approx(0.3)

    def test_composite_prior_clamped(self):
        t = BayesianProbabilityTransform
        p = t.composite_prior(np.array([0.0, 100.0]), np.array([0.0, 0.5]))
        assert np.all(p >= 0.1) and np.all(p <= 0.9)
        # saturated value: clip(0.7*0.9 + 0.3*0.9, 0.1, 0.9) = 0.9
        assert t.composite_prior(10.0, 0.5) == pytest.approx(0.9)
        # interior value: 0.7*(0.2+0.7*0.5) + 0.3*0.9 = 0.655
        assert t.composite_prior(5.0, 0.5) == pytest.approx(0.655)

    def test_composite_prior_vectorized(self):
        t = BayesianProbabilityTransform
        tf = np.array([0.0, 5.0, 10.0])
        r = np.array([0.5, 0.5, 0.5])
        out = t.composite_prior(tf, r)
        assert out.shape == (3,)


class TestPosterior:
    def test_neutral_prior_is_identity(self):
        t = BayesianProbabilityTransform
        for L in [0.1, 0.5, 0.9]:
            assert t.posterior(L, 0.5) == pytest.approx(L, abs=1e-9)

    def test_log_odds_equivalence(self):
        """posterior(L, p, br) == sigmoid(logit L + logit p + logit br)."""
        t = BayesianProbabilityTransform
        rng = np.random.default_rng(0)
        L = rng.uniform(0.05, 0.95, 50)
        p = rng.uniform(0.1, 0.9, 50)
        expected = sigmoid(logit(L) + logit(p) + logit(0.01))
        np.testing.assert_allclose(
            t.posterior(L, p, base_rate=0.01), expected, rtol=1e-8
        )

    def test_base_rate_half_is_neutral(self):
        t = BayesianProbabilityTransform
        np.testing.assert_allclose(
            t.posterior(0.7, 0.3, base_rate=0.5), t.posterior(0.7, 0.3), rtol=1e-10
        )

    def test_low_base_rate_shrinks_probability(self):
        t = BayesianProbabilityTransform
        assert t.posterior(0.9, 0.8, base_rate=0.001) < t.posterior(0.9, 0.8)


class TestScoreToProbability:
    def test_monotone_in_score(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=5.0)
        scores = np.linspace(0, 20, 50)
        probs = t.score_to_probability(scores, np.full(50, 3.0), np.full(50, 0.8))
        assert np.all(np.diff(probs) > 0)

    def test_prior_free_mode_equals_likelihood(self):
        t = BayesianProbabilityTransform(alpha=0.5, beta=2.0)
        t._training_mode = "prior_free"
        s = np.array([1.0, 3.0, 7.0])
        np.testing.assert_allclose(
            t.score_to_probability(s, np.zeros(3), np.ones(3)),
            t.likelihood(s),
            rtol=1e-9,
        )

    def test_custom_prior_fn(self):
        t = BayesianProbabilityTransform(
            alpha=1.0, beta=0.0, prior_fn=lambda s, tf, r: np.full_like(
                np.asarray(s, dtype=np.float64), 0.5)
        )
        s = np.array([1.0, -1.0])
        np.testing.assert_allclose(
            t.score_to_probability(s, np.zeros(2), np.ones(2)),
            t.likelihood(s),
            rtol=1e-9,
        )

    def test_scalar_returns_float(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        out = t.score_to_probability(1.0, 3.0, 0.8)
        assert isinstance(out, float)

    def test_invalid_base_rate_raises(self):
        with pytest.raises(ValueError):
            BayesianProbabilityTransform(base_rate=1.5)
        with pytest.raises(ValueError):
            BayesianProbabilityTransform(base_rate=0.0)


class TestWandUpperBound:
    def test_dominates_all_actual_probabilities(self):
        """Safety: UB >= every doc's probability at the max term score."""
        t = BayesianProbabilityTransform(alpha=0.7, beta=3.0, base_rate=0.05)
        rng = np.random.default_rng(1)
        ub_score = 12.0
        bound = t.wand_upper_bound(ub_score)
        scores = rng.uniform(0, ub_score, 500)
        tfs = rng.integers(0, 20, 500).astype(float)
        ratios = rng.uniform(0.1, 3.0, 500)
        actual = t.score_to_probability(scores, tfs, ratios)
        assert np.all(actual <= bound + 1e-12)

    def test_monotone_in_bound(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        bounds = t.wand_upper_bound(np.array([1.0, 2.0, 5.0]))
        assert np.all(np.diff(bounds) > 0)


def _synthetic_labels(rng, scores, alpha=2.0, beta=1.0):
    p = 1.0 / (1.0 + np.exp(-alpha * (scores - beta)))
    return (rng.uniform(size=scores.shape) < p).astype(np.float64)


class TestFit:
    def test_balanced_recovers_parameters(self):
        rng = np.random.default_rng(7)
        scores = rng.normal(1.0, 2.0, 4000)
        labels = _synthetic_labels(rng, scores, alpha=2.0, beta=1.0)
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t.fit(scores, labels, learning_rate=0.1, max_iterations=5000)
        assert t.alpha == pytest.approx(2.0, abs=0.4)
        assert t.beta == pytest.approx(1.0, abs=0.4)

    def test_fit_improves_bce(self):
        rng = np.random.default_rng(3)
        scores = rng.normal(0.0, 3.0, 1000)
        labels = _synthetic_labels(rng, scores, alpha=1.5, beta=0.5)
        t = BayesianProbabilityTransform(alpha=0.3, beta=-2.0)

        def bce(tr):
            p = np.clip(tr.likelihood(scores), 1e-10, 1 - 1e-10)
            return -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))

        before = bce(t)
        t.fit(scores, labels, learning_rate=0.1, max_iterations=2000)
        assert bce(t) < before

    def test_prior_aware_requires_features(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="prior_aware")

    def test_invalid_mode_raises(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="bogus")

    def test_fit_sets_mode_for_inference(self):
        rng = np.random.default_rng(5)
        scores = rng.normal(1.0, 1.0, 200)
        labels = _synthetic_labels(rng, scores)
        t = BayesianProbabilityTransform()
        t.fit(scores, labels, mode="prior_free", max_iterations=50)
        assert t._training_mode == "prior_free"
        s = np.array([0.5, 1.5])
        np.testing.assert_allclose(
            t.score_to_probability(s, np.zeros(2), np.ones(2)),
            t.likelihood(s),
            rtol=1e-9,
        )

    def test_prior_aware_mode_trains_posterior(self):
        rng = np.random.default_rng(11)
        scores = rng.normal(1.0, 2.0, 800)
        labels = _synthetic_labels(rng, scores)
        tfs = rng.integers(0, 15, 800).astype(float)
        ratios = rng.uniform(0.2, 2.0, 800)
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t.fit(scores, labels, mode="prior_aware", tfs=tfs,
              doc_len_ratios=ratios, max_iterations=500)
        assert t._training_mode == "prior_aware"
        assert np.isfinite(t.alpha) and np.isfinite(t.beta)


class TestOnlineUpdate:
    def test_update_moves_toward_label(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        # Positive label at a high score: likelihood should rise there.
        before = t.likelihood(2.0)
        for _ in range(50):
            t.update(2.0, 1.0)
        assert t.likelihood(2.0) > before

    def test_alpha_floor(self):
        t = BayesianProbabilityTransform(alpha=0.02, beta=0.0)
        for _ in range(200):
            t.update(5.0, 0.0)  # pushes alpha down
        assert t.alpha >= 0.01

    def test_polyak_averaging_tracks(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        for _ in range(20):
            t.update(1.0, 1.0)
        assert t.averaged_alpha != 1.0  # moved
        # Averages lag raw parameters
        assert abs(t.averaged_alpha - 1.0) < abs(t.alpha - 1.0) + 1e-9

    def test_minibatch_update(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t.update(np.array([1.0, 2.0, 3.0]), np.array([0.0, 1.0, 1.0]))
        assert t._n_updates == 1

    def test_update_mode_override_persists(self):
        t = BayesianProbabilityTransform()
        t.update(1.0, 1.0, mode="prior_free")
        assert t._training_mode == "prior_free"

    def test_gradient_clipping_bounds_step(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t.update(1000.0, 1.0, learning_rate=1.0)  # huge grad, must be clipped
        assert np.isfinite(t.alpha) and np.isfinite(t.beta)
        assert abs(t.alpha - 1.0) <= 1.0 + 1e-9
        assert abs(t.beta) <= 1.0 + 1e-9


class TestTemporal:
    def test_invalid_half_life(self):
        with pytest.raises(ValueError):
            TemporalBayesianTransform(decay_half_life=0.0)

    def test_recent_samples_dominate(self):
        rng = np.random.default_rng(13)
        n = 2000
        scores = rng.normal(0.0, 2.0, n)
        # Old regime: beta=-1; new regime: beta=+1
        old_labels = _synthetic_labels(rng, scores[: n // 2], alpha=2.0, beta=-1.0)
        new_labels = _synthetic_labels(rng, scores[n // 2:], alpha=2.0, beta=1.0)
        labels = np.concatenate([old_labels, new_labels])
        timestamps = np.arange(n, dtype=float)

        t_fast = TemporalBayesianTransform(decay_half_life=100.0)
        t_fast.fit(scores, labels, timestamps=timestamps,
                   learning_rate=0.1, max_iterations=2000)
        t_slow = TemporalBayesianTransform(decay_half_life=1e9)
        t_slow.fit(scores, labels, timestamps=timestamps,
                   learning_rate=0.1, max_iterations=2000)
        # Faster decay should land closer to the new regime midpoint (+1)
        assert abs(t_fast.beta - 1.0) < abs(t_slow.beta - 1.0)

    def test_no_timestamps_matches_parent(self):
        rng = np.random.default_rng(17)
        scores = rng.normal(1.0, 1.0, 300)
        labels = _synthetic_labels(rng, scores)
        t1 = TemporalBayesianTransform(decay_half_life=10.0)
        t1.fit(scores, labels, max_iterations=200)
        t2 = BayesianProbabilityTransform()
        t2.fit(scores, labels, max_iterations=200)
        assert t1.alpha == pytest.approx(t2.alpha, rel=1e-9)
        assert t1.beta == pytest.approx(t2.beta, rel=1e-9)

    def test_update_increments_timestamp(self):
        t = TemporalBayesianTransform()
        t.update(1.0, 1.0)
        t.update(1.0, 1.0)
        assert t.timestamp == 2


class TestSerialization:
    def test_pickle_round_trip(self):
        t = BayesianProbabilityTransform(alpha=1.7, beta=0.3, base_rate=0.01)
        t.update(1.0, 1.0)
        t2 = pickle.loads(pickle.dumps(t))
        assert t2.alpha == t.alpha
        assert t2.beta == t.beta
        assert t2.base_rate == t.base_rate
        assert t2._n_updates == t._n_updates
        s = np.array([0.5, 2.5])
        np.testing.assert_allclose(
            t2.score_to_probability(s, np.ones(2), np.ones(2)),
            t.score_to_probability(s, np.ones(2), np.ones(2)),
        )

    def test_deepcopy_independence(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t2 = copy.deepcopy(t)
        t2.update(3.0, 1.0)
        assert t.alpha == 1.0 and t.beta == 0.0
        assert t2.alpha != t.alpha or t2.beta != t.beta

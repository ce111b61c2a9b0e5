"""Metrics + transform breadth: remaining reference behaviors
(ref tests/test_metrics.py, tests/test_probability.py classes not
covered elsewhere)."""

import copy

import numpy as np
import pytest

import bayesian_bm25_tpu as bb
from bayesian_bm25_tpu import (
    BayesianProbabilityTransform,
    TemporalBayesianTransform,
    brier_score,
    calibration_report,
    expected_calibration_error,
    log_loss,
    reliability_diagram,
)


@pytest.fixture(scope="module")
def calib_data():
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 1, 500)
    y = (rng.uniform(size=500) < p).astype(float)
    return p, y


class TestECEBreadth:
    def test_bounds(self, calib_data):
        p, y = calib_data
        assert 0.0 <= float(expected_calibration_error(p, y)) <= 1.0

    def test_n_bins_parameter(self, calib_data):
        p, y = calib_data
        e5 = float(expected_calibration_error(p, y, n_bins=5))
        e20 = float(expected_calibration_error(p, y, n_bins=20))
        assert e5 != e20  # different binning, different estimate
        assert 0 <= e5 <= 1 and 0 <= e20 <= 1


class TestBrierBreadth:
    def test_bounds(self, calib_data):
        p, y = calib_data
        assert 0.0 <= float(brier_score(p, y)) <= 1.0

    def test_worst_prediction(self):
        assert float(brier_score(np.array([1.0, 0.0]),
                                 np.array([0.0, 1.0]))) == pytest.approx(1.0)

    def test_better_calibration_lower_score(self, calib_data):
        p, y = calib_data
        good = float(brier_score(p, y))
        bad = float(brier_score(1.0 - p, y))
        assert good < bad


class TestLogLossBreadth:
    def test_eps_prevents_infinity(self):
        out = float(log_loss(np.array([0.0, 1.0]), np.array([1.0, 0.0])))
        assert np.isfinite(out)
        # both terms clamp to ~eps: loss lands near -log(eps)
        assert out == pytest.approx(-np.log(1e-15), rel=0.01)

    def test_worst_prediction_large(self):
        assert float(log_loss(np.array([0.01]), np.array([1.0]))) > 4.0

    def test_better_calibration_lower_loss(self, calib_data):
        p, y = calib_data
        assert float(log_loss(p, y)) < float(log_loss(1.0 - p, y))


class TestReliabilityBreadth:
    def test_total_count_equals_n(self, calib_data):
        p, y = calib_data
        bins = reliability_diagram(p, y)
        assert sum(c for _, _, c in bins) == len(p)

    def test_perfect_calibration_near_diagonal(self):
        rng = np.random.default_rng(1)
        p = rng.uniform(0, 1, 20000)
        y = (rng.uniform(size=20000) < p).astype(float)
        bins = reliability_diagram(p, y)
        for pred, actual, _ in bins:
            assert actual == pytest.approx(pred, abs=0.05)

    def test_n_bins_parameter(self, calib_data):
        p, y = calib_data
        bins = reliability_diagram(p, y, n_bins=4)
        assert 0 < len(bins) <= 4


class TestReportBreadth:
    def test_matches_individual_metrics(self, calib_data):
        p, y = calib_data
        r = calibration_report(p, y)
        assert r.ece == pytest.approx(float(expected_calibration_error(p, y)),
                                      rel=1e-9)
        assert r.brier == pytest.approx(float(brier_score(p, y)), rel=1e-9)
        assert r.logloss == pytest.approx(float(log_loss(p, y)), rel=1e-9)
        assert r.n_samples == len(p)

    def test_main_package_exports(self):
        for name in ("expected_calibration_error", "brier_score",
                     "log_loss", "reliability_diagram",
                     "calibration_report", "CalibrationReport"):
            assert hasattr(bb, name), name


class TestPriorFnBreadth:
    """Custom prior_fn semantics (ref test_probability.py:472-574)."""

    def _data(self):
        rng = np.random.default_rng(2)
        return (rng.gamma(2.0, 2.0, 50), rng.integers(0, 10, 50).astype(float),
                rng.uniform(0.3, 1.8, 50))

    def test_prior_fn_receives_all_args(self):
        seen = {}

        def prior_fn(score, tf, dlr):
            seen["args"] = (np.asarray(score), np.asarray(tf),
                            np.asarray(dlr))
            return np.full_like(np.asarray(score, dtype=np.float64), 0.4)

        t = BayesianProbabilityTransform(alpha=1.0, beta=2.0,
                                         prior_fn=prior_fn)
        s, tf, dlr = self._data()
        t.score_to_probability(s, tf, dlr)
        assert len(seen["args"]) == 3
        np.testing.assert_allclose(seen["args"][0], s)

    def test_custom_prior_changes_output(self):
        s, tf, dlr = self._data()
        plain = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        custom = BayesianProbabilityTransform(
            alpha=1.0, beta=2.0,
            prior_fn=lambda sc, tf_, dl: np.full(np.shape(sc), 0.9))
        a = np.asarray(plain.score_to_probability(s, tf, dlr))
        b = np.asarray(custom.score_to_probability(s, tf, dlr))
        assert not np.allclose(a, b)
        assert np.all(b >= a - 1e-9)  # 0.9 prior >= clipped composite

    def test_prior_fn_with_base_rate(self):
        s, tf, dlr = self._data()
        t = BayesianProbabilityTransform(
            alpha=1.0, beta=2.0, base_rate=0.05,
            prior_fn=lambda sc, tf_, dl: np.full(np.shape(sc), 0.5))
        plain = BayesianProbabilityTransform(
            alpha=1.0, beta=2.0,
            prior_fn=lambda sc, tf_, dl: np.full(np.shape(sc), 0.5))
        assert float(np.mean(np.asarray(t.score_to_probability(
            s, tf, dlr)))) < float(np.mean(np.asarray(
                plain.score_to_probability(s, tf, dlr))))

    def test_prior_free_overrides_prior_fn(self):
        s, tf, dlr = self._data()
        t = BayesianProbabilityTransform(
            alpha=1.0, beta=2.0,
            prior_fn=lambda sc, tf_, dl: np.full(np.shape(sc), 0.95))
        labels = (s > np.median(s)).astype(float)
        t.fit(s, labels, mode="prior_free", max_iterations=5)
        out = np.asarray(t.score_to_probability(s, tf, dlr))
        expected = np.asarray(t.likelihood(s))
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_none_prior_fn_preserves_behavior(self):
        s, tf, dlr = self._data()
        a = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        b = BayesianProbabilityTransform(alpha=1.0, beta=2.0, prior_fn=None)
        np.testing.assert_allclose(
            np.asarray(a.score_to_probability(s, tf, dlr)),
            np.asarray(b.score_to_probability(s, tf, dlr)), rtol=1e-9)


class TestBaseRateNumericalExample:
    def test_two_step_odds_update(self):
        """posterior = sigma(logit L + logit P + logit br): a worked
        numeric case (ref test_probability.py:251)."""
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0, base_rate=0.1)
        L, P = 0.8, 0.6
        got = float(np.asarray(t.posterior(L, P, base_rate=0.1)))
        z = (np.log(L / (1 - L)) + np.log(P / (1 - P))
             + np.log(0.1 / 0.9))
        assert got == pytest.approx(1 / (1 + np.exp(-z)), rel=1e-5)

    def test_fit_and_update_preserve_base_rate(self):
        rng = np.random.default_rng(3)
        s = rng.gamma(2.0, 2.0, 80)
        y = (s > 4).astype(float)
        t = BayesianProbabilityTransform(alpha=0.5, beta=1.0, base_rate=0.07)
        t.fit(s, y, max_iterations=20)
        assert t.base_rate == 0.07
        t.update(float(s[0]), float(y[0]))
        assert t.base_rate == 0.07


class TestOnlineConvergence:
    def test_online_approaches_batch(self):
        rng = np.random.default_rng(4)
        s = rng.gamma(2.0, 2.0, 400)
        y = (rng.uniform(size=400)
             < 1 / (1 + np.exp(-1.5 * (s - 4)))).astype(float)
        batch = BayesianProbabilityTransform(alpha=0.5, beta=1.0)
        batch.fit(s, y, learning_rate=0.05, max_iterations=2000)
        online = BayesianProbabilityTransform(alpha=0.5, beta=1.0)
        for _ in range(15):
            for i in range(len(s)):
                online.update(float(s[i]), float(y[i]), learning_rate=0.05)
        assert online.averaged_alpha == pytest.approx(batch.alpha, rel=0.5)
        assert online.averaged_beta == pytest.approx(batch.beta, abs=1.5)

    def test_fit_resets_ema_state(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        t.update(3.0, 1.0)
        assert t._n_updates == 1
        t.fit(np.array([1.0, 5.0]), np.array([0.0, 1.0]), max_iterations=3)
        assert t._n_updates == 0


class TestTemporalBreadth:
    def test_isinstance_of_parent(self):
        assert isinstance(TemporalBayesianTransform(),
                          BayesianProbabilityTransform)

    def test_large_half_life_matches_parent(self):
        rng = np.random.default_rng(5)
        s = rng.gamma(2.0, 2.0, 100)
        y = (s > 4).astype(float)
        ts = np.arange(100, dtype=float)
        temporal = TemporalBayesianTransform(alpha=0.5, beta=1.0,
                                             decay_half_life=1e12)
        temporal.fit(s, y, timestamps=ts, max_iterations=100)
        parent = BayesianProbabilityTransform(alpha=0.5, beta=1.0)
        parent.fit(s, y, max_iterations=100)
        assert temporal.alpha == pytest.approx(parent.alpha, rel=1e-3)
        assert temporal.beta == pytest.approx(parent.beta, rel=1e-3)

    def test_properties_and_s2p(self):
        t = TemporalBayesianTransform(alpha=1.0, beta=2.0,
                                      decay_half_life=50.0)
        assert t.decay_half_life == 50.0
        assert t.timestamp == 0
        out = np.asarray(t.score_to_probability(
            np.array([3.0]), np.array([2.0]), np.array([1.0])))
        assert 0 < out[0] < 1


class TestSerializationBreadth:
    def test_deepcopy_independence_after_update(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        c = copy.deepcopy(t)
        t.update(5.0, 1.0, learning_rate=0.5)
        assert c.alpha != t.alpha or c.beta != t.beta
        c.update(1.0, 0.0, learning_rate=0.5)
        assert c.alpha != t.alpha


class TestExportParity:
    """Every public name the reference exports (its __init__.py __all__
    plus the lazy __getattr__ names, ref __init__.py:34-92) must resolve
    from this package's top level."""

    REFERENCE_EXPORTS = [
        "__version__",
        "AttentionLogOddsWeights", "BayesianProbabilityTransform",
        "CalibrationReport", "LearnableLogOddsWeights",
        "MultiHeadAttentionLogOddsWeights", "VectorProbabilityTransform",
        "balanced_log_odds_fusion", "brier_score", "calibration_report",
        "cosine_to_probability", "expected_calibration_error", "log_loss",
        "ivf_density_prior", "knn_density_prior", "log_odds_conjunction",
        "prob_and", "prob_not", "prob_or", "reliability_diagram",
        "BayesianBM25Scorer", "RetrievalResult", "BlockMaxIndex",
        "MultiFieldScorer", "FusionDebugger", "PlattCalibrator",
        "IsotonicCalibrator", "TemporalBayesianTransform",
    ]

    def test_all_reference_exports_resolve(self):
        missing = [n for n in self.REFERENCE_EXPORTS if not hasattr(bb, n)]
        assert missing == []

    def test_unknown_attribute_raises(self):
        with pytest.raises(AttributeError):
            bb.NoSuchExport

"""VectorProbabilityTransform tests: background fit, KDE/GMM, gap routing,
density priors, calibration semantics."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    VectorProbabilityTransform,
    ivf_density_prior,
    knn_density_prior,
)


class TestConstruction:
    def test_invalid_sigma(self):
        with pytest.raises(ValueError):
            VectorProbabilityTransform(mu_G=0.5, sigma_G=0.0)

    def test_invalid_base_rate(self):
        with pytest.raises(ValueError):
            VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1, base_rate=1.0)

    def test_fit_background(self):
        rng = np.random.default_rng(0)
        d = rng.normal(0.6, 0.12, 3000)
        vpt = VectorProbabilityTransform.fit_background(d)
        assert vpt.mu_G == pytest.approx(0.6, abs=0.01)
        assert vpt.sigma_G == pytest.approx(0.12, abs=0.01)

    def test_fit_background_zero_variance(self):
        vpt = VectorProbabilityTransform.fit_background(np.full(10, 0.5))
        assert vpt.sigma_G > 0


class TestGapDetection:
    def test_obvious_gap(self):
        d = np.concatenate([np.full(5, 0.1), np.full(20, 0.8)])
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        idx = vpt._detect_gap(d)
        assert idx == 5  # first element after the gap in sorted order

    def test_no_gap_uniform(self):
        d = np.linspace(0.1, 0.9, 50)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        assert vpt._detect_gap(d) is None

    def test_too_few_points(self):
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        assert vpt._detect_gap(np.array([0.1, 0.9])) is None

    def test_gap_weights_binary(self):
        d = np.concatenate([np.full(5, 0.1), np.full(20, 0.8)])
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        w = vpt._gap_weights(d)
        np.testing.assert_array_equal(w[:5], 1.0)
        np.testing.assert_array_equal(w[5:], 0.0)

    def test_zscore_fallback(self):
        # Small relative gap but a clear z-score outlier among gaps.
        rng = np.random.default_rng(1)
        base = np.sort(rng.uniform(0, 1.0, 200))
        d = np.concatenate([base, base + 0.12])  # gap 0.12 / span ~2 < 0.15
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        assert vpt._detect_gap(d) is not None


class TestDensityEstimators:
    def test_kde_integrates_to_one(self):
        rng = np.random.default_rng(2)
        sample = rng.normal(0.3, 0.05, 100)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        grid = np.linspace(-0.5, 1.5, 2001)
        f = vpt.estimate_kde(sample, np.ones(100), bandwidth_factor=1.0,
                             eval_points=grid)
        integral = np.trapezoid(f, grid)
        assert integral == pytest.approx(1.0, abs=0.01)

    def test_kde_peaks_at_mode(self):
        sample = np.full(60, 0.3) + np.random.default_rng(3).normal(0, 0.01, 60)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        f = vpt.estimate_kde(sample, np.ones(60),
                             eval_points=np.array([0.3, 0.7]))
        assert f[0] > f[1]

    def test_kde_weighted(self):
        sample = np.array([0.2] * 10 + [0.8] * 10)
        w = np.array([1.0] * 10 + [0.0] * 10)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        f = vpt.estimate_kde(sample, w, eval_points=np.array([0.2, 0.8]))
        assert f[0] > f[1] * 5

    def test_gmm_finds_relevant_component(self):
        # Default init is mu_G - 0.5*sigma_G (vector_probability.py:387-389),
        # so the relevant mode must be within EM's reach of that start.
        rng = np.random.default_rng(4)
        rel = rng.normal(0.42, 0.05, 150)
        bg = rng.normal(0.6, 0.2, 300)
        d = np.concatenate([rel, bg])
        vpt = VectorProbabilityTransform(mu_G=0.6, sigma_G=0.2)
        f = vpt.estimate_gmm(d, eval_points=np.array([0.42, 0.9]))
        assert f[0] > f[1]  # f_R concentrates near the relevant mode

    def test_gmm_respects_weight_init(self):
        rng = np.random.default_rng(5)
        d = np.concatenate([rng.normal(0.25, 0.03, 30),
                            rng.normal(0.7, 0.05, 70)])
        w = np.concatenate([np.ones(30), np.zeros(70)])
        vpt = VectorProbabilityTransform(mu_G=0.7, sigma_G=0.05)
        f = vpt.estimate_gmm(d, w, eval_points=np.array([0.25, 0.7]))
        assert f[0] > f[1]


class TestCalibration:
    def test_close_distances_get_high_probability(self):
        rng = np.random.default_rng(6)
        bg = rng.normal(0.6, 0.1, 2000)
        vpt = VectorProbabilityTransform.fit_background(bg)
        d = np.concatenate([np.full(10, 0.15), np.full(40, 0.62)])
        probs = vpt.calibrate(d)
        assert probs[:10].mean() > probs[10:].mean()
        assert np.all((probs > 0) & (probs < 1))

    def test_scalar_input(self):
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.2)
        out = vpt.calibrate(0.3)
        assert isinstance(out, float)

    def test_base_rate_shifts_logit(self):
        rng = np.random.default_rng(7)
        d = np.concatenate([np.full(8, 0.2), rng.normal(0.6, 0.1, 60)])
        plain = VectorProbabilityTransform(mu_G=0.6, sigma_G=0.1)
        low = VectorProbabilityTransform(mu_G=0.6, sigma_G=0.1, base_rate=0.01)
        p_plain = plain.calibrate(d)
        p_low = low.calibrate(d)
        assert np.all(p_low <= p_plain + 1e-12)

    def test_forced_methods(self):
        rng = np.random.default_rng(8)
        d = rng.normal(0.5, 0.1, 80)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1)
        for method in ("kde", "gmm"):
            out = vpt.calibrate(d, method=method)
            assert out.shape == (80,)
            assert np.all((out > 0) & (out < 1))
        with pytest.raises(ValueError):
            vpt.calibrate(d, method="histogram")

    def test_calibrate_with_sample_decouples(self):
        rng = np.random.default_rng(9)
        sample = np.concatenate([np.full(20, 0.15),
                                 rng.normal(0.6, 0.08, 80)])
        vpt = VectorProbabilityTransform(mu_G=0.6, sigma_G=0.08)
        evals = np.array([0.15, 0.6, 0.9])
        probs = vpt.calibrate_with_sample(evals, sample)
        # The relevant cluster (0.15) calibrates near 1; the background mode
        # (0.6) near 0. The far tail (0.9) may rise slightly again because
        # f_G decays faster than the KDE's f_R — inherent likelihood-ratio
        # behavior shared with the reference.
        assert probs[0] > 0.99
        assert probs[1] < 1e-6
        assert probs[2] < 0.01

    def test_empty_sample_gives_floor(self):
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1)
        out = vpt.calibrate_with_sample(np.array([0.5]), np.array([]))
        assert out[0] < 1e-5

    def test_bm25_weight_guidance(self):
        """BM25-prob weights (smooth, no gap) route through sharpened KDE."""
        rng = np.random.default_rng(10)
        d = rng.uniform(0.2, 0.9, 100)
        w = np.exp(-10 * d)  # favors close distances
        vpt = VectorProbabilityTransform(mu_G=0.55, sigma_G=0.2)
        probs = vpt.calibrate(d, weights=w)
        # closest decile should out-score the farthest decile
        order = np.argsort(d)
        assert probs[order[:10]].mean() > probs[order[-10:]].mean()


class TestDensityPriors:
    def test_ivf_sparse_cells_weighted_up(self):
        assert ivf_density_prior(10, 100.0) > ivf_density_prior(1000, 100.0)
        assert ivf_density_prior(100, 100.0) == pytest.approx(0.5)

    def test_ivf_vectorized(self):
        out = ivf_density_prior(np.array([10, 100, 1000]), 100.0)
        assert out.shape == (3,)
        assert np.all(np.diff(out) < 0)

    def test_knn_sparse_neighborhoods_weighted_up(self):
        assert knn_density_prior(0.9, 0.5) > knn_density_prior(0.1, 0.5)
        assert knn_density_prior(0.5, 0.5) == pytest.approx(0.5)

    def test_gamma_sharpens(self):
        soft = ivf_density_prior(10, 100.0, gamma=0.1)
        sharp = ivf_density_prior(10, 100.0, gamma=10.0)
        assert sharp > soft

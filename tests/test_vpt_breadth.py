"""Vector-calibration breadth: reference helper-level tests not covered
elsewhere (ref tests/test_vector_probability.py). Routing forks and
fallback chains live in tests/test_vpt_routing.py; this file covers the
density primitives (ops/density.py) and the calibration surface."""

import numpy as np
import pytest

from bayesian_bm25_tpu import log_odds_conjunction
from bayesian_bm25_tpu.models.vector_probability import (
    VectorProbabilityTransform,
    ivf_density_prior,
    knn_density_prior,
)
from bayesian_bm25_tpu.ops import density as D


class TestGaussianPDF:
    def test_peak_at_mean(self):
        x = np.linspace(-3, 3, 61)
        p = np.asarray(D.gaussian_pdf(x, 0.0, 1.0))
        assert x[np.argmax(p)] == pytest.approx(0.0, abs=1e-9)

    def test_known_value_standard_normal(self):
        assert float(D.gaussian_pdf(0.0, 0.0, 1.0)) == pytest.approx(
            1.0 / np.sqrt(2 * np.pi), rel=1e-6)

    def test_symmetry(self):
        assert float(D.gaussian_pdf(1.3, 0.0, 1.0)) == pytest.approx(
            float(D.gaussian_pdf(-1.3, 0.0, 1.0)), rel=1e-6)

    def test_array_input(self):
        out = np.asarray(D.gaussian_pdf(np.array([0.0, 1.0, 2.0]), 0.0, 1.0))
        assert out.shape == (3,)
        assert np.all(np.diff(out) < 0)


class TestSilvermanBandwidth:
    def test_positive(self):
        d = np.random.default_rng(0).normal(1.0, 0.3, 100)
        assert float(D.silverman_bandwidth(d)) > 0

    def test_uniform_weights_close_to_unweighted(self):
        d = np.random.default_rng(1).normal(1.0, 0.3, 200)
        h0 = float(D.silverman_bandwidth(d))
        h1 = float(D.silverman_bandwidth(d, np.ones_like(d)))
        assert h1 == pytest.approx(h0, rel=1e-6)

    def test_concentrated_weights_reduce_bandwidth(self):
        """Concentrating mass on few points shrinks K_eff -> wider h per
        point, but concentrating on a narrow cluster shrinks sigma_w."""
        d = np.concatenate([np.full(50, 1.0), np.linspace(0, 3, 50)])
        w_concentrated = np.concatenate([np.ones(50), np.zeros(50) + 1e-12])
        h_c = float(D.silverman_bandwidth(d, w_concentrated))
        h_u = float(D.silverman_bandwidth(d, np.ones(100)))
        assert h_c < h_u  # sigma_w collapses onto the tight cluster


class TestKernelDensity:
    def test_non_negative_and_integrates(self):
        rng = np.random.default_rng(2)
        sample = rng.normal(1.0, 0.2, 200)
        w = np.ones_like(sample)
        grid = np.linspace(-1, 3, 400)
        f = np.asarray(D.kernel_density(grid, sample, w, 0.1))
        assert np.all(f >= 0)
        assert np.trapezoid(f, grid) == pytest.approx(1.0, rel=0.02)

    def test_peak_near_weighted_center(self):
        sample = np.array([0.0, 0.0, 0.0, 2.0])
        w = np.array([1.0, 1.0, 1.0, 0.01])
        grid = np.linspace(-1, 3, 200)
        f = np.asarray(D.kernel_density(grid, sample, w, 0.2))
        assert abs(grid[np.argmax(f)]) < 0.2


class TestSharpenWeights:
    def test_preserves_total_mass(self):
        w = np.array([0.1, 0.5, 0.2, 0.2])
        s = np.asarray(D.sharpen_weights(w, 0.05))
        assert float(np.sum(s)) == pytest.approx(float(np.sum(w)), rel=1e-6)

    def test_increases_contrast(self):
        w = np.array([0.3, 0.7])
        s = np.asarray(D.sharpen_weights(w, 0.05))
        assert s[1] / max(s[0], 1e-30) > w[1] / w[0]

    def test_low_temperature_concentrates(self):
        w = np.array([0.2, 0.3, 0.5])
        hot = np.asarray(D.sharpen_weights(w, 1.0))
        cold = np.asarray(D.sharpen_weights(w, 0.01))
        assert float(np.max(cold)) > float(np.max(hot))


class TestDistanceDensityWeights:
    def test_closer_gets_higher_weight(self):
        d = np.array([0.2, 0.5, 1.0, 2.0])
        w = np.asarray(D.distance_density_weights(d))
        assert np.all(np.diff(w) < 0)

    def test_output_range(self):
        # sigma saturates to exactly 1.0 for d << median (f32 and f64
        # alike), so the bound is closed.
        d = np.random.default_rng(3).uniform(0.01, 5.0, 100)
        w = np.asarray(D.distance_density_weights(d))
        assert np.all((w >= 0) & (w <= 1))

    def test_median_distance_is_half(self):
        d = np.array([1.0, 2.0, 3.0])
        w = np.asarray(D.distance_density_weights(d))
        assert w[1] == pytest.approx(0.5, rel=1e-6)


class TestEstimateSurface:
    def _vpt(self):
        return VectorProbabilityTransform(mu_G=1.0, sigma_G=0.3)

    def test_kde_bandwidth_factor_effect(self):
        vpt = self._vpt()
        rng = np.random.default_rng(4)
        d = rng.normal(0.4, 0.05, 80)
        w = np.ones_like(d)
        f_narrow = np.asarray(vpt.estimate_kde(d, w, bandwidth_factor=0.2))
        f_wide = np.asarray(vpt.estimate_kde(d, w, bandwidth_factor=2.0))
        # Narrow bandwidth -> sharper density: higher peak value
        assert float(np.max(f_narrow)) > float(np.max(f_wide))

    def test_kde_eval_points_supported(self):
        vpt = self._vpt()
        d = np.random.default_rng(5).normal(0.4, 0.05, 60)
        grid = np.linspace(0, 1, 32)
        f = np.asarray(vpt.estimate_kde(d, np.ones_like(d),
                                        eval_points=grid))
        assert f.shape == (32,)
        assert np.all(f >= 0)

    def test_gmm_no_weights_still_works(self):
        vpt = self._vpt()
        d = np.random.default_rng(6).normal(0.4, 0.08, 60)
        f = np.asarray(vpt.estimate_gmm(d))
        assert f.shape == d.shape
        assert np.all(f > 0)

    def test_gmm_eval_points_supported(self):
        vpt = self._vpt()
        d = np.random.default_rng(7).normal(0.4, 0.08, 60)
        grid = np.linspace(0, 1.5, 24)
        f = np.asarray(vpt.estimate_gmm(d, eval_points=grid))
        assert f.shape == (24,)
        assert np.all(f > 0)


class TestLogDensityRatio:
    def _vpt(self):
        return VectorProbabilityTransform(mu_G=1.0, sigma_G=0.3)

    def test_positive_when_f_R_dominates(self):
        vpt = self._vpt()
        d = np.array([0.3])
        f_G = float(D.gaussian_pdf(0.3, 1.0, 0.3))
        out = np.asarray(vpt.log_density_ratio(d, np.array([f_G * 10])))
        assert out[0] > 0

    def test_negative_when_f_G_dominates(self):
        vpt = self._vpt()
        d = np.array([1.0])  # at background mean: f_G is maximal
        f_G = float(D.gaussian_pdf(1.0, 1.0, 0.3))
        out = np.asarray(vpt.log_density_ratio(d, np.array([f_G / 10])))
        assert out[0] < 0

    def test_ratio_one_is_zero(self):
        vpt = self._vpt()
        f_G = float(D.gaussian_pdf(0.7, 1.0, 0.3))
        out = np.asarray(vpt.log_density_ratio(np.array([0.7]),
                                               np.array([f_G])))
        assert out[0] == pytest.approx(0.0, abs=1e-5)


class TestCalibrateSurface:
    def _fitted(self, base_rate=None):
        rng = np.random.default_rng(8)
        corpus_d = rng.normal(1.0, 0.25, 500)
        return VectorProbabilityTransform.fit_background(
            corpus_d, base_rate=base_rate)

    def test_output_range(self):
        vpt = self._fitted()
        rng = np.random.default_rng(9)
        d = np.concatenate([rng.normal(0.3, 0.05, 20),
                            rng.normal(1.0, 0.2, 80)])
        p = np.asarray(vpt.calibrate(d))
        assert np.all((p >= 0) & (p <= 1))

    def test_array_shape_preserved(self):
        vpt = self._fitted()
        d = np.random.default_rng(10).uniform(0.2, 1.5, 37)
        assert np.asarray(vpt.calibrate(d)).shape == (37,)

    def test_base_rate_shifts_output_down(self):
        rng = np.random.default_rng(11)
        d = np.concatenate([rng.normal(0.3, 0.05, 20),
                            rng.normal(1.0, 0.2, 80)])
        p_plain = np.asarray(self._fitted().calibrate(d))
        p_br = np.asarray(self._fitted(base_rate=0.01).calibrate(d))
        assert float(np.mean(p_br)) < float(np.mean(p_plain))


class TestLogOddsConjunctionIntegration:
    def test_calibrated_output_feeds_conjunction(self):
        rng = np.random.default_rng(12)
        corpus_d = rng.normal(1.0, 0.25, 400)
        vpt = VectorProbabilityTransform.fit_background(corpus_d)
        d = np.concatenate([rng.normal(0.3, 0.05, 10),
                            rng.normal(1.0, 0.2, 30)])
        vec_p = np.clip(np.asarray(vpt.calibrate(d)), 1e-6, 1 - 1e-6)
        bm25_p = rng.uniform(0.2, 0.9, len(d))
        fused = log_odds_conjunction(np.stack([bm25_p, vec_p], axis=-1))
        assert fused.shape == (len(d),)
        assert np.all((fused > 0) & (fused < 1))

    def test_agreeing_signals_amplify(self):
        both_high = log_odds_conjunction(np.array([0.8, 0.8]), alpha=0.5)
        assert both_high > 0.8


class TestIVFDensityPrior:
    def test_sparse_cell_high_dense_cell_low(self):
        assert ivf_density_prior(10.0, 100.0) > 0.5
        assert ivf_density_prior(1000.0, 100.0) < 0.5

    def test_average_cell_is_half(self):
        assert float(ivf_density_prior(100.0, 100.0)) == pytest.approx(
            0.5, rel=1e-6)

    def test_gamma_increases_sensitivity(self):
        mild = float(ivf_density_prior(50.0, 100.0, gamma=0.5))
        sharp = float(ivf_density_prior(50.0, 100.0, gamma=4.0))
        assert sharp > mild > 0.5

    def test_array_input(self):
        pops = np.array([10.0, 100.0, 1000.0])
        out = np.asarray(ivf_density_prior(pops, 100.0))
        assert out.shape == (3,)
        assert out[0] > out[1] > out[2]

    def test_scalar_returns_float(self):
        assert isinstance(ivf_density_prior(50.0, 100.0), float)


class TestKNNDensityPrior:
    def test_sparse_neighborhood_high_dense_low(self):
        assert knn_density_prior(2.0, 1.0) > 0.5
        assert knn_density_prior(0.5, 1.0) < 0.5

    def test_median_distance_is_half(self):
        assert float(knn_density_prior(1.0, 1.0)) == pytest.approx(
            0.5, rel=1e-6)

    def test_gamma_effect(self):
        mild = float(knn_density_prior(2.0, 1.0, gamma=0.5))
        sharp = float(knn_density_prior(2.0, 1.0, gamma=4.0))
        assert sharp > mild > 0.5

    def test_array_input(self):
        d = np.array([0.5, 1.0, 2.0])
        out = np.asarray(knn_density_prior(d, 1.0))
        assert out.shape == (3,)
        assert out[0] < out[1] < out[2]

    def test_scalar_returns_float(self):
        assert isinstance(knn_density_prior(2.0, 1.0), float)

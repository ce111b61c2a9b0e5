"""Platt and isotonic calibrator tests: parameter recovery, monotonicity."""

import numpy as np
import pytest

from bayesian_bm25_tpu import IsotonicCalibrator, PlattCalibrator


class TestPlatt:
    def test_recovers_sigmoid_parameters(self):
        rng = np.random.default_rng(0)
        scores = rng.normal(0, 2, 5000)
        true_p = 1 / (1 + np.exp(-(1.5 * scores - 0.7)))
        labels = (rng.uniform(size=5000) < true_p).astype(float)
        cal = PlattCalibrator()
        cal.fit(scores, labels, learning_rate=0.1, max_iterations=5000)
        assert cal.a == pytest.approx(1.5, abs=0.3)
        assert cal.b == pytest.approx(-0.7, abs=0.3)

    def test_calibrate_formula(self):
        cal = PlattCalibrator(a=2.0, b=1.0)
        s = np.array([-1.0, 0.0, 1.0])
        np.testing.assert_allclose(
            cal.calibrate(s), 1 / (1 + np.exp(-(2 * s + 1))), rtol=1e-9
        )

    def test_scalar_and_callable(self):
        cal = PlattCalibrator()
        assert isinstance(cal(0.0), float)
        assert cal(0.0) == pytest.approx(0.5)

    def test_monotone(self):
        cal = PlattCalibrator(a=0.5, b=0.0)
        out = cal.calibrate(np.linspace(-5, 5, 20))
        assert np.all(np.diff(out) > 0)


class TestIsotonic:
    def test_requires_fit(self):
        with pytest.raises(RuntimeError):
            IsotonicCalibrator().calibrate(0.5)

    def test_monotone_output(self):
        rng = np.random.default_rng(1)
        scores = rng.normal(0, 1, 500)
        p = 1 / (1 + np.exp(-2 * scores))
        labels = (rng.uniform(size=500) < p).astype(float)
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        out = cal.calibrate(np.linspace(-3, 3, 100))
        assert np.all(np.diff(out) >= -1e-12)

    def test_pava_pools_violators(self):
        # Decreasing labels on increasing scores must pool to one block.
        scores = np.array([1.0, 2.0, 3.0])
        labels = np.array([1.0, 0.0, 0.0])
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        out = cal.calibrate(scores)
        np.testing.assert_allclose(out, 1 / 3, rtol=1e-9)

    def test_perfectly_separable(self):
        scores = np.array([0.0, 1.0, 2.0, 3.0])
        labels = np.array([0.0, 0.0, 1.0, 1.0])
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        assert cal.calibrate(0.0) <= 1e-9
        assert cal.calibrate(3.0) >= 1 - 1e-9

    def test_interpolation_between_blocks(self):
        scores = np.array([0.0, 0.0, 2.0, 2.0])
        labels = np.array([0.0, 0.0, 1.0, 1.0])
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        assert cal.calibrate(1.0) == pytest.approx(0.5, abs=1e-9)

    def test_extrapolation_clamps_to_endpoints(self):
        scores = np.array([1.0, 2.0, 3.0, 4.0])
        labels = np.array([0.0, 0.0, 1.0, 1.0])
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        assert cal.calibrate(-100.0) == pytest.approx(cal.calibrate(1.0), abs=1e-9)
        assert cal.calibrate(100.0) == pytest.approx(cal.calibrate(4.0), abs=1e-9)

    def test_ties_in_scores(self):
        # All-equal scores pool into tied breakpoints; a query at the tie
        # resolves to the first block (searchsorted side='left' semantics,
        # matching reference calibration.py:205-221).
        scores = np.array([1.0, 1.0, 1.0, 1.0])
        labels = np.array([0.0, 1.0, 1.0, 0.0])
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        assert cal.calibrate(1.0) == pytest.approx(0.0, abs=1e-9)
        # Off-tie queries clamp to endpoint blocks.
        assert cal.calibrate(2.0) == pytest.approx(2.0 / 3.0, abs=1e-9)

    def test_improves_ece_on_miscalibrated_scores(self):
        from bayesian_bm25_tpu import expected_calibration_error

        rng = np.random.default_rng(2)
        scores = rng.uniform(0, 1, 2000)
        true_p = scores ** 3  # heavily miscalibrated if read as probability
        labels = (rng.uniform(size=2000) < true_p).astype(float)
        before = expected_calibration_error(scores, labels)
        cal = IsotonicCalibrator()
        cal.fit(scores, labels)
        after = expected_calibration_error(np.asarray(cal.calibrate(scores)), labels)
        assert after < before

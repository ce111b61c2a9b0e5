"""Calibration metric tests: perfect/worst/constant cases + bin semantics."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    brier_score,
    calibration_report,
    expected_calibration_error,
    log_loss,
    reliability_diagram,
)


class TestECE:
    def test_perfect_calibration(self):
        # Within each bin, mean prediction equals empirical rate.
        probs = np.array([0.25] * 4 + [0.75] * 4)
        labels = np.array([1, 0, 0, 0, 1, 1, 1, 0], dtype=float)
        assert expected_calibration_error(probs, labels) == pytest.approx(0.0, abs=1e-12)

    def test_worst_calibration(self):
        probs = np.array([0.999] * 100)
        labels = np.zeros(100)
        assert expected_calibration_error(probs, labels) == pytest.approx(0.999, abs=1e-3)

    def test_constant_half(self):
        rng = np.random.default_rng(0)
        labels = rng.integers(0, 2, 10000).astype(float)
        probs = np.full(10000, 0.5)
        ece = expected_calibration_error(probs, labels)
        assert ece == pytest.approx(abs(0.5 - labels.mean()), abs=1e-9)

    def test_first_bin_closed(self):
        # p = 0.0 must land in the first bin, not be dropped.
        probs = np.array([0.0, 0.05])
        labels = np.array([0.0, 0.0])
        ece = expected_calibration_error(probs, labels)
        assert ece == pytest.approx(0.025, abs=1e-9)

    def test_bin_edge_right_inclusive(self):
        # p = 0.1 belongs to bin (0, 0.1]; p = 0.10001 to the next.
        probs = np.array([0.1, 0.1])
        labels = np.array([0.0, 0.0])
        assert expected_calibration_error(probs, labels, n_bins=10) == pytest.approx(0.1)


class TestBrierLogLoss:
    def test_brier_perfect(self):
        assert brier_score(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == 0.0

    def test_brier_formula(self):
        p = np.array([0.8, 0.3])
        y = np.array([1.0, 0.0])
        assert brier_score(p, y) == pytest.approx(np.mean((p - y) ** 2))

    def test_log_loss_perfect(self):
        assert log_loss(np.array([1.0, 0.0]), np.array([1.0, 0.0])) == pytest.approx(
            0.0, abs=1e-12
        )

    def test_log_loss_clipping(self):
        # Confident wrong prediction is finite thanks to eps clipping.
        assert np.isfinite(log_loss(np.array([0.0]), np.array([1.0])))

    def test_log_loss_formula(self):
        p = np.array([0.7, 0.2])
        y = np.array([1.0, 0.0])
        expected = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
        assert log_loss(p, y) == pytest.approx(expected, rel=1e-9)


class TestReliability:
    def test_skips_empty_bins(self):
        probs = np.array([0.05, 0.95])
        labels = np.array([0.0, 1.0])
        bins = reliability_diagram(probs, labels)
        assert len(bins) == 2
        assert bins[0][2] == 1 and bins[1][2] == 1

    def test_bin_averages(self):
        probs = np.array([0.2, 0.15, 0.9])
        labels = np.array([0.0, 1.0, 1.0])
        bins = reliability_diagram(probs, labels)
        # first non-empty bin: (0.1, 0.2] holds both 0.2 and 0.15
        avg_pred, avg_actual, count = bins[0]
        assert count == 2
        assert avg_pred == pytest.approx(0.175)
        assert avg_actual == pytest.approx(0.5)


class TestReport:
    def test_report_fields_and_summary(self):
        rng = np.random.default_rng(1)
        probs = rng.uniform(0, 1, 200)
        labels = (rng.uniform(size=200) < probs).astype(float)
        rep = calibration_report(probs, labels)
        assert rep.n_samples == 200
        assert rep.n_bins == 10
        assert rep.ece == pytest.approx(
            expected_calibration_error(probs, labels), abs=1e-12
        )
        text = rep.summary()
        assert "ECE" in text and "Brier" in text and "Reliability" in text

"""Calibrating neural reranker scores with Platt / isotonic regression."""

import numpy as np

from bayesian_bm25_tpu import (
    IsotonicCalibrator,
    PlattCalibrator,
    expected_calibration_error,
    log_odds_conjunction,
)

rng = np.random.default_rng(0)
n = 4000
raw = rng.normal(0, 2, n)
true_p = (1 / (1 + np.exp(-raw))) ** 2.5  # miscalibrated but monotone
labels = (rng.uniform(size=n) < true_p).astype(float)

naive = 1 / (1 + np.exp(-raw))
print(f"naive sigmoid ECE: {expected_calibration_error(naive, labels):.4f}")

platt = PlattCalibrator()
platt.fit(raw, labels, learning_rate=0.1, max_iterations=2000)
p_platt = np.asarray(platt(raw))
print(f"Platt ECE:         "
      f"{expected_calibration_error(p_platt, labels):.4f} "
      f"(a={platt.a:.3f}, b={platt.b:.3f})")

iso = IsotonicCalibrator()
iso.fit(raw, labels)
p_iso = np.asarray(iso.calibrate(raw))
print(f"isotonic ECE:      {expected_calibration_error(p_iso, labels):.4f}")

# Calibrated probabilities are safe to fuse with BM25 probabilities.
bm25_p = np.clip(0.5 + (labels - 0.5) * 0.4 + rng.normal(0, 0.15, n),
                 0.01, 0.99)
fused = log_odds_conjunction(
    np.column_stack([bm25_p, np.clip(p_iso, 1e-6, 1 - 1e-6)]))
print(f"\nfused (BM25 + calibrated neural) ECE: "
      f"{expected_calibration_error(np.asarray(fused), labels):.4f}")

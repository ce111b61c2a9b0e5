"""Neural score calibration: Platt vs isotonic accuracy, hybrid fusion
quality with calibrated neural scores, timing
(reference: benchmarks/neural_calibration.py).

Usage: python benchmarks/neural_calibration.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    IsotonicCalibrator,
    PlattCalibrator,
    brier_score,
    expected_calibration_error,
    log_odds_conjunction,
)
from benchmarks.common import print_table, timer  # noqa: E402


def neural_scores(rng, n, monotone_distortion):
    """Raw model scores whose P(label) is a distorted monotone function."""
    scores = rng.normal(0, 2.0, n)
    p = 1.0 / (1.0 + np.exp(-scores))
    p = p ** monotone_distortion  # miscalibrated but monotone
    labels = (rng.uniform(size=n) < p).astype(float)
    return scores, labels


def main():
    rng = np.random.default_rng(0)

    rows = []
    for distortion in (1.0, 2.0, 4.0):
        tr_s, tr_y = neural_scores(rng, 6000, distortion)
        te_s, te_y = neural_scores(rng, 3000, distortion)

        platt = PlattCalibrator()
        platt.fit(tr_s, tr_y, learning_rate=0.1, max_iterations=3000)
        p_platt = np.asarray(platt(te_s))

        iso = IsotonicCalibrator()
        iso.fit(tr_s, tr_y)
        p_iso = np.asarray(iso.calibrate(te_s))

        rows.append((
            distortion,
            expected_calibration_error(p_platt, te_y),
            expected_calibration_error(p_iso, te_y),
            brier_score(p_platt, te_y),
            brier_score(p_iso, te_y),
        ))
    print_table("Calibration quality (sigmoid^k distortion)", rows,
                ("distortion", "Platt ECE", "Isotonic ECE",
                 "Platt Brier", "Isotonic Brier"))

    # --- hybrid fusion with calibrated neural signal -----------------------
    tr_s, tr_y = neural_scores(rng, 6000, 3.0)
    te_s, te_y = neural_scores(rng, 3000, 3.0)
    bm25_prob = np.clip(0.5 + (te_y - 0.5) * 0.4 +
                        rng.normal(0, 0.15, len(te_y)), 0.01, 0.99)

    platt = PlattCalibrator()
    platt.fit(tr_s, tr_y, learning_rate=0.1, max_iterations=3000)
    iso = IsotonicCalibrator()
    iso.fit(tr_s, tr_y)

    raw_prob = 1.0 / (1.0 + np.exp(-te_s))
    rows = []
    for name, neural_p in (
        ("raw sigmoid", raw_prob),
        ("Platt", np.asarray(platt(te_s))),
        ("isotonic", np.asarray(iso.calibrate(te_s))),
    ):
        fused = np.asarray(log_odds_conjunction(
            np.column_stack([bm25_prob, np.clip(neural_p, 1e-6, 1 - 1e-6)])))
        rows.append((name, brier_score(fused, te_y),
                     expected_calibration_error(fused, te_y)))
    print_table("Hybrid fusion with neural signal", rows,
                ("neural calibration", "fused Brier", "fused ECE"))

    # --- timing -------------------------------------------------------------
    t_platt_fit, _ = timer(lambda: PlattCalibrator().fit(
        tr_s, tr_y, max_iterations=1000), reps=2)
    iso2 = IsotonicCalibrator()
    t_iso_fit, _ = timer(lambda: iso2.fit(tr_s, tr_y), reps=2)
    t_platt_eval, _ = timer(lambda: platt(te_s), reps=5)
    t_iso_eval, _ = timer(lambda: iso.calibrate(te_s), reps=5)
    print_table("Timing", [
        ("Platt", round(t_platt_fit * 1000, 1), round(t_platt_eval * 1000, 2)),
        ("Isotonic", round(t_iso_fit * 1000, 1), round(t_iso_eval * 1000, 2)),
    ], ("calibrator", "fit ms", "eval ms"))


if __name__ == "__main__":
    main()

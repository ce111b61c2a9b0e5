"""Online-learning convergence: epochs of online updates needed to match
batch-fit calibration; raw vs Polyak-averaged parameters
(reference: benchmarks/convergence.py).

Usage: python benchmarks/convergence.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    BayesianProbabilityTransform,
    expected_calibration_error,
)
from benchmarks.common import print_table, sigmoid_label_data  # noqa: E402


def ece_of(transform, scores, labels, averaged=False):
    a = transform.averaged_alpha if averaged else transform.alpha
    b = transform.averaged_beta if averaged else transform.beta
    probs = 1.0 / (1.0 + np.exp(-a * (scores - b)))
    return expected_calibration_error(probs, labels)


def main():
    rng = np.random.default_rng(0)
    train_s, train_y = sigmoid_label_data(rng, 4000)
    test_s, test_y = sigmoid_label_data(rng, 2000)

    batch = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
    batch.fit(train_s, train_y, learning_rate=0.1, max_iterations=5000)
    batch_ece = ece_of(batch, test_s, test_y)
    print(f"batch fit: alpha={batch.alpha:.3f} beta={batch.beta:.3f} "
          f"test ECE={batch_ece:.4f}")

    online = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
    rows = []
    order = np.arange(len(train_s))
    epoch = 0
    batch_size = 16
    for epoch in range(1, 21):
        rng.shuffle(order)
        for lo in range(0, len(order), batch_size):
            sel = order[lo:lo + batch_size]
            online.update(train_s[sel], train_y[sel], learning_rate=0.1)
        raw = ece_of(online, test_s, test_y)
        avg = ece_of(online, test_s, test_y, averaged=True)
        rows.append((epoch, round(online.alpha, 3), round(online.beta, 3),
                     raw, avg))
        if raw <= batch_ece * 1.05:
            break

    print_table(
        "Online convergence (mini-batch 16)",
        rows, ("epoch", "alpha", "beta", "ECE raw", "ECE averaged"),
    )
    print(f"\nonline reached within 5% of batch ECE after {epoch} epoch(s)"
          if rows[-1][3] <= batch_ece * 1.05 else
          "\nonline did not reach batch ECE within 20 epochs")


if __name__ == "__main__":
    main()

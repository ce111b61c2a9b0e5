"""Weighted vs uniform log-odds fusion across noise scenarios
(reference: benchmarks/weighted_fusion.py).

Usage: python benchmarks/weighted_fusion.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import LearnableLogOddsWeights, log_odds_conjunction  # noqa: E402
from benchmarks.common import print_table  # noqa: E402


def scenario(rng, m, kind):
    labels = rng.integers(0, 2, m).astype(float)

    def sig(strength, noise):
        return np.clip(0.5 + (labels - 0.5) * strength +
                       rng.normal(0, noise, m), 0.01, 0.99)

    if kind == "balanced":
        probs = np.column_stack([sig(0.5, 0.1), sig(0.5, 0.1)])
    elif kind == "one noisy":
        probs = np.column_stack([sig(0.6, 0.08), sig(0.1, 0.3)])
    elif kind == "one inverted":
        inv = np.clip(0.5 - (labels - 0.5) * 0.2 + rng.normal(0, 0.1, m),
                      0.01, 0.99)
        probs = np.column_stack([sig(0.6, 0.08), inv])
    else:  # three mixed
        probs = np.column_stack([sig(0.7, 0.05), sig(0.3, 0.2),
                                 sig(0.05, 0.3)])
    return probs, labels


def bce(p, y):
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))


def main():
    rng = np.random.default_rng(0)
    rows = []
    for kind in ("balanced", "one noisy", "one inverted", "three mixed"):
        probs, labels = scenario(rng, 5000, kind)
        te_p, te_y = scenario(rng, 2500, kind)
        n = probs.shape[1]
        uniform = np.asarray(log_odds_conjunction(
            te_p, alpha=0.0, weights=np.full(n, 1 / n)))
        lw = LearnableLogOddsWeights(n)
        lw.fit(probs, labels, learning_rate=0.5, max_iterations=2000)
        learned = np.asarray(lw(te_p))
        rows.append((kind, bce(uniform, te_y), bce(learned, te_y),
                     np.array2string(np.round(lw.weights, 2), separator=",")))
    print_table("Weighted vs uniform fusion (test BCE)", rows,
                ("scenario", "uniform BCE", "learned BCE", "weights"))


if __name__ == "__main__":
    main()

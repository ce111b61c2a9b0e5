"""Gating function comparison: fusion quality per gate, beta sensitivity,
timing overhead (reference: benchmarks/gating_functions.py).

Usage: python benchmarks/gating_functions.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import log_odds_conjunction  # noqa: E402
from benchmarks.common import print_table, timer  # noqa: E402


def sparse_signal_data(rng, m):
    """One informative signal; the second is silent (0.5) for most samples
    and weakly negative otherwise — the regime sparse gating targets."""
    labels = rng.integers(0, 2, m).astype(float)
    s1 = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.1, m), 0.01, 0.99)
    silent = rng.uniform(size=m) < 0.7
    s2 = np.where(silent, 0.5 + rng.normal(0, 0.02, m),
                  np.clip(0.45 - (labels - 0.5) * 0.1 +
                          rng.normal(0, 0.15, m), 0.01, 0.99))
    return np.column_stack([s1, np.clip(s2, 0.01, 0.99)]), labels


def bce(p, y):
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))


def main():
    rng = np.random.default_rng(0)
    probs, labels = sparse_signal_data(rng, 5000)

    rows = []
    for gate in ("none", "relu", "swish", "gelu", "softplus"):
        fused = np.asarray(log_odds_conjunction(probs, gating=gate))
        auc_proxy = float(np.mean(fused[labels > 0]) -
                          np.mean(fused[labels <= 0]))
        rows.append((gate, bce(fused, labels), auc_proxy))
    print_table("Gate comparison (sparse second signal)", rows,
                ("gate", "BCE", "mean margin"))

    rows = []
    for beta in (0.5, 1.0, 2.0, 4.0, 8.0):
        sw = np.asarray(log_odds_conjunction(probs, gating="swish",
                                             gating_beta=beta))
        sp = np.asarray(log_odds_conjunction(probs, gating="softplus",
                                             gating_beta=beta))
        rows.append((beta, bce(sw, labels), bce(sp, labels)))
    print_table("Beta sensitivity", rows, ("beta", "swish BCE",
                                           "softplus BCE"))

    rows = []
    for gate in ("none", "relu", "swish", "gelu", "softplus"):
        t, _ = timer(lambda: log_odds_conjunction(probs, gating=gate), reps=5)
        rows.append((gate, round(t * 1000, 2)))
    print_table("Timing (5000x2 fusion)", rows, ("gate", "ms"))


if __name__ == "__main__":
    main()

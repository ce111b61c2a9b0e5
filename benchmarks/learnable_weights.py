"""Learnable log-odds weights: oracle weight recovery, fusion quality,
online convergence, timing (reference: benchmarks/learnable_weights.py).

Usage: python benchmarks/learnable_weights.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import LearnableLogOddsWeights, log_odds_conjunction  # noqa: E402
from benchmarks.common import print_table, timer  # noqa: E402


def make_signals(rng, m, reliabilities):
    """Signals with different label correlation; returns (probs, labels)."""
    labels = rng.integers(0, 2, m).astype(float)
    cols = []
    for rel in reliabilities:
        informative = 0.5 + (labels - 0.5) * rel
        noise = rng.normal(0, 0.12, m)
        cols.append(np.clip(informative + noise, 0.01, 0.99))
    return np.column_stack(cols), labels


def main():
    rng = np.random.default_rng(0)

    # --- weight recovery vs oracle reliability -----------------------------
    rows = []
    for rels in ([0.8, 0.2], [0.7, 0.4, 0.1], [0.8, 0.6, 0.4, 0.2, 0.05]):
        probs, labels = make_signals(rng, 4000, rels)
        lw = LearnableLogOddsWeights(len(rels))
        lw.fit(probs, labels, learning_rate=0.5, max_iterations=3000)
        order_learned = np.argsort(-lw.weights)
        order_oracle = np.argsort(-np.asarray(rels))
        rows.append((
            len(rels),
            np.array2string(np.round(lw.weights, 3), separator=","),
            bool((order_learned == order_oracle).all()),
        ))
    print_table("Weight recovery (descending reliability order)", rows,
                ("signals", "learned weights", "order matches oracle"))

    # --- fusion quality: learned vs uniform --------------------------------
    rows = []
    for rels in ([0.8, 0.1], [0.7, 0.5, 0.05]):
        probs, labels = make_signals(rng, 4000, rels)
        test_p, test_y = make_signals(rng, 2000, rels)
        lw = LearnableLogOddsWeights(len(rels))
        lw.fit(probs, labels, learning_rate=0.5, max_iterations=3000)
        learned = np.asarray(lw(test_p))
        uniform = np.asarray(log_odds_conjunction(test_p, alpha=0.0,
                                                  weights=np.full(len(rels),
                                                                  1 / len(rels))))
        mse_l = float(np.mean((learned - test_y) ** 2))
        mse_u = float(np.mean((uniform - test_y) ** 2))
        rows.append((len(rels), mse_l, mse_u, mse_u / max(mse_l, 1e-12)))
    print_table("Fusion MSE: learned vs uniform weights", rows,
                ("signals", "learned MSE", "uniform MSE", "improvement x"))

    # --- online convergence -------------------------------------------------
    probs, labels = make_signals(rng, 3000, [0.8, 0.1])
    lw_online = LearnableLogOddsWeights(2)
    checkpoints = []
    for i in range(len(labels)):
        lw_online.update(probs[i], labels[i], learning_rate=0.5)
        if (i + 1) in (100, 500, 1000, 3000):
            checkpoints.append(((i + 1),
                                round(float(lw_online.weights[0]), 3),
                                round(float(lw_online.averaged_weights[0]), 3)))
    print_table("Online convergence (weight on the reliable signal)",
                checkpoints, ("updates", "raw w0", "averaged w0"))

    # --- timing -------------------------------------------------------------
    rows = []
    for n_sig in (2, 3, 5):
        probs, labels = make_signals(rng, 4000, [0.5] * n_sig)
        lw = LearnableLogOddsWeights(n_sig)
        t_fit, _ = timer(lambda: lw.fit(probs, labels, max_iterations=500),
                         reps=2)
        t_fwd, _ = timer(lambda: lw(probs), reps=5)
        rows.append((n_sig, round(t_fit * 1000, 1), round(t_fwd * 1000, 2)))
    print_table("Timing", rows, ("signals", "fit(500 iter) ms", "forward ms"))


if __name__ == "__main__":
    main()

"""Shared helpers for the benchmark scripts: labeled synthetic score data,
threshold-transfer F1, timing."""

from __future__ import annotations

import time

import numpy as np


def timer(fn, *args, reps: int = 3, **kwargs):
    """(best wall seconds, last result)."""
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        best = min(best, time.perf_counter() - t0)
    return best, out


def sigmoid_label_data(rng, n: int, alpha: float = 1.5, beta: float = 2.0,
                       score_mu: float = 2.0, score_sigma: float = 2.0):
    """Scores ~ N(mu, sigma); labels ~ Bernoulli(sigma(alpha(s - beta)))."""
    scores = rng.normal(score_mu, score_sigma, n)
    p = 1.0 / (1.0 + np.exp(-alpha * (scores - beta)))
    labels = (rng.uniform(size=n) < p).astype(np.float64)
    return scores, labels


def f1_at_threshold(probs, labels, threshold: float) -> float:
    pred = probs >= threshold
    tp = float(np.sum(pred & (labels > 0)))
    fp = float(np.sum(pred & (labels <= 0)))
    fn = float(np.sum(~pred & (labels > 0)))
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)


def best_threshold_f1(probs, labels):
    """(best threshold, best F1) over a 99-point grid."""
    best_t, best_f = 0.5, 0.0
    for t in np.linspace(0.01, 0.99, 99):
        f = f1_at_threshold(probs, labels, t)
        if f > best_f:
            best_t, best_f = float(t), f
    return best_t, best_f


def threshold_transfer(train_probs, train_labels, test_probs, test_labels):
    """Learn the F1-optimal threshold on train, apply to test
    (benchmarks/calibration.py protocol)."""
    t, train_f1 = best_threshold_f1(train_probs, train_labels)
    return {
        "threshold": t,
        "train_f1": train_f1,
        "test_f1": f1_at_threshold(test_probs, test_labels, t),
    }


def print_table(title: str, rows: list[tuple], headers: tuple) -> None:
    print(f"\n=== {title} ===")
    widths = [max(len(str(h)), max((len(f"{r[i]:.4f}" if isinstance(r[i], float)
                                        else str(r[i])) for r in rows),
                                   default=0))
              for i, h in enumerate(headers)]
    print("  " + "  ".join(str(h).ljust(w) for h, w in zip(headers, widths)))
    for r in rows:
        cells = [f"{v:.4f}" if isinstance(v, float) else str(v) for v in r]
        print("  " + "  ".join(c.ljust(w) for c, w in zip(cells, widths)))

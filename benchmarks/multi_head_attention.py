"""Multi-head attention fusion: quality vs single head, pruning
safety/efficiency, head diversity
(reference: benchmarks/multi_head_attention.py).

Usage: python benchmarks/multi_head_attention.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    AttentionLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from benchmarks.common import print_table  # noqa: E402


def query_dependent_data(rng, m):
    """Feature f selects which signal is informative."""
    f = rng.choice([-1.0, 1.0], m)
    labels = rng.integers(0, 2, m).astype(float)
    inf = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.08, m),
                  0.01, 0.99)
    noise = rng.uniform(0.05, 0.95, m)
    s0 = np.where(f > 0, inf, noise)
    s1 = np.where(f > 0, noise, inf)
    probs = np.column_stack([s0, s1])
    qf = np.column_stack([f, rng.normal(0, 1, m), np.ones(m)])
    return probs, labels, qf


def bce(p, y):
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))


def main():
    rng = np.random.default_rng(0)
    probs, labels, qf = query_dependent_data(rng, 6000)
    te_p, te_y, te_qf = query_dependent_data(rng, 3000)

    rows = []
    single = AttentionLogOddsWeights(2, 3, seed=0)
    single.fit(probs, labels, qf, learning_rate=0.2, max_iterations=1000)
    rows.append(("1 head", bce(np.asarray(single(te_p, te_qf)), te_y)))
    for n_heads in (2, 4, 8):
        mh = MultiHeadAttentionLogOddsWeights(n_heads, 2, 3)
        mh.fit(probs, labels, qf, learning_rate=0.2, max_iterations=1000)
        rows.append((f"{n_heads} heads",
                     bce(np.asarray(mh(te_p, te_qf)), te_y)))
    print_table("Fusion quality (test BCE)", rows, ("model", "BCE"))

    # --- pruning safety + efficiency ---------------------------------------
    mh = MultiHeadAttentionLogOddsWeights(4, 2, 3)
    mh.fit(probs, labels, qf, learning_rate=0.2, max_iterations=500)
    full = np.asarray(mh(te_p, te_qf))
    rows = []
    for pct in (50, 70, 90):
        threshold = float(np.percentile(full, pct))
        surviving, fused = mh.prune(te_p, te_qf, threshold)
        should = np.where(full >= threshold)[0]
        safe = set(should).issubset(set(surviving.tolist()))
        exact = np.allclose(fused, full[surviving], rtol=1e-9)
        rows.append((pct, threshold, len(surviving), len(te_p),
                     round(1 - len(surviving) / len(te_p), 3), safe and exact))
    print_table("Pruning at fused-probability thresholds", rows,
                ("pctile", "threshold", "survivors", "total",
                 "pruned frac", "safe+exact"))

    # --- head diversity -----------------------------------------------------
    rows = []
    mats = [h.weights_matrix.flatten() for h in mh.heads]
    for i in range(len(mats)):
        for j in range(i + 1, len(mats)):
            cos = float(np.dot(mats[i], mats[j]) /
                        (np.linalg.norm(mats[i]) * np.linalg.norm(mats[j])))
            rows.append((f"head{i} vs head{j}", round(cos, 3)))
    print_table("Head diversity (cosine of weight matrices)", rows,
                ("pair", "cosine"))


if __name__ == "__main__":
    main()

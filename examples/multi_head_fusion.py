"""Multi-head attention fusion with exact pruning."""

import numpy as np

from bayesian_bm25_tpu import MultiHeadAttentionLogOddsWeights

rng = np.random.default_rng(0)
m = 3000

# Query feature decides which signal to trust.
f = rng.choice([-1.0, 1.0], m)
labels = rng.integers(0, 2, m).astype(float)
informative = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.08, m),
                      0.01, 0.99)
noise = rng.uniform(0.05, 0.95, m)
probs = np.column_stack([np.where(f > 0, informative, noise),
                         np.where(f > 0, noise, informative)])
qf = np.column_stack([f, np.ones(m)])

mh = MultiHeadAttentionLogOddsWeights(n_heads=4, n_signals=2,
                                      n_query_features=2)
mh.fit(probs, labels, qf, learning_rate=0.2, max_iterations=800)

for feat in ([1.0, 1.0], [-1.0, 1.0]):
    w = np.mean([h._compute_weights(np.array([feat]))[0] for h in mh.heads],
                axis=0)
    print(f"query feature {feat}: mean head weights = {w.round(3)}")

test = rng.uniform(0.05, 0.95, (200, 2))
test_qf = np.column_stack([rng.choice([-1.0, 1.0], 200), np.ones(200)])
fused = mh(test, test_qf)
threshold = float(np.percentile(fused, 80))
surviving, pruned_probs = mh.prune(test, test_qf, threshold)
print(f"\npruning at P >= {threshold:.3f}: kept {len(surviving)}/200 "
      "candidates")
print("pruning is exact:",
      bool(np.allclose(pruned_probs, fused[surviving])))

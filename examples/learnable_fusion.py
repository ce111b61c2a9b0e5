"""Learnable per-signal reliability weights for fusion."""

import numpy as np

from bayesian_bm25_tpu import LearnableLogOddsWeights

rng = np.random.default_rng(0)
m = 3000
labels = rng.integers(0, 2, m).astype(float)

# Signal 0 is reliable, signal 1 mediocre, signal 2 is pure noise.
s0 = np.clip(0.5 + (labels - 0.5) * 0.7 + rng.normal(0, 0.08, m), 0.01, 0.99)
s1 = np.clip(0.5 + (labels - 0.5) * 0.3 + rng.normal(0, 0.15, m), 0.01, 0.99)
s2 = rng.uniform(0.01, 0.99, m)
probs = np.column_stack([s0, s1, s2])

weights = LearnableLogOddsWeights(n_signals=3)
print(f"initial weights (Naive Bayes uniform): {weights.weights.round(3)}")

weights.fit(probs, labels, learning_rate=0.5, max_iterations=3000)
print(f"learned weights:                       {weights.weights.round(3)}")

sample = np.array([0.9, 0.6, 0.1])
print(f"\nfused P for signals {sample}: {weights(sample):.4f}")

print("\nOnline updates continue refining:")
for i in range(500):
    row = rng.integers(0, m)
    weights.update(probs[row], labels[row], learning_rate=0.3)
print(f"after 500 online updates: {weights.weights.round(3)}")
print(f"Polyak-averaged weights:  {weights.averaged_weights.round(3)}")

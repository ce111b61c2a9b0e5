"""Temporal adaptation: recent feedback outweighs stale feedback."""

import numpy as np

from bayesian_bm25_tpu import TemporalBayesianTransform

rng = np.random.default_rng(0)

# Regime shift: relevance midpoint moves from beta=-1 (old) to beta=+2 (new)
n = 3000
scores = rng.normal(0.5, 2.0, n)
old = (rng.uniform(size=n // 2) <
       1 / (1 + np.exp(-2 * (scores[: n // 2] + 1)))).astype(float)
new = (rng.uniform(size=n // 2) <
       1 / (1 + np.exp(-2 * (scores[n // 2:] - 2)))).astype(float)
labels = np.concatenate([old, new])
timestamps = np.arange(n, dtype=float)

for half_life in (100.0, 1000.0, 1e9):
    t = TemporalBayesianTransform(decay_half_life=half_life)
    t.fit(scores, labels, timestamps=timestamps,
          learning_rate=0.1, max_iterations=3000)
    print(f"half_life={half_life:>9.0f}: alpha={t.alpha:.3f} "
          f"beta={t.beta:+.3f}")

print("\ntarget of the NEW regime: beta=+2. Short half-lives track it;"
      "\nan effectively infinite half-life averages both regimes.")

print("\nOnline updates shrink the Polyak decay over time:")
t = TemporalBayesianTransform(decay_half_life=200.0)
for i in range(5):
    t.update(2.0, 1.0)
print(f"after 5 updates: timestamp={t.timestamp} "
      f"averaged_beta={t.averaged_beta:.4f}")

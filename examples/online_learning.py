"""Online learning from click feedback: update() adapts alpha/beta."""

import numpy as np

from bayesian_bm25_tpu import BayesianProbabilityTransform

rng = np.random.default_rng(0)
transform = BayesianProbabilityTransform(alpha=0.5, beta=0.0)

# The "true" relevance process has alpha=1.5, beta=4 — feedback slowly
# reveals it.
true_alpha, true_beta = 1.5, 4.0
print(f"start: alpha={transform.alpha:.3f} beta={transform.beta:.3f}")
for step in range(2000):
    score = rng.normal(4.0, 2.5)
    p = 1 / (1 + np.exp(-true_alpha * (score - true_beta)))
    label = float(rng.uniform() < p)
    transform.update(score, label, learning_rate=0.05)
    if (step + 1) % 500 == 0:
        print(f"after {step+1:4d} updates: alpha={transform.alpha:.3f} "
              f"beta={transform.beta:.3f}  "
              f"(averaged: {transform.averaged_alpha:.3f}, "
              f"{transform.averaged_beta:.3f})")

print(f"\ntarget: alpha={true_alpha} beta={true_beta}")
print("Polyak-averaged parameters move smoothly — use them for serving "
      "while raw parameters keep learning.")

"""Basic probability transform: score -> likelihood -> prior -> posterior."""

import numpy as np

from bayesian_bm25_tpu import BayesianProbabilityTransform

transform = BayesianProbabilityTransform(alpha=1.0, beta=5.0, base_rate=0.01)

print("Single score:")
score, tf, dlr = 8.2, 3.0, 0.9
print(f"  likelihood({score}) = {transform.likelihood(score):.4f}")
print(f"  tf_prior({tf}) = {transform.tf_prior(tf):.4f}")
print(f"  norm_prior({dlr}) = {transform.norm_prior(dlr):.4f}")
print(f"  composite_prior = {transform.composite_prior(tf, dlr):.4f}")
print(f"  P(relevant) = {transform.score_to_probability(score, tf, dlr):.4f}")

print("\nBatch of scores:")
scores = np.array([2.0, 5.0, 8.0, 12.0])
tfs = np.array([1.0, 2.0, 4.0, 8.0])
dlrs = np.array([1.2, 0.9, 0.6, 0.5])
probs = transform.score_to_probability(scores, tfs, dlrs)
for s, p in zip(scores, probs):
    print(f"  score {s:5.1f} -> P = {p:.4f}")

print("\nWithout base rate (prior-only posterior):")
plain = BayesianProbabilityTransform(alpha=1.0, beta=5.0)
print(f"  P(relevant | score=8.2) = "
      f"{plain.score_to_probability(score, tf, dlr):.4f}")

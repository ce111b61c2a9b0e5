"""Probabilistic NOT: excluding a topic in log-odds space."""

import numpy as np

from bayesian_bm25_tpu import log_odds_conjunction, prob_not

# P(doc is about python) and P(doc is about snakes) per document
python_probs = np.array([0.9, 0.8, 0.3, 0.7])
snake_probs = np.array([0.1, 0.85, 0.2, 0.75])

# Query: python AND NOT snakes
not_snake = np.asarray(prob_not(snake_probs))
fused = np.asarray(log_odds_conjunction(
    np.column_stack([python_probs, not_snake])))

print("doc  P(python)  P(snake)  P(NOT snake)  fused")
for i in range(4):
    print(f"{i:>3}  {python_probs[i]:>9.2f}  {snake_probs[i]:>8.2f}  "
          f"{not_snake[i]:>12.2f}  {fused[i]:.4f}")

print("\nIn log-odds space NOT is a sign flip: "
      "logit(1-p) = -logit(p).")
best = int(np.argmax(fused))
print(f"best match: doc {best} "
      "(high python probability, low snake probability)")

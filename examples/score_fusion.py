"""Fusing BM25 and dense signals with log-odds conjunction."""

import numpy as np

from bayesian_bm25_tpu import (
    balanced_log_odds_fusion,
    cosine_to_probability,
    log_odds_conjunction,
    prob_and,
    prob_or,
)

bm25_prob = 0.82
cosine = 0.35
dense_prob = cosine_to_probability(cosine)
print(f"BM25 probability: {bm25_prob}")
print(f"dense cosine {cosine} -> probability {dense_prob:.4f}")

pair = np.array([bm25_prob, dense_prob])
print(f"\nprob_and  = {prob_and(pair):.4f}  (naive AND shrinks)")
print(f"prob_or   = {prob_or(pair):.4f}")
print(f"log_odds  = {log_odds_conjunction(pair):.4f}  "
      "(sqrt(n) scaling resolves shrinkage)")
print(f"weighted  = "
      f"{log_odds_conjunction(pair, weights=np.array([0.7, 0.3])):.4f}  "
      "(trust BM25 more)")

print("\nBalanced fusion over a candidate set:")
rng = np.random.default_rng(0)
sparse = rng.uniform(0.1, 0.95, 8)
dense = rng.uniform(-0.2, 0.8, 8)
fused = balanced_log_odds_fusion(sparse, dense, weight=0.5)
for i, (s, d, f) in enumerate(zip(sparse, dense, fused)):
    print(f"  doc {i}: sparse={s:.3f} dense={d:+.3f} -> fused={f:.3f}")
print("\nranking:", np.argsort(-np.asarray(fused)).tolist())

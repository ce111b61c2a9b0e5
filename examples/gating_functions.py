"""Sparse-signal gating: relu / swish / gelu / softplus in logit space."""

import numpy as np

from bayesian_bm25_tpu import log_odds_conjunction

# One strong signal, one weakly-negative (possibly spurious) signal.
pair = np.array([0.85, 0.42])
print(f"signals: {pair}")
for gate in ("none", "relu", "swish", "gelu", "softplus"):
    fused = log_odds_conjunction(pair, gating=gate)
    print(f"  {gate:<9} -> {fused:.4f}")

print("\nReLU zeroes the negative logit (MAP under a sparse prior); swish/"
      "gelu soft-gate it; softplus keeps all evidence but inflates logits.")

print("\nbeta controls the swish/softplus transition sharpness:")
for beta in (0.5, 1.0, 2.0, 8.0):
    sw = log_odds_conjunction(pair, gating="swish", gating_beta=beta)
    sp = log_odds_conjunction(pair, gating="softplus", gating_beta=beta)
    print(f"  beta={beta:<4} swish={sw:.4f}  softplus={sp:.4f}")

print("\nGELU is swish with beta=1.702:")
g = log_odds_conjunction(pair, gating="gelu")
s = log_odds_conjunction(pair, gating="swish", gating_beta=1.702)
print(f"  gelu={g:.6f}  swish_1.702={s:.6f}")

"""NumPy-friendly public fusion API (reference-parity surface).

Thin host-side wrappers over the jnp kernels in ``ops.fusion``: accept
numpy arrays / scalars, validate eagerly (ValueError semantics match
bayesian_bm25/fusion.py), run the jitted kernel, return numpy arrays or
Python floats for scalar inputs — so reference callers can switch without
code changes. Jitted pipelines should call ``ops.fusion`` directly.
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_tpu.ops.placement import on_host

from bayesian_bm25_tpu.ops import fusion as F


def _ret(x, *inputs):
    arr = np.asarray(x)
    if arr.ndim == 0 and all(np.ndim(i) == 0 for i in inputs if i is not None):
        return float(arr)
    return arr


@on_host
def cosine_to_probability(score):
    """Cosine similarity [-1,1] -> probability (1+s)/2 (fusion.py:25-45)."""
    return _ret(F.cosine_to_probability(score), score)


@on_host
def prob_not(prob):
    """P(NOT R) = 1 - P(R) (fusion.py:48-66)."""
    return _ret(F.prob_not(prob), prob)


@on_host
def prob_and(probs):
    """AND via product rule in log space over the last axis (fusion.py:69-83)."""
    out = F.prob_and(probs)
    arr = np.asarray(out)
    return float(arr) if arr.ndim == 0 else arr


@on_host
def prob_or(probs):
    """OR via complement rule in log space over the last axis (fusion.py:86-100)."""
    out = F.prob_or(probs)
    arr = np.asarray(out)
    return float(arr) if arr.ndim == 0 else arr


@on_host
def log_odds_conjunction(
    probs,
    alpha=None,
    weights=None,
    gating: str = "none",
    gating_beta: float = 1.0,
    max_logit=None,
):
    """Log-odds conjunction (unweighted mean / weighted Log-OP) with optional
    gating and logit clipping. See ops/fusion.py and fusion.py:172-280."""
    if gating not in F.VALID_GATES:
        raise ValueError(
            f"gating must be 'none', 'relu', 'swish', 'gelu', or 'softplus', "
            f"got {gating!r}"
        )
    if weights is not None:
        w = np.asarray(weights, dtype=np.float64)
        if np.any(w < 0):
            raise ValueError("weights must be non-negative")
        if abs(float(np.sum(w)) - 1.0) > 1e-6:
            raise ValueError(f"weights must sum to 1, got {float(np.sum(w))}")
    F.resolve_alpha(alpha, 0.0)  # eager "auto"/float validation
    out = F.log_odds_conjunction(
        probs, alpha=alpha, weights=weights, gating=gating,
        gating_beta=gating_beta, max_logit=max_logit,
    )
    arr = np.asarray(out)
    return float(arr) if arr.ndim == 0 else arr


@on_host
def balanced_log_odds_fusion(sparse_probs, dense_similarities, weight=0.5):
    """Hybrid sparse+dense fusion scores (fusion.py:283-343)."""
    return _ret(
        F.balanced_log_odds_fusion(sparse_probs, dense_similarities, weight),
        sparse_probs, dense_similarities,
    )

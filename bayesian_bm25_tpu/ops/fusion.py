"""Fusion algebra kernels: boolean ops, gating, log-odds conjunction.

Pure jnp implementations of the reference fusion algebra
(bayesian_bm25/fusion.py:25-343). Learnable/attention weight models are in
ops/fusion_learn.py + models/fusion_weights.py.

Numeric contract (SURVEY §2.4): _SQRT_N_ALPHA = 0.5; weighted default
alpha = 0.0, unweighted default alpha = 0.5; GELU gate constant 1.702.
"""

from __future__ import annotations

import jax.numpy as jnp

from bayesian_bm25_tpu.ops.mathx import (
    as_float,
    clamp_probability,
    logit,
    min_max_normalize,
    sigmoid,
)

SQRT_N_ALPHA = 0.5  # alpha=0.5 implements the sqrt(n) scaling law


def resolve_alpha(alpha, default: float) -> float:
    """Resolve confidence-scaling exponent: "auto" -> 0.5, None -> default."""
    if alpha is None:
        return default
    if isinstance(alpha, str):
        if alpha != "auto":
            raise ValueError(f"alpha must be a float, None, or 'auto', got {alpha!r}")
        return SQRT_N_ALPHA
    return float(alpha)


def cosine_to_probability(score) -> jnp.ndarray:
    """Map cosine similarity [-1, 1] -> probability (1+s)/2, clamped."""
    return clamp_probability((1.0 + as_float(score)) / 2.0)


def prob_not(prob) -> jnp.ndarray:
    """Complement rule: 1 - p, clamped on both input and output."""
    return clamp_probability(1.0 - clamp_probability(prob))


def prob_and(probs) -> jnp.ndarray:
    """Product rule in log space: exp(sum ln p) over the last axis."""
    p = clamp_probability(probs)
    return jnp.exp(jnp.sum(jnp.log(p), axis=-1))


def prob_or(probs) -> jnp.ndarray:
    """Complement rule in log space: 1 - exp(sum ln(1-p)) over the last axis."""
    p = clamp_probability(probs)
    return 1.0 - jnp.exp(jnp.sum(jnp.log1p(-p), axis=-1))


VALID_GATES = ("none", "relu", "swish", "gelu", "softplus")


def apply_gating(logits: jnp.ndarray, gating: str, beta: float = 1.0) -> jnp.ndarray:
    """Sparse-signal gating in logit space (reference fusion.py:119-169).

    relu: MAP under sparse prior; swish: Bayes estimate x*sigma(beta*x);
    gelu: x*sigma(1.702*x) (beta ignored); softplus: log1p(exp(beta*x))/beta.
    ``gating`` is static (selected at trace time).
    """
    x = as_float(logits)
    if gating == "none":
        return x
    if gating == "relu":
        return jnp.maximum(0.0, x)
    if gating == "swish":
        return x * sigmoid(beta * x)
    if gating == "gelu":
        return x * sigmoid(1.702 * x)
    if gating == "softplus":
        return jnp.logaddexp(0.0, beta * x) / beta
    raise ValueError(f"gating must be one of {VALID_GATES}, got {gating!r}")


def log_odds_conjunction(
    probs,
    alpha=None,
    weights=None,
    gating: str = "none",
    gating_beta: float = 1.0,
    max_logit=None,
) -> jnp.ndarray:
    """Log-odds conjunction with multiplicative confidence scaling.

    Unweighted (fusion.py:270-280): sigma(mean(logit p) * n^alpha), alpha
    default 0.5. Weighted Log-OP (fusion.py:251-268): sigma(n^alpha *
    sum(w_i * logit p_i)) with w >= 0 summing to 1, alpha default 0.0.
    Gating is applied pre-aggregation; ``max_logit`` clips gated logits.
    """
    p = clamp_probability(probs)
    n = p.shape[-1]
    x = apply_gating(logit(p), gating, beta=gating_beta)
    if max_logit is not None:
        x = jnp.clip(x, -max_logit, max_logit)

    if weights is not None:
        w = as_float(weights)
        eff_alpha = resolve_alpha(alpha, default=0.0)
        l_w = (n ** eff_alpha) * jnp.sum(w * x, axis=-1)
        return sigmoid(l_w)

    eff_alpha = resolve_alpha(alpha, default=0.5)
    l_bar = jnp.mean(x, axis=-1)
    return sigmoid(l_bar * (n ** eff_alpha))


def balanced_log_odds_fusion(
    sparse_probs, dense_similarities, weight: float = 0.5
) -> jnp.ndarray:
    """Hybrid sparse+dense fusion score (fusion.py:283-343).

    Min-max normalizes both logit arrays to [0,1] (zero-variance -> zeros)
    then returns weight*dense_norm + (1-weight)*sparse_norm. Output is a
    fusion *score*, not a probability.
    """
    logit_sparse = logit(clamp_probability(sparse_probs))
    logit_dense = logit(cosine_to_probability(dense_similarities))
    s_norm = min_max_normalize(logit_sparse)
    d_norm = min_max_normalize(logit_dense)
    w = as_float(weight)
    return w * d_norm + (1.0 - w) * s_norm

"""Kernels for learnable / attention / multi-head log-odds fusion weights.

Pure-functional core of the reference's LearnableLogOddsWeights
(fusion.py:346-636), AttentionLogOddsWeights (fusion.py:639-1143) and
MultiHeadAttentionLogOddsWeights (fusion.py:1146-1372). Multi-head runs as a
vmap over a stacked head pytree instead of a Python list of heads — one
compiled kernel regardless of head count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.ops import gd
from bayesian_bm25_tpu.ops.mathx import (
    as_float,
    clamp_probability,
    logit,
    min_max_normalize,
    sigmoid,
    stable_softmax,
)

# ---------------------------------------------------------------------------
# LearnableLogOddsWeights core: params = softmax logits z (n_signals,)
# ---------------------------------------------------------------------------


def learnable_forward(z, probs, scale, logit_base_rate=None) -> jnp.ndarray:
    """sigma(n^alpha * sum(softmax(z) * logit(p)) [+ logit base_rate])."""
    w = stable_softmax(as_float(z))
    x = logit(clamp_probability(probs))
    l_w = as_float(scale) * jnp.sum(w * x, axis=-1)
    if logit_base_rate is not None:
        l_w = l_w + as_float(logit_base_rate)
    return sigmoid(l_w)


def _learnable_grads(z, x, labels, scale, logit_base_rate):
    """Hebbian gradient dL/dz_j = scale * (p - y) * w_j * (x_j - x_bar_w),
    averaged over samples (fusion.py:519-525)."""
    w = stable_softmax(z)
    x_bar = jnp.sum(w * x, axis=-1)
    l_w = scale * x_bar
    if logit_base_rate is not None:
        l_w = l_w + logit_base_rate
    p = sigmoid(l_w)
    err = p - labels
    return jnp.mean(
        scale * err[:, None] * w[None, :] * (x - x_bar[:, None]), axis=0
    )


def learnable_fit(
    z0, probs, labels, scale, logit_base_rate=None,
    *, learning_rate=0.01, max_iterations=1000, tolerance=1e-6,
):
    """Batch GD for learnable weights; convergence on max |lr*grad| applied
    after the step (fusion.py:527-530)."""
    x = logit(clamp_probability(probs))
    labels = jnp.atleast_1d(as_float(labels))
    scale = as_float(scale)
    lbr = None if logit_base_rate is None else as_float(logit_base_rate)

    def grad_fn(z):
        return _learnable_grads(z, x, labels, scale, lbr)

    z, n_iter = gd.fit_loop(
        grad_fn, as_float(z0),
        learning_rate=learning_rate, max_iterations=max_iterations,
        tolerance=tolerance, convergence="step_size",
    )
    return z, n_iter


def learnable_online_step(
    state: gd.OnlineState, probs, labels, scale, logit_base_rate=None, **hyper
) -> gd.OnlineState:
    """One online update; Polyak averages the softmax weights in the simplex."""
    probs = jnp.atleast_2d(as_float(probs))
    labels = jnp.atleast_1d(as_float(labels))
    x = logit(clamp_probability(probs))
    lbr = None if logit_base_rate is None else as_float(logit_base_rate)
    grads = _learnable_grads(state.params, x, labels, as_float(scale), lbr)
    return gd.online_step(state, grads, average=stable_softmax, **hyper)


# ---------------------------------------------------------------------------
# AttentionLogOddsWeights core: params = (W: (n_sig, n_qf), b: (n_sig,))
# ---------------------------------------------------------------------------


class AttentionParams(NamedTuple):
    W: jnp.ndarray
    b: jnp.ndarray


def attention_init(n_signals: int, n_query_features: int, seed: int,
                   dtype=None) -> AttentionParams:
    """Xavier-style init N(0, 1/sqrt(n_qf)) with NumPy Generator semantics.

    The reference seeds ``np.random.default_rng(seed)`` (fusion.py:689-694);
    we reproduce that exact stream host-side so multi-head diversity and any
    seeded test expectations carry over, then place on device.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(n_query_features)
    W = rng.normal(0.0, scale, size=(n_signals, n_query_features))
    dt = dtype or as_float(0.0).dtype
    return AttentionParams(
        jnp.asarray(W, dt), jnp.zeros((n_signals,), dt)
    )


def attention_weights(params: AttentionParams, query_features) -> jnp.ndarray:
    """Softmax attention weights from query features: softmax(qf @ W.T + b)."""
    qf = jnp.atleast_2d(as_float(query_features))
    z = qf @ params.W.T + params.b
    return stable_softmax(z, axis=-1)


def _prep_logits(probs, normalize: bool, segment_ids=None, num_segments=None):
    """logit(p), optionally per-signal (column) min-max normalized; with
    segment ids, normalization is per query group (fusion.py:879-887)."""
    x = logit(clamp_probability(jnp.atleast_2d(as_float(probs))))
    if normalize:
        if segment_ids is not None:
            from bayesian_bm25_tpu.ops.mathx import segment_min_max_normalize

            x = segment_min_max_normalize(x, segment_ids, num_segments)
        else:
            x = min_max_normalize(x, axis=-2)
    return x


def attention_forward(
    params: AttentionParams,
    probs,
    query_features,
    scale,
    logit_base_rate=None,
    *,
    normalize: bool = False,
    skip_normalize: bool = False,
) -> jnp.ndarray:
    """Fused probability per candidate row (fusion.py:774-828).

    ``skip_normalize`` reproduces the reference's scalar fall-through: a
    single 1-D sample has no candidate set to normalize across (:803-814).
    """
    x = _prep_logits(probs, normalize and not skip_normalize)
    w = attention_weights(params, query_features)
    l_w = as_float(scale) * jnp.sum(w * x, axis=-1)
    if logit_base_rate is not None:
        l_w = l_w + as_float(logit_base_rate)
    return sigmoid(l_w)


def _attention_grads(params: AttentionParams, x, labels, qf, scale,
                     logit_base_rate):
    """grad_z = scale*(p-y)*w*(x - x_bar_w); dW = grad_z.T @ qf / m;
    db = mean(grad_z) (fusion.py:903-915)."""
    z = qf @ params.W.T + params.b
    w = stable_softmax(z, axis=-1)
    x_bar = jnp.sum(w * x, axis=-1)
    l_w = scale * x_bar
    if logit_base_rate is not None:
        l_w = l_w + logit_base_rate
    p = sigmoid(l_w)
    err = p - labels
    grad_z = scale * err[:, None] * w * (x - x_bar[:, None])
    m = x.shape[0]
    grad_W = grad_z.T @ qf / m
    grad_b = jnp.mean(grad_z, axis=0)
    return AttentionParams(grad_W, grad_b)


def attention_fit(
    params0: AttentionParams, probs, labels, query_features, scale,
    logit_base_rate=None, *, normalize=False, segment_ids=None,
    num_segments=None, learning_rate=0.01, max_iterations=1000, tolerance=1e-6,
):
    """Batch GD on BCE for (W, b); convergence on max parameter change."""
    x = _prep_logits(probs, normalize, segment_ids, num_segments)
    labels = jnp.atleast_1d(as_float(labels))
    qf = jnp.atleast_2d(as_float(query_features))
    scale = as_float(scale)
    lbr = None if logit_base_rate is None else as_float(logit_base_rate)

    def grad_fn(params):
        return _attention_grads(params, x, labels, qf, scale, lbr)

    return gd.fit_loop(
        grad_fn, params0,
        learning_rate=learning_rate, max_iterations=max_iterations,
        tolerance=tolerance, convergence="param_change",
    )


def attention_online_step(
    state: gd.OnlineState, probs, labels, query_features, scale,
    logit_base_rate=None, *, normalize=False, **hyper
) -> gd.OnlineState:
    probs2 = jnp.atleast_2d(as_float(probs))
    x = _prep_logits(probs2, normalize)
    labels = jnp.atleast_1d(as_float(labels))
    qf = jnp.atleast_2d(as_float(query_features))
    grads = _attention_grads(
        state.params, x, labels, qf, as_float(scale),
        None if logit_base_rate is None else as_float(logit_base_rate),
    )
    return gd.online_step(state, grads, **hyper)


# ---------------------------------------------------------------------------
# Multi-head: stacked params (n_heads, ...) + vmap over heads
# ---------------------------------------------------------------------------


def stack_heads(params_list) -> AttentionParams:
    return AttentionParams(
        jnp.stack([p.W for p in params_list]),
        jnp.stack([p.b for p in params_list]),
    )


def multihead_forward(
    stacked: AttentionParams, probs, query_features, scale,
    logit_base_rate=None, *, normalize=False, skip_normalize=False,
) -> jnp.ndarray:
    """Average per-head fused log-odds, then sigmoid (fusion.py:1231-1234)."""
    per_head = jax.vmap(
        lambda hp: attention_forward(
            hp, probs, query_features, scale, logit_base_rate,
            normalize=normalize, skip_normalize=skip_normalize,
        )
    )(stacked)
    head_logits = logit(clamp_probability(per_head))
    return sigmoid(jnp.mean(head_logits, axis=0))

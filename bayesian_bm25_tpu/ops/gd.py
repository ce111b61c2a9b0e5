"""Shared gradient-descent machinery for the online learners.

The reference repeats the same online-SGD skeleton in four places
(probability.py:350-473, fusion.py:537-629, fusion.py:937-1037,
calibration.py:41-90): EMA gradient smoothing with bias correction, global
L2 clipping, 1/(1+t/tau) learning-rate decay, and Polyak parameter
averaging. Here it is one pytree-generic pure step, reused by every model.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.ops.mathx import as_float


class OnlineState(NamedTuple):
    """Generic online-learning state over an arbitrary parameter pytree."""

    params: object
    grad_ema: object
    params_avg: object
    n_updates: jnp.ndarray  # int32


def init_online(params) -> OnlineState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OnlineState(params, zeros, params, jnp.asarray(0, jnp.int32))


def online_step(
    state: OnlineState,
    grads,
    *,
    learning_rate,
    momentum,
    decay_tau,
    max_grad_norm,
    avg_decay,
    postprocess=None,
    average=None,
) -> OnlineState:
    """EMA -> bias-correct -> clip -> decayed step -> Polyak average.

    ``postprocess(params) -> params`` applies constraints after the step
    (e.g. the alpha >= 0.01 floor). ``average(params) -> pytree`` maps raw
    params to the space being Polyak-averaged (e.g. softmax weights in the
    simplex for LearnableLogOddsWeights, fusion.py:627-629); defaults to
    identity.
    """
    dt = jax.tree.leaves(grads)[0].dtype
    mom = jnp.asarray(momentum, dt)

    ema = jax.tree.map(lambda e, g: mom * e + (1.0 - mom) * g, state.grad_ema, grads)

    t = state.n_updates + 1
    correction = 1.0 - mom ** t.astype(dt)
    corrected = jax.tree.map(lambda e: e / correction, ema)

    sq = sum(jnp.sum(c * c) for c in jax.tree.leaves(corrected))
    norm = jnp.sqrt(sq)
    scale = jnp.where(norm > max_grad_norm, as_float(max_grad_norm) / norm, 1.0)
    corrected = jax.tree.map(lambda c: c * scale, corrected)

    lr = jnp.asarray(learning_rate, dt) / (1.0 + t.astype(dt) / decay_tau)
    params = jax.tree.map(lambda p, c: p - lr * c, state.params, corrected)
    if postprocess is not None:
        params = postprocess(params)

    ad = jnp.asarray(avg_decay, dt)
    avg_target = params if average is None else average(params)
    params_avg = jax.tree.map(
        lambda a, p: ad * a + (1.0 - ad) * p, state.params_avg, avg_target
    )
    return OnlineState(params, ema, params_avg, t)


def fit_loop(grad_fn, params0, *, learning_rate, max_iterations, tolerance,
             convergence: str = "param_change"):
    """Generic batch-GD while_loop with tolerance early exit.

    ``grad_fn(params) -> grads`` (same pytree structure). Convergence:
      * "param_change": every |delta param| < tolerance (probability.py:333,
        fusion.py:923-928, calibration.py:81) — update still applied.
      * "step_size": max |lr * grad| < tolerance checked AFTER the update
        (fusion.py:527-530, LearnableLogOddsWeights).
    Returns (params, n_iterations).
    """
    dt = jax.tree.leaves(params0)[0].dtype
    lr = jnp.asarray(learning_rate, dt)
    tol = jnp.asarray(tolerance, dt)

    def cond(state):
        _, done, it = state
        return jnp.logical_and(~done, it < max_iterations)

    def body(state):
        params, _, it = state
        grads = grad_fn(params)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        if convergence == "param_change":
            deltas = jax.tree.map(
                lambda p, q: jnp.max(jnp.abs(jnp.atleast_1d(q - p))), params, new_params
            )
        else:
            deltas = jax.tree.map(
                lambda g: jnp.max(jnp.abs(jnp.atleast_1d(lr * g))), grads
            )
        done = jnp.all(jnp.stack(jax.tree.leaves(deltas)) < tol)
        return new_params, done, it + 1

    params, _, n_iter = jax.lax.while_loop(
        cond, body, (params0, jnp.asarray(False), jnp.asarray(0))
    )
    return params, n_iter

"""Neural score calibration: Platt scaling and isotonic (PAVA) regression.

Reference: bayesian_bm25/calibration.py. Platt fitting runs as a jitted
while_loop GD; PAVA fitting is inherently sequential O(n) host work (done
once, tiny) while isotonic inference is a vectorized searchsorted +
interpolation kernel.
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_tpu.ops.placement import on_host

import jax
import jax.numpy as jnp

from bayesian_bm25_tpu.ops import gd
from bayesian_bm25_tpu.ops.mathx import as_float, clamp_probability, sigmoid


def _platt_grads(params, scores, labels):
    a, b = params
    predicted = clamp_probability(sigmoid(a * scores + b))
    err = predicted - labels
    return (jnp.mean(err * scores), jnp.mean(err))


def _platt_fit(a0, b0, scores, labels, *, learning_rate, max_iterations,
               tolerance):
    scores = as_float(scores)
    labels = as_float(labels)

    def grad_fn(params):
        return _platt_grads(params, scores, labels)

    params0 = (jnp.asarray(a0, scores.dtype), jnp.asarray(b0, scores.dtype))
    params, _ = gd.fit_loop(
        grad_fn, params0, learning_rate=learning_rate,
        max_iterations=max_iterations, tolerance=tolerance,
        convergence="param_change",
    )
    return params


_platt_fit_jit = jax.jit(_platt_fit, static_argnames=("max_iterations",))


class PlattCalibrator:
    """Sigmoid calibration P = sigma(a * score + b), fit by BCE GD
    (calibration.py:23-109)."""

    def __init__(self, a: float = 1.0, b: float = 0.0) -> None:
        self.a = float(a)
        self.b = float(b)

    @on_host
    def fit(self, scores, labels, *, learning_rate=0.01, max_iterations=1000,
            tolerance=1e-6) -> None:
        a, b = _platt_fit_jit(
            self.a, self.b,
            np.asarray(scores, dtype=np.float64),
            np.asarray(labels, dtype=np.float64),
            learning_rate=learning_rate, max_iterations=max_iterations,
            tolerance=tolerance,
        )
        self.a = float(a)
        self.b = float(b)

    @on_host
    def calibrate(self, scores):
        out = np.asarray(sigmoid(self.a * as_float(scores) + self.b))
        return float(out) if out.ndim == 0 else out

    def __call__(self, scores):
        return self.calibrate(scores)


@jax.jit
def _isotonic_eval(x, y, scores):
    """Vectorized breakpoint interpolation (calibration.py:182-224 semantics:
    clamp to endpoints, linear interpolation, midpoint for tied breakpoints)."""
    scores = as_float(scores)
    idx = jnp.searchsorted(x, scores)
    idx_hi = jnp.clip(idx, 1, x.shape[0] - 1)
    x0 = x[idx_hi - 1]
    x1 = x[idx_hi]
    y0 = y[idx_hi - 1]
    y1 = y[idx_hi]
    span = x1 - x0
    t = (scores - x0) / jnp.where(span < 1e-12, 1.0, span)
    interp = jnp.where(span < 1e-12, (y0 + y1) / 2.0, y0 + t * (y1 - y0))
    out = jnp.where(idx == 0, y[0], interp)
    out = jnp.where(idx >= x.shape[0], y[-1], out)
    return clamp_probability(out)


class IsotonicCalibrator:
    """Non-parametric monotone calibration via PAVA (calibration.py:112-227).

    ``fit`` runs pool-adjacent-violators on the host (stack-based single
    pass, O(n) — the reference's repeated merge sweep is O(n^2) worst case);
    ``calibrate`` is a jitted vectorized kernel.
    """

    def __init__(self) -> None:
        self._x: np.ndarray | None = None
        self._y: np.ndarray | None = None

    @on_host
    def fit(self, scores, labels) -> None:
        scores = np.asarray(scores, dtype=np.float64)
        labels = np.asarray(labels, dtype=np.float64)
        order = np.argsort(scores)
        xs = scores[order]
        ys = labels[order]

        # Stack of blocks: (y_sum, count, x_sum); merge while the tail
        # violates monotone non-decreasing block means.
        blocks: list[list[float]] = []
        for xv, yv in zip(xs, ys):
            blocks.append([yv, 1.0, xv])
            while len(blocks) > 1 and (
                blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
            ):
                y1, c1, x1 = blocks.pop()
                blocks[-1][0] += y1
                blocks[-1][1] += c1
                blocks[-1][2] += x1

        self._x = np.array([b[2] / b[1] for b in blocks], dtype=np.float64)
        self._y = np.array([b[0] / b[1] for b in blocks], dtype=np.float64)

    @on_host
    def calibrate(self, scores):
        if self._x is None or self._y is None:
            raise RuntimeError("Call fit() before calibrate().")
        scalar = np.ndim(scores) == 0
        if self._x.shape[0] == 1:
            const = float(np.clip(self._y[0], 1e-10, 1 - 1e-10))
            if scalar:
                return const
            return np.full(np.shape(np.asarray(scores)), const)
        out = np.asarray(
            _isotonic_eval(self._x, self._y, np.atleast_1d(
                np.asarray(scores, dtype=np.float64)))
        )
        return float(out[0]) if scalar else out

    def __call__(self, scores):
        return self.calibrate(scores)

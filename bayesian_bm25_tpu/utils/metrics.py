"""Calibration metrics: ECE, Brier, log loss, reliability diagram.

Reference: bayesian_bm25/metrics.py. The binning kernels here are bincount
based (one segment-sum pass instead of a Python loop over bins) and run
jitted; bin semantics match the reference exactly — first bin closed
[0, hi], the rest left-exclusive (lo, hi] (metrics.py:21-29).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_bm25_tpu.ops.placement import on_host

from bayesian_bm25_tpu.ops.mathx import as_float


def _bin_index(probabilities: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Bin ids under (lo, hi] semantics with a closed first bin.

    ceil(p * n_bins) - 1 assigns p in (lo, hi] to its bin; p == 0 maps to
    bin 0 (closed first bin); values outside [0, 1] are clipped.
    """
    idx = jnp.ceil(probabilities * n_bins).astype(jnp.int32) - 1
    return jnp.clip(idx, 0, n_bins - 1)


def _binned_sums(probabilities, labels, n_bins: int):
    p = as_float(probabilities)
    y = as_float(labels)
    idx = _bin_index(p, n_bins)
    count = jnp.zeros(n_bins, p.dtype).at[idx].add(1.0)
    p_sum = jnp.zeros(n_bins, p.dtype).at[idx].add(p)
    y_sum = jnp.zeros(n_bins, p.dtype).at[idx].add(y)
    return count, p_sum, y_sum


@jax.jit
def _ece_kernel(probabilities, labels, count, p_sum, y_sum):
    total = probabilities.shape[0]
    safe = jnp.maximum(count, 1.0)
    gap = jnp.abs(p_sum / safe - y_sum / safe)
    return jnp.sum(jnp.where(count > 0, (count / total) * gap, 0.0))


@on_host
def expected_calibration_error(probabilities, labels, n_bins: int = 10) -> float:
    """Expected Calibration Error; lower is better, 0 is perfect."""
    count, p_sum, y_sum = _binned_sums(probabilities, labels, n_bins)
    return float(_ece_kernel(as_float(probabilities), as_float(labels),
                             count, p_sum, y_sum))


@on_host
def brier_score(probabilities, labels) -> float:
    """Mean squared error between probabilities and labels."""
    p = as_float(probabilities)
    y = as_float(labels)
    return float(jnp.mean((p - y) ** 2))


@on_host
def log_loss(probabilities, labels, *, eps: float = 1e-15) -> float:
    """Negative log-likelihood with probability clipping at ``eps``.

    Computed in float64 on the host (reference metrics.py is numpy
    float64): under a float32 default dtype the 1e-15 clip would round
    away (1 - 1e-15 == 1 in f32) and exact-0/1 inputs would produce
    inf/nan instead of the clipped penalty."""
    p = np.clip(np.asarray(probabilities, dtype=np.float64), eps, 1.0 - eps)
    y = np.asarray(labels, dtype=np.float64)
    return float(-np.mean(y * np.log(p) + (1.0 - y) * np.log1p(-p)))


@on_host
def reliability_diagram(probabilities, labels, n_bins: int = 10):
    """(avg_predicted, avg_actual, count) per non-empty bin."""
    count, p_sum, y_sum = _binned_sums(probabilities, labels, n_bins)
    count = np.asarray(count)
    p_sum = np.asarray(p_sum)
    y_sum = np.asarray(y_sum)
    bins = []
    for c, ps, ys in zip(count, p_sum, y_sum):
        if c > 0:
            bins.append((float(ps / c), float(ys / c), int(c)))
    return bins


@dataclass
class CalibrationReport:
    """Bundled calibration diagnostics with a text ``summary()``."""

    ece: float
    brier: float
    logloss: float
    reliability: list
    n_samples: int
    n_bins: int

    def summary(self) -> str:
        lines = [
            "Calibration Report",
            "==================",
            f"  Samples : {self.n_samples}",
            f"  Bins    : {self.n_bins}",
            f"  ECE     : {self.ece:.6f}",
            f"  Brier   : {self.brier:.6f}",
            f"  LogLoss : {self.logloss:.6f}",
            "",
            "  Reliability Diagram",
            "  -------------------",
            f"  {'Predicted':>10}  {'Actual':>10}  {'Count':>6}",
        ]
        for avg_pred, avg_actual, count in self.reliability:
            lines.append(f"  {avg_pred:>10.4f}  {avg_actual:>10.4f}  {count:>6}")
        return "\n".join(lines)


def calibration_report(probabilities, labels, n_bins: int = 10) -> CalibrationReport:
    """Compute ECE + Brier + log loss + reliability diagram in one call."""
    return CalibrationReport(
        ece=expected_calibration_error(probabilities, labels, n_bins=n_bins),
        brier=brier_score(probabilities, labels),
        logloss=log_loss(probabilities, labels),
        reliability=reliability_diagram(probabilities, labels, n_bins=n_bins),
        n_samples=int(np.asarray(probabilities).shape[0]),
        n_bins=n_bins,
    )

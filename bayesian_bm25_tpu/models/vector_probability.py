"""Vector similarity calibration via the likelihood-ratio framework.

API parity with the reference (bayesian_bm25/vector_probability.py):

    P(R|d) = sigmoid(log(f_R(d) / f_G(d)) + logit(P_base))

with f_G a fitted background Gaussian and f_R estimated by weighted KDE or
fixed-background GMM-EM with the auto-routing of Strategy 4.6.1 (gap
detection -> KDE/GMM, weight sharpening, density-prior and distance
fallbacks). The KDE kernel matrix and EM loop run jitted
(ops/density.py); routing decisions happen host-side — calibration is
fit-time work, not the query hot path (SURVEY §7, hard parts).
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_tpu.ops.placement import on_host

import jax

from bayesian_bm25_tpu.ops import density as dens
from bayesian_bm25_tpu.ops.mathx import clamp_probability, logit, sigmoid

_EPS = 1e-10


def _np(x):
    return np.asarray(x)


_kde_jit = jax.jit(dens.kernel_density)
_gmm_jit = jax.jit(dens.gmm_fixed_background, static_argnames=("max_iter",))
_gaussian_jit = jax.jit(dens.gaussian_pdf)


def _bucket(n: int, minimum: int = 64) -> int:
    """Next power-of-two bucket — bounds the number of compiled shapes for
    the per-query calibration kernels (union sizes vary per query)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_to(arr, size, value=0.0):
    pad = size - len(arr)
    if pad <= 0:
        return np.asarray(arr, dtype=np.float64)
    return np.concatenate([
        np.asarray(arr, dtype=np.float64), np.full(pad, value)
    ])


class VectorProbabilityTransform:
    """Calibrates vector distances into probabilities (Theorem 3.1.1).

    Parameters: background Gaussian (mu_G, sigma_G) and optional base_rate
    in (0, 1); None defaults to the neutral logit 0.
    """

    def __init__(self, mu_G: float, sigma_G: float, base_rate=None) -> None:
        if sigma_G <= 0.0:
            raise ValueError(f"sigma_G must be positive, got {sigma_G}")
        if base_rate is not None and not (0.0 < base_rate < 1.0):
            raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
        self.mu_G = float(mu_G)
        self.sigma_G = float(sigma_G)
        self.base_rate = base_rate
        self._logit_base_rate = (
            float(_np(logit(base_rate))) if base_rate is not None else 0.0
        )

    @classmethod
    def fit_background(cls, distances, *, base_rate=None):
        """Estimate (mu_G, sigma_G) from a corpus distance sample."""
        d = np.asarray(distances, dtype=np.float64)
        sigma = float(np.std(d))
        return cls(
            mu_G=float(np.mean(d)),
            sigma_G=max(sigma, _EPS),
            base_rate=base_rate,
        )

    # -- weight construction (host: tiny sort/scan work) ---------------------

    @on_host
    def _detect_gap(self, distances, threshold_ratio: float = 0.15):
        d = np.asarray(distances, dtype=np.float64)
        if len(d) < 3:
            return None
        idx, found = dens.detect_gap_index(d, threshold_ratio)
        return int(idx) if bool(found) else None

    @on_host
    def _gap_weights(self, distances):
        d = np.asarray(distances, dtype=np.float64)
        gap_idx = self._detect_gap(d)
        if gap_idx is None:
            return None
        threshold = np.sort(d)[gap_idx]
        return np.where(d < threshold, 1.0, 0.0)

    @staticmethod
    @on_host
    def _sharpen_weights(weights, temperature: float = 0.05):
        return _np(dens.sharpen_weights(weights, temperature))

    @staticmethod
    @on_host
    def _distance_density_weights(distances):
        return _np(dens.distance_density_weights(distances))

    @staticmethod
    def _signal_mass(weights) -> float:
        if weights is None:
            return 0.0
        w = np.asarray(weights, dtype=np.float64)
        if w.size == 0:
            return 0.0
        return float(np.sum(np.maximum(w, 0.0)))

    # -- density estimators ---------------------------------------------------

    @on_host
    def estimate_kde(self, distances, weights, bandwidth_factor: float = 2.0,
                     *, eval_points=None):
        """Weighted KDE for f_R with scaled Silverman bandwidth (one
        (n_eval, n_sample) kernel matrix on device)."""
        d = np.asarray(distances, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        e = d if eval_points is None else np.asarray(eval_points, np.float64)
        # Shape-bucketed padding: zero-weight samples are exact no-ops for
        # both the weighted bandwidth and the KDE sum; padded eval points
        # are sliced off.
        n_e, n_d = len(e), len(d)
        d_p = _pad_to(d, _bucket(n_d), value=0.0)
        w_p = _pad_to(w, _bucket(n_d), value=0.0)
        e_p = _pad_to(e, _bucket(n_e), value=0.0)
        h = float(_np(dens.silverman_bandwidth(d_p, w_p))) * bandwidth_factor
        return _np(_kde_jit(e_p, d_p, w_p, h))[:n_e]

    @on_host
    def estimate_gmm(self, distances, weights=None, *, max_iter: int = 100,
                     tol: float = 1e-6, eval_points=None):
        """Fixed-background GMM-EM for f_R; weights inform initialization
        (vector_probability.py:364-431)."""
        d = np.asarray(distances, dtype=np.float64)
        e = d if eval_points is None else np.asarray(eval_points, np.float64)
        n = len(d)

        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            w_sum = float(np.sum(w))
            if w_sum > _EPS:
                mu_R = float(np.sum(w * d) / w_sum)
                sigma_R = float(np.sqrt(np.sum(w * (d - mu_R) ** 2) / w_sum))
                pi_R = float(np.clip(w_sum / n, 0.1, 0.9))
            else:
                mu_R = float(np.mean(d))
                sigma_R = float(np.std(d))
                pi_R = 0.5
        else:
            mu_R = self.mu_G - 0.5 * self.sigma_G
            sigma_R = self.sigma_G * 0.5
            pi_R = 0.3
        if sigma_R < _EPS:
            sigma_R = self.sigma_G * 0.5

        n_d, n_e = len(d), len(e)
        d_p = _pad_to(d, _bucket(n_d), value=self.mu_G)
        mask = _pad_to(np.ones(n_d), _bucket(n_d), value=0.0)
        e_p = _pad_to(e, _bucket(n_e), value=0.0)
        mu_R, sigma_R, _ = _gmm_jit(
            d_p, self.mu_G, self.sigma_G, mu_R, sigma_R, pi_R,
            max_iter=max_iter, tol=tol, mask=mask,
        )
        f_R = _np(_gaussian_jit(e_p, float(mu_R), float(sigma_R)))[:n_e]
        return np.maximum(f_R, _EPS)

    # -- routing (Strategy 4.6.1 / vector_probability.py:442-535) -------------

    @on_host
    def _estimate_relevant_density(
        self, eval_points, sample_distances, *, weights=None,
        method: str = "auto", bandwidth_factor: float = 2.0,
        density_prior=None,
    ):
        e = np.asarray(eval_points, dtype=np.float64)
        s = np.asarray(sample_distances, dtype=np.float64)
        if len(s) == 0:
            return np.full_like(e, _EPS)

        K = len(s)
        weight_mass = self._signal_mass(weights)
        density_mass = self._signal_mass(density_prior)

        if method == "auto":
            gap_w = self._gap_weights(s)
            if gap_w is not None:
                if K >= 50:
                    return self.estimate_kde(s, gap_w, bandwidth_factor,
                                             eval_points=e)
                return self.estimate_gmm(s, gap_w, eval_points=e)
            if weights is not None and weight_mass > _EPS:
                return self.estimate_kde(
                    s, self._sharpen_weights(weights), bandwidth_factor,
                    eval_points=e,
                )
            if density_prior is not None and density_mass > _EPS:
                return self.estimate_gmm(s, density_prior, eval_points=e)
            return self.estimate_gmm(
                s, self._distance_density_weights(s), eval_points=e
            )

        if method == "kde":
            if weights is not None and weight_mass > _EPS:
                eff = np.asarray(weights, dtype=np.float64)
            elif density_prior is not None and density_mass > _EPS:
                eff = np.asarray(density_prior, dtype=np.float64)
            else:
                gap_w = self._gap_weights(s)
                eff = gap_w if gap_w is not None else (
                    self._distance_density_weights(s)
                )
            return self.estimate_kde(s, eff, bandwidth_factor, eval_points=e)

        if method == "gmm":
            if weights is not None and weight_mass > _EPS:
                eff = np.asarray(weights, dtype=np.float64)
            elif density_prior is not None and density_mass > _EPS:
                eff = np.asarray(density_prior, dtype=np.float64)
            else:
                eff = None
            return self.estimate_gmm(s, eff, eval_points=e)

        raise ValueError(
            f"method must be 'auto', 'kde', or 'gmm', got {method!r}"
        )

    # -- calibration -----------------------------------------------------------

    @on_host
    def log_density_ratio(self, distances, f_R_values):
        """log(f_R(d) / f_G(d)) with epsilon floors (Definition 3.2.1)."""
        d = np.asarray(distances, dtype=np.float64)
        f_R = np.maximum(np.asarray(f_R_values, dtype=np.float64), _EPS)
        f_G = np.maximum(_np(_gaussian_jit(d, self.mu_G, self.sigma_G)), _EPS)
        out = np.log(f_R / f_G)
        return float(out) if out.ndim == 0 else out

    @on_host
    def calibrate(self, distances, *, weights=None, method: str = "auto",
                  bandwidth_factor: float = 2.0, density_prior=None):
        """P(R|d) = sigma(log density ratio + logit base rate), with the
        eval points doubling as the estimation sample."""
        scalar = np.ndim(distances) == 0
        d = np.atleast_1d(np.asarray(distances, dtype=np.float64))
        f_R = self._estimate_relevant_density(
            d, d, weights=weights, method=method,
            bandwidth_factor=bandwidth_factor, density_prior=density_prior,
        )
        out = _np(clamp_probability(sigmoid(
            self.log_density_ratio(d, f_R) + self._logit_base_rate
        )))
        return float(out[0]) if scalar else out

    @on_host
    def calibrate_with_sample(self, eval_distances, sample_distances, *,
                              weights=None, method: str = "auto",
                              bandwidth_factor: float = 2.0,
                              density_prior=None):
        """Index-aware path: estimate f_R from an ANN-local sample, evaluate
        on an arbitrary eval set (vector_probability.py:627-658)."""
        scalar = np.ndim(eval_distances) == 0
        e = np.atleast_1d(np.asarray(eval_distances, dtype=np.float64))
        s = np.asarray(sample_distances, dtype=np.float64)
        f_R = self._estimate_relevant_density(
            e, s, weights=weights, method=method,
            bandwidth_factor=bandwidth_factor, density_prior=density_prior,
        )
        out = _np(clamp_probability(sigmoid(
            self.log_density_ratio(e, f_R) + self._logit_base_rate
        )))
        return float(out[0]) if scalar else out


@on_host
def ivf_density_prior(cell_population, avg_population, *, gamma: float = 1.0):
    """sigma(gamma * (avg_pop / cell_pop - 1)): sparse IVF cells get higher
    prior weight — the IDF analogue (vector_probability.py:666-700)."""
    pop = np.asarray(cell_population, dtype=np.float64)
    safe = np.maximum(pop, _EPS)
    out = _np(sigmoid(gamma * (avg_population / safe - 1.0)))
    return float(out) if out.ndim == 0 else out


@on_host
def knn_density_prior(kth_distance, global_median_kth, *, gamma: float = 1.0):
    """sigma(gamma * (kth_dist / global_median - 1)): sparse neighborhoods
    get higher prior weight (vector_probability.py:703-737)."""
    d = np.asarray(kth_distance, dtype=np.float64)
    out = _np(sigmoid(gamma * (d / max(global_median_kth, _EPS) - 1.0)))
    return float(out) if out.ndim == 0 else out

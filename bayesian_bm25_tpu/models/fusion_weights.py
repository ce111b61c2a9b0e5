"""Stateful learnable / attention / multi-head fusion weight models.

API-parity wrappers (reference: bayesian_bm25/fusion.py:346-1372) over the
pure kernels in ``ops.fusion_learn``. Parameters are kept as numpy arrays
(pickle/deepcopy friendly); compute dispatches to jitted kernels.
"""

from __future__ import annotations

import numpy as np

from bayesian_bm25_tpu.ops.placement import on_host

import jax

from bayesian_bm25_tpu.ops import fusion_learn as FL
from bayesian_bm25_tpu.ops import gd
from bayesian_bm25_tpu.ops.fusion import resolve_alpha
from bayesian_bm25_tpu.ops.mathx import clamp_probability, logit as _logit, sigmoid as _sigmoid

def _check_base_rate(base_rate):
    if base_rate is not None and not (0.0 < base_rate < 1.0):
        raise ValueError(f"base_rate must be in (0, 1), got {base_rate}")
    return None if base_rate is None else float(np.asarray(_logit(base_rate)))


_learnable_forward_jit = jax.jit(FL.learnable_forward)
_learnable_fit_jit = jax.jit(FL.learnable_fit, static_argnames=("max_iterations",))
_learnable_step_jit = jax.jit(FL.learnable_online_step)
_attention_forward_jit = jax.jit(
    FL.attention_forward, static_argnames=("normalize", "skip_normalize")
)
_attention_fit_jit = jax.jit(
    FL.attention_fit,
    static_argnames=("normalize", "num_segments", "max_iterations"),
)
_attention_step_jit = jax.jit(FL.attention_online_step, static_argnames=("normalize",))
_multihead_forward_jit = jax.jit(
    FL.multihead_forward, static_argnames=("normalize", "skip_normalize")
)


class LearnableLogOddsWeights:
    """Learnable per-signal reliability weights for log-odds conjunction.

    Softmax parameterization (zeros init -> uniform 1/n Naive-Bayes weights);
    forward sigma(n^alpha * sum(w * logit p) [+ logit base_rate]).
    Reference: fusion.py:346-636.
    """

    def __init__(self, n_signals: int, alpha=0.0, base_rate=None):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        self._logit_base_rate = _check_base_rate(base_rate)
        self._n_signals = int(n_signals)
        self._alpha = resolve_alpha(alpha, default=0.0)
        self._base_rate = base_rate
        self._logits = np.zeros(n_signals, dtype=np.float64)
        self._n_updates = 0
        self._grad_logits_ema = np.zeros(n_signals, dtype=np.float64)
        self._weights_avg = np.full(n_signals, 1.0 / n_signals, dtype=np.float64)

    @property
    def n_signals(self) -> int:
        return self._n_signals

    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def base_rate(self):
        return self._base_rate

    @property
    def weights(self) -> np.ndarray:
        """Current weights: softmax of internal logits."""
        z = self._logits - np.max(self._logits)
        e = np.exp(z)
        return e / np.sum(e)

    @property
    def averaged_weights(self) -> np.ndarray:
        """Polyak-averaged weights (in the simplex) for stable inference."""
        return self._weights_avg.copy()

    def _scale(self) -> float:
        return self._n_signals ** self._alpha

    @on_host
    def __call__(self, probs, use_averaged: bool = False):
        probs = np.asarray(probs, dtype=np.float64)
        if probs.shape[-1] != self._n_signals:
            raise ValueError(
                f"probs last dimension {probs.shape[-1]} != n_signals {self._n_signals}"
            )
        if use_averaged:
            # Averaged weights live in the simplex, not logit space: apply
            # the forward formula directly (fusion.py:444-455).
            x = np.asarray(_logit(clamp_probability(probs)))
            l_w = self._scale() * np.sum(self._weights_avg * x, axis=-1)
            if self._logit_base_rate is not None:
                l_w = l_w + self._logit_base_rate
            out = np.asarray(_sigmoid(l_w))
        else:
            out = np.asarray(
                _learnable_forward_jit(
                    self._logits, probs, self._scale(), self._logit_base_rate
                )
            )
        return float(out) if out.ndim == 0 else out

    @on_host
    def fit(self, probs, labels, *, learning_rate=0.01, max_iterations=1000,
            tolerance=1e-6) -> None:
        """Batch GD with the Hebbian gradient (fusion.py:457-535)."""
        probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
        if probs.shape[-1] != self._n_signals:
            raise ValueError(
                f"probs last dimension {probs.shape[-1]} != n_signals {self._n_signals}"
            )
        z, _ = _learnable_fit_jit(
            self._logits, probs, np.asarray(labels, dtype=np.float64),
            self._scale(), self._logit_base_rate,
            learning_rate=learning_rate, max_iterations=max_iterations,
            tolerance=tolerance,
        )
        self._logits = np.asarray(z, dtype=np.float64)
        self._n_updates = 0
        self._grad_logits_ema = np.zeros(self._n_signals, dtype=np.float64)
        self._weights_avg = self.weights.copy()

    @on_host
    def update(self, probs, label, *, learning_rate=0.01, momentum=0.9,
               decay_tau=1000.0, max_grad_norm=1.0, avg_decay=0.995) -> None:
        """Online SGD with EMA/bias-correction/clip/decay + Polyak averaging
        of weights in the simplex (fusion.py:537-629)."""
        probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
        if probs.shape[-1] != self._n_signals:
            raise ValueError(
                f"probs last dimension {probs.shape[-1]} != n_signals {self._n_signals}"
            )
        state = gd.OnlineState(
            params=self._logits,
            grad_ema=self._grad_logits_ema,
            params_avg=self._weights_avg,
            n_updates=np.int32(self._n_updates),
        )
        new = _learnable_step_jit(
            state, probs, np.asarray(label, dtype=np.float64),
            self._scale(), self._logit_base_rate,
            learning_rate=learning_rate, momentum=momentum,
            decay_tau=decay_tau, max_grad_norm=max_grad_norm,
            avg_decay=avg_decay,
        )
        self._logits = np.asarray(new.params, dtype=np.float64)
        self._grad_logits_ema = np.asarray(new.grad_ema, dtype=np.float64)
        self._weights_avg = np.asarray(new.params_avg, dtype=np.float64)
        self._n_updates = int(new.n_updates)


class AttentionLogOddsWeights:
    """Query-dependent signal weighting via linear-softmax attention.

    w(q) = softmax(W @ query_features + b); fused probability is the
    weighted log-odds conjunction. Supports per-signal logit min-max
    normalization (optionally per query group) and exact pruning via
    fused upper bounds (Theorem 8.7.1). Reference: fusion.py:639-1143.
    """

    def __init__(self, n_signals: int, n_query_features: int, alpha=0.5,
                 normalize: bool = False, seed: int = 0, base_rate=None):
        if n_signals < 1:
            raise ValueError(f"n_signals must be >= 1, got {n_signals}")
        if n_query_features < 1:
            raise ValueError(
                f"n_query_features must be >= 1, got {n_query_features}"
            )
        self._logit_base_rate = _check_base_rate(base_rate)
        self._n_signals = int(n_signals)
        self._n_query_features = int(n_query_features)
        self._alpha = resolve_alpha(alpha, default=0.5)
        self._normalize = bool(normalize)
        self._base_rate = base_rate

        rng = np.random.default_rng(seed)
        init_scale = 1.0 / np.sqrt(n_query_features)
        self._W = rng.normal(0, init_scale, size=(n_signals, n_query_features))
        self._b = np.zeros(n_signals, dtype=np.float64)

        self._n_updates = 0
        self._grad_W_ema = np.zeros_like(self._W)
        self._grad_b_ema = np.zeros_like(self._b)
        self._W_avg = self._W.copy()
        self._b_avg = self._b.copy()

    @property
    def n_signals(self) -> int:
        return self._n_signals

    @property
    def n_query_features(self) -> int:
        return self._n_query_features

    @property
    def alpha(self) -> float:
        return self._alpha

    @property
    def base_rate(self):
        return self._base_rate

    @property
    def normalize(self) -> bool:
        return self._normalize

    @property
    def weights_matrix(self) -> np.ndarray:
        return self._W.copy()

    def _params(self, use_averaged: bool) -> FL.AttentionParams:
        if use_averaged:
            return FL.AttentionParams(self._W_avg, self._b_avg)
        return FL.AttentionParams(self._W, self._b)

    def _scale(self) -> float:
        return self._n_signals ** self._alpha

    def _compute_weights(self, query_features, use_averaged: bool = False):
        return np.asarray(
            FL.attention_weights(self._params(use_averaged), query_features)
        )

    @on_host
    def __call__(self, probs, query_features, use_averaged: bool = False):
        probs_arr = np.asarray(probs, dtype=np.float64)
        scalar = probs_arr.ndim == 1
        out = np.asarray(
            _attention_forward_jit(
                self._params(use_averaged), probs_arr, query_features,
                self._scale(), self._logit_base_rate,
                normalize=self._normalize,
                # A single 1-D sample has no candidate set to normalize
                # across (fusion.py:803-814).
                skip_normalize=scalar,
            )
        )
        if scalar:
            return float(out[0]) if out.ndim else float(out)
        return np.atleast_1d(out)

    @on_host
    def fit(self, probs, labels, query_features, *, query_ids=None,
            learning_rate=0.01, max_iterations=1000, tolerance=1e-6) -> None:
        """Batch GD on BCE through the softmax Jacobian (fusion.py:830-935).

        With ``normalize=True`` and ``query_ids``, logits are min-max
        normalized within each query group (segment ops, not a Python loop).
        """
        probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        seg = None
        num_seg = None
        if self._normalize and query_ids is not None:
            _, seg = np.unique(np.asarray(query_ids), return_inverse=True)
            num_seg = int(seg.max()) + 1 if seg.size else 1
            seg = seg.astype(np.int32)
        params, _ = _attention_fit_jit(
            self._params(False), probs, np.asarray(labels, dtype=np.float64),
            qf, self._scale(), self._logit_base_rate,
            normalize=self._normalize, segment_ids=seg, num_segments=num_seg,
            learning_rate=learning_rate, max_iterations=max_iterations,
            tolerance=tolerance,
        )
        self._W = np.asarray(params.W, dtype=np.float64)
        self._b = np.asarray(params.b, dtype=np.float64)
        self._n_updates = 0
        self._grad_W_ema = np.zeros_like(self._W)
        self._grad_b_ema = np.zeros_like(self._b)
        self._W_avg = self._W.copy()
        self._b_avg = self._b.copy()

    @on_host
    def update(self, probs, label, query_features, *, learning_rate=0.01,
               momentum=0.9, decay_tau=1000.0, max_grad_norm=1.0,
               avg_decay=0.995) -> None:
        """Online SGD update (fusion.py:937-1037)."""
        state = gd.OnlineState(
            params=FL.AttentionParams(self._W, self._b),
            grad_ema=FL.AttentionParams(self._grad_W_ema, self._grad_b_ema),
            params_avg=FL.AttentionParams(self._W_avg, self._b_avg),
            n_updates=np.int32(self._n_updates),
        )
        new = _attention_step_jit(
            state, np.asarray(probs, dtype=np.float64),
            np.asarray(label, dtype=np.float64),
            np.asarray(query_features, dtype=np.float64),
            self._scale(), self._logit_base_rate,
            normalize=self._normalize,
            learning_rate=learning_rate, momentum=momentum,
            decay_tau=decay_tau, max_grad_norm=max_grad_norm,
            avg_decay=avg_decay,
        )
        self._W = np.asarray(new.params.W, dtype=np.float64)
        self._b = np.asarray(new.params.b, dtype=np.float64)
        self._grad_W_ema = np.asarray(new.grad_ema.W, dtype=np.float64)
        self._grad_b_ema = np.asarray(new.grad_ema.b, dtype=np.float64)
        self._W_avg = np.asarray(new.params_avg.W, dtype=np.float64)
        self._b_avg = np.asarray(new.params_avg.b, dtype=np.float64)
        self._n_updates = int(new.n_updates)

    @on_host
    def compute_upper_bounds(self, upper_bound_probs, query_features,
                             use_averaged: bool = False) -> np.ndarray:
        """Fused probability upper bound per candidate (Theorem 8.7.1)."""
        ub = np.atleast_2d(np.asarray(upper_bound_probs, dtype=np.float64))
        out = np.asarray(
            _attention_forward_jit(
                self._params(use_averaged), ub, query_features,
                self._scale(), self._logit_base_rate,
                normalize=self._normalize, skip_normalize=False,
            )
        )
        return np.atleast_1d(out)

    def prune(self, probs, query_features, threshold, upper_bound_probs=None,
              use_averaged: bool = False):
        """Drop candidates whose fused upper bound is below ``threshold``.

        Host-side ragged result (surviving_indices, fused_probs), matching
        the reference API (fusion.py:1084-1135). Jitted pipelines should use
        masks via ``compute_upper_bounds`` instead.
        """
        probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if upper_bound_probs is None:
            upper_bound_probs = probs
        ub = self.compute_upper_bounds(upper_bound_probs, qf, use_averaged)
        surviving = np.where(ub >= threshold)[0]
        if len(surviving) == 0:
            return surviving, np.array([], dtype=np.float64)
        surv_qf = qf[surviving] if qf.shape[0] > 1 else qf
        fused = self(probs[surviving], surv_qf, use_averaged)
        return surviving, np.atleast_1d(fused)


class MultiHeadAttentionLogOddsWeights:
    """Multiple attention heads seeded 0..n_heads-1; inference averages
    per-head fused log-odds then applies sigmoid. Reference:
    fusion.py:1146-1372. Forward runs as one vmapped kernel over stacked
    head parameters rather than a Python loop."""

    def __init__(self, n_heads: int, n_signals: int, n_query_features: int,
                 alpha=0.5, normalize: bool = False):
        if n_heads < 1:
            raise ValueError(f"n_heads must be >= 1, got {n_heads}")
        self._n_heads = int(n_heads)
        self._heads = [
            AttentionLogOddsWeights(
                n_signals=n_signals, n_query_features=n_query_features,
                alpha=alpha, normalize=normalize, seed=h,
            )
            for h in range(n_heads)
        ]

    @property
    def n_heads(self) -> int:
        return self._n_heads

    @property
    def heads(self) -> list:
        return list(self._heads)

    def _stacked(self, use_averaged: bool) -> FL.AttentionParams:
        return FL.stack_heads([h._params(use_averaged) for h in self._heads])

    @on_host
    def __call__(self, probs, query_features, use_averaged: bool = False):
        probs_arr = np.asarray(probs, dtype=np.float64)
        scalar = probs_arr.ndim == 1
        h0 = self._heads[0]
        out = np.asarray(
            _multihead_forward_jit(
                self._stacked(use_averaged), probs_arr, query_features,
                h0._scale(), h0._logit_base_rate,
                normalize=h0._normalize, skip_normalize=scalar,
            )
        )
        if scalar:
            return float(out[0]) if out.ndim else float(out)
        return np.atleast_1d(out)

    @on_host
    def fit(self, probs, labels, query_features, **kwargs) -> None:
        """Train all heads on the same data (diversity from seeds)."""
        for head in self._heads:
            head.fit(probs, labels, query_features, **kwargs)

    @on_host
    def update(self, probs, label, query_features, **kwargs) -> None:
        for head in self._heads:
            head.update(probs, label, query_features, **kwargs)

    @on_host
    def compute_upper_bounds(self, upper_bound_probs, query_features,
                             use_averaged: bool = False) -> np.ndarray:
        """Average per-head upper-bound log-odds, then sigmoid
        (Corollary 8.7.2)."""
        ub = np.atleast_2d(np.asarray(upper_bound_probs, dtype=np.float64))
        h0 = self._heads[0]
        out = np.asarray(
            _multihead_forward_jit(
                self._stacked(use_averaged), ub, query_features,
                h0._scale(), h0._logit_base_rate,
                normalize=h0._normalize, skip_normalize=False,
            )
        )
        return np.atleast_1d(out)

    def prune(self, probs, query_features, threshold, upper_bound_probs=None,
              use_averaged: bool = False):
        probs = np.atleast_2d(np.asarray(probs, dtype=np.float64))
        qf = np.atleast_2d(np.asarray(query_features, dtype=np.float64))
        if upper_bound_probs is None:
            upper_bound_probs = probs
        ub = self.compute_upper_bounds(upper_bound_probs, qf, use_averaged)
        surviving = np.where(ub >= threshold)[0]
        if len(surviving) == 0:
            return surviving, np.array([], dtype=np.float64)
        surv_qf = qf[surviving] if qf.shape[0] > 1 else qf
        fused = self(probs[surviving], surv_qf, use_averaged)
        return surviving, np.atleast_1d(np.asarray(fused, dtype=np.float64))

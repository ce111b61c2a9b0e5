"""FusionDebugger: white-box tracing of the probability/fusion pipeline.

API parity with the reference debugger (bayesian_bm25/debug.py): typed trace
dataclasses capturing every intermediate (likelihood, priors, logits,
base-rate contribution, gating, fusion aggregates), a dispatching
``trace_fusion``, document-level composition, two-document comparison with
dominant-signal/crossover detection, and text formatters.

Tracing is host-side scalar work by design — it exists to *explain* single
documents, while the batched device kernels serve the hot path. Values are
computed with the same model methods the kernels use, so a trace always
equals the pipeline output (verified in tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from bayesian_bm25_tpu.api_fusion import cosine_to_probability, prob_not
from bayesian_bm25_tpu.models.probability import (
    BayesianProbabilityTransform,
    logit,
    sigmoid,
)
from bayesian_bm25_tpu.ops.fusion import apply_gating


@dataclass
class BM25SignalTrace:
    """One BM25 score through the full probability pipeline."""

    raw_score: float
    tf: float
    doc_len_ratio: float
    likelihood: float
    tf_prior: float
    norm_prior: float
    composite_prior: float
    logit_likelihood: float
    logit_prior: float
    logit_base_rate: float | None
    posterior: float
    alpha: float
    beta: float
    base_rate: float | None


@dataclass
class VectorSignalTrace:
    """A cosine similarity (or calibrated distance) through conversion."""

    cosine_score: float
    probability: float
    logit_probability: float
    distance: float | None = None
    f_R: float | None = None
    f_G: float | None = None
    log_density_ratio: float | None = None
    calibration_method: str | None = None


@dataclass
class NotTrace:
    """A probabilistic NOT: complement + logit sign flip."""

    input_probability: float
    input_name: str
    complement: float
    logit_input: float
    logit_complement: float


@dataclass
class FusionTrace:
    """The combination step across probability signals."""

    signal_probabilities: list
    signal_names: list
    method: str
    logits: list | None
    mean_logit: float | None
    alpha: float | None
    n_alpha_scale: float | None
    scaled_logit: float | None
    weights: list | None
    fused_probability: float
    gating: str | None = None
    gating_beta: float | None = None
    log_probs: list | None = None
    log_prob_sum: float | None = None
    complements: list | None = None
    log_complements: list | None = None
    log_complement_sum: float | None = None


@dataclass
class DocumentTrace:
    """All signals + fusion for one document."""

    doc_id: object
    signals: dict
    fusion: FusionTrace
    final_probability: float


@dataclass
class ComparisonResult:
    """Two documents compared: per-signal deltas, dominant signal, crossover."""

    doc_a: DocumentTrace
    doc_b: DocumentTrace
    signal_deltas: dict
    dominant_signal: str
    crossover_stage: str | None


def _clamp(p: float) -> float:
    return float(np.clip(p, 1e-10, 1.0 - 1e-10))


class FusionDebugger:
    """Traces intermediate values through the fusion pipeline."""

    def __init__(self, transform: BayesianProbabilityTransform) -> None:
        self._transform = transform

    # -- signal traces -----------------------------------------------------

    def trace_bm25(self, score: float, tf: float, doc_len_ratio: float
                   ) -> BM25SignalTrace:
        t = self._transform
        L = float(t.likelihood(score))
        p_tf = float(t.tf_prior(tf))
        p_norm = float(t.norm_prior(doc_len_ratio))
        p_comp = float(t.composite_prior(tf, doc_len_ratio))
        post = float(t.posterior(L, p_comp, base_rate=t.base_rate))
        return BM25SignalTrace(
            raw_score=score, tf=tf, doc_len_ratio=doc_len_ratio,
            likelihood=L, tf_prior=p_tf, norm_prior=p_norm,
            composite_prior=p_comp,
            logit_likelihood=float(logit(L)),
            logit_prior=float(logit(p_comp)),
            logit_base_rate=(
                float(logit(t.base_rate)) if t.base_rate is not None else None
            ),
            posterior=post, alpha=t.alpha, beta=t.beta, base_rate=t.base_rate,
        )

    def trace_vector(self, cosine_score: float) -> VectorSignalTrace:
        p = float(cosine_to_probability(cosine_score))
        return VectorSignalTrace(
            cosine_score=cosine_score, probability=p,
            logit_probability=float(logit(p)),
        )

    def trace_calibrated_vector(
        self, distance: float, probability: float, *,
        f_R: float | None = None, calibration_method: str | None = None,
        calibrator: object | None = None,
    ) -> VectorSignalTrace:
        """Trace a VPT-calibrated distance; with a calibrator, also records
        the background density f_G and the log density ratio."""
        f_G = None
        log_ratio = None
        if calibrator is not None:
            mu_G = getattr(calibrator, "mu_G", None)
            sigma_G = getattr(calibrator, "sigma_G", None)
            if mu_G is not None and sigma_G is not None:
                z = (distance - mu_G) / sigma_G
                f_G = float(
                    np.exp(-0.5 * z * z) / (sigma_G * np.sqrt(2 * np.pi))
                )
                if f_R is not None:
                    log_ratio = float(
                        np.log(max(f_R, 1e-10) / max(f_G, 1e-10))
                    )
        return VectorSignalTrace(
            cosine_score=distance, probability=probability,
            logit_probability=float(logit(probability)),
            distance=distance, f_R=f_R, f_G=f_G,
            log_density_ratio=log_ratio, calibration_method=calibration_method,
        )

    def trace_not(self, probability: float, *, name: str = "signal") -> NotTrace:
        comp = float(prob_not(probability))
        return NotTrace(
            input_probability=probability, input_name=name, complement=comp,
            logit_input=float(logit(probability)),
            logit_complement=float(logit(comp)),
        )

    # -- fusion traces -------------------------------------------------------

    def trace_fusion(
        self, probabilities, *, names=None, method: str = "log_odds",
        alpha: float | None = None, weights=None, gating: str | None = None,
        gating_beta: float | None = None,
    ) -> FusionTrace:
        probs = [float(p) for p in probabilities]
        n = len(probs)
        if names is None:
            names = [f"signal_{i}" for i in range(n)]
        if method == "log_odds":
            return self._trace_log_odds(probs, names, alpha, weights,
                                        gating, gating_beta)
        if method == "prob_and":
            return self._trace_product(probs, names, "prob_and")
        if method == "prob_or":
            return self._trace_complement(probs, names, "prob_or")
        if method == "prob_not":
            return self._trace_complement(probs, names, "prob_not")
        raise ValueError(
            f"method must be 'log_odds', 'prob_and', 'prob_or', or"
            f" 'prob_not', got {method!r}"
        )

    def _trace_log_odds(self, probs, names, alpha, weights, gating,
                        gating_beta) -> FusionTrace:
        n = len(probs)
        clamped = [_clamp(p) for p in probs]
        raw = np.array([float(logit(p)) for p in clamped])
        if gating is not None and gating != "none":
            beta = 1.0 if gating_beta is None else gating_beta
            gated = [float(v) for v in np.asarray(apply_gating(raw, gating, beta))]
        else:
            gated = [float(v) for v in raw]

        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            eff_alpha = 0.0 if alpha is None else alpha
            scale = float(n ** eff_alpha)
            weighted = float(np.sum(w * np.array(gated)))
            scaled = scale * weighted
            return FusionTrace(
                signal_probabilities=clamped, signal_names=names,
                method="log_odds", logits=gated, mean_logit=weighted,
                alpha=eff_alpha, n_alpha_scale=scale, scaled_logit=scaled,
                weights=[float(x) for x in w],
                fused_probability=float(sigmoid(scaled)),
                gating=gating, gating_beta=gating_beta,
            )

        eff_alpha = 0.5 if alpha is None else alpha
        mean_l = float(np.mean(gated))
        scale = float(n ** eff_alpha)
        scaled = mean_l * scale
        return FusionTrace(
            signal_probabilities=clamped, signal_names=names,
            method="log_odds", logits=gated, mean_logit=mean_l,
            alpha=eff_alpha, n_alpha_scale=scale, scaled_logit=scaled,
            weights=None, fused_probability=float(sigmoid(scaled)),
            gating=gating, gating_beta=gating_beta,
        )

    def _trace_product(self, probs, names, method) -> FusionTrace:
        clamped = [_clamp(p) for p in probs]
        logs = [float(np.log(p)) for p in clamped]
        s = float(np.sum(logs))
        return FusionTrace(
            signal_probabilities=clamped, signal_names=names, method=method,
            logits=None, mean_logit=None, alpha=None, n_alpha_scale=None,
            scaled_logit=None, weights=None,
            fused_probability=float(np.exp(s)),
            log_probs=logs, log_prob_sum=s,
        )

    def _trace_complement(self, probs, names, method) -> FusionTrace:
        """prob_or: 1 - prod(1-p); prob_not: prod(1-p) (none relevant)."""
        clamped = [_clamp(p) for p in probs]
        comps = [float(1.0 - p) for p in clamped]
        logs = [float(np.log(c)) for c in comps]
        s = float(np.sum(logs))
        fused = float(np.exp(s)) if method == "prob_not" else float(1.0 - np.exp(s))
        return FusionTrace(
            signal_probabilities=clamped, signal_names=names, method=method,
            logits=None, mean_logit=None, alpha=None, n_alpha_scale=None,
            scaled_logit=None, weights=None, fused_probability=fused,
            complements=comps, log_complements=logs, log_complement_sum=s,
        )

    # -- document-level --------------------------------------------------------

    def trace_document(
        self, *, bm25_score=None, tf=None, doc_len_ratio=None,
        cosine_score=None, method: str = "log_odds", alpha=None,
        weights=None, doc_id=None,
    ) -> DocumentTrace:
        signals: dict = {}
        probs: list = []
        names: list = []
        if bm25_score is not None:
            if tf is None or doc_len_ratio is None:
                raise ValueError(
                    "tf and doc_len_ratio are required when bm25_score is provided"
                )
            bt = self.trace_bm25(bm25_score, tf, doc_len_ratio)
            signals["BM25"] = bt
            probs.append(bt.posterior)
            names.append("BM25")
        if cosine_score is not None:
            vt = self.trace_vector(cosine_score)
            signals["Vector"] = vt
            probs.append(vt.probability)
            names.append("Vector")
        if not probs:
            raise ValueError(
                "At least one of bm25_score or cosine_score must be provided"
            )
        ft = self.trace_fusion(probs, names=names, method=method,
                               alpha=alpha, weights=weights)
        return DocumentTrace(
            doc_id=doc_id, signals=signals, fusion=ft,
            final_probability=ft.fused_probability,
        )

    def compare(self, trace_a: DocumentTrace, trace_b: DocumentTrace
                ) -> ComparisonResult:
        names = list(dict.fromkeys(
            list(trace_a.signals) + list(trace_b.signals)
        ))
        deltas = {
            n: self._signal_probability(trace_a, n)
            - self._signal_probability(trace_b, n)
            for n in names
        }
        dominant = max(deltas, key=lambda k: abs(deltas[k]))
        fused_delta = trace_a.final_probability - trace_b.final_probability
        crossover = None
        for n, d in deltas.items():
            if n == dominant:
                continue
            if fused_delta != 0.0 and d != 0.0 and (fused_delta > 0) != (d > 0):
                crossover = n
                break
        return ComparisonResult(trace_a, trace_b, deltas, dominant, crossover)

    @staticmethod
    def _signal_probability(trace: DocumentTrace, name: str) -> float:
        sig = trace.signals.get(name)
        if sig is None:
            return 0.5
        if isinstance(sig, BM25SignalTrace):
            return sig.posterior
        if isinstance(sig, VectorSignalTrace):
            return sig.probability
        return 0.5

    # -- formatting --------------------------------------------------------------

    def format_not(self, trace: NotTrace) -> str:
        return "\n".join([
            f"  [NOT {trace.input_name}]",
            f"    P({trace.input_name}) = {trace.input_probability:.3f}",
            f"    P(NOT {trace.input_name}) = 1 - {trace.input_probability:.3f}"
            f" = {trace.complement:.3f}",
            f"    logit({trace.input_probability:.3f}) = {trace.logit_input:+.3f}",
            f"    logit({trace.complement:.3f}) = {trace.logit_complement:+.3f}"
            f"  (sign flipped)",
        ])

    def format_trace(self, trace: DocumentTrace, *, verbose: bool = True) -> str:
        lines = [f"Document: {trace.doc_id if trace.doc_id is not None else 'unknown'}"]
        for name, sig in trace.signals.items():
            if isinstance(sig, BM25SignalTrace):
                lines.append(
                    f"  [{name}] raw={sig.raw_score:.2f}"
                    f" -> likelihood={sig.likelihood:.3f}"
                    f" (alpha={sig.alpha:.2f}, beta={sig.beta:.2f})"
                )
                lines.append(f"         tf={sig.tf:.0f} -> tf_prior={sig.tf_prior:.3f}")
                lines.append(
                    f"         dl_ratio={sig.doc_len_ratio:.2f}"
                    f" -> norm_prior={sig.norm_prior:.3f}"
                )
                lines.append(f"         composite_prior={sig.composite_prior:.3f}")
                if sig.base_rate is not None:
                    no_br = float(self._transform.posterior(
                        sig.likelihood, sig.composite_prior, base_rate=None
                    ))
                    lines.append(f"         posterior={no_br:.3f}")
                    lines.append(
                        f"         with base_rate={sig.base_rate:.3f}:"
                        f" posterior={sig.posterior:.3f}"
                    )
                else:
                    lines.append(f"         posterior={sig.posterior:.3f}")
                if verbose:
                    lines.append(
                        f"         logit(posterior)={float(logit(sig.posterior)):.3f}"
                    )
                lines.append("")
            elif isinstance(sig, VectorSignalTrace):
                lines.append(
                    f"  [{name}] cosine={sig.cosine_score:.3f}"
                    f" -> prob={sig.probability:.3f}"
                )
                if verbose:
                    lines.append(f"           logit(prob)={sig.logit_probability:.3f}")
                lines.append("")

        f = trace.fusion
        alpha_str = f", alpha={f.alpha}" if f.alpha is not None else ""
        gating_str = ""
        if f.gating is not None and f.gating != "none":
            gating_str = f", gating={f.gating}"
            if f.gating_beta is not None and f.gating != "gelu":
                gating_str += f"(beta={f.gating_beta})"
        lines.append(
            f"  [Fusion] method={f.method}{alpha_str},"
            f" n={len(f.signal_probabilities)}{gating_str}"
        )
        if verbose:
            if f.logits is not None:
                lines.append(
                    "           logits=["
                    + ", ".join(f"{v:.3f}" for v in f.logits) + "]"
                )
            if f.mean_logit is not None:
                lines.append(f"           mean_logit={f.mean_logit:.3f}")
            if f.n_alpha_scale is not None:
                lines.append(
                    f"           n^alpha={f.n_alpha_scale:.3f},"
                    f" scaled={f.scaled_logit:.3f}"
                )
            if f.weights is not None:
                lines.append(
                    "           weights=["
                    + ", ".join(f"{w:.3f}" for w in f.weights) + "]"
                )
            if f.log_probs is not None:
                lines.append(
                    "           ln(P)=["
                    + ", ".join(f"{v:.3f}" for v in f.log_probs) + "]"
                )
                lines.append(f"           sum(ln(P))={f.log_prob_sum:.3f}")
            if f.complements is not None:
                lines.append(
                    "           1-P=["
                    + ", ".join(f"{v:.3f}" for v in f.complements) + "]"
                )
            if f.log_complements is not None:
                lines.append(
                    "           ln(1-P)=["
                    + ", ".join(f"{v:.3f}" for v in f.log_complements) + "]"
                )
                lines.append(
                    f"           sum(ln(1-P))={f.log_complement_sum:.3f}"
                )
        lines.append(f"           -> final={f.fused_probability:.3f}")
        return "\n".join(lines)

    def format_summary(self, trace: DocumentTrace) -> str:
        parts = []
        for _name, sig in trace.signals.items():
            if isinstance(sig, BM25SignalTrace):
                parts.append(f"BM25={sig.posterior:.3f}")
            elif isinstance(sig, VectorSignalTrace):
                parts.append(f"Vec={sig.probability:.3f}")
        f = trace.fusion
        alpha_str = f", alpha={f.alpha}" if f.alpha is not None else ""
        label = trace.doc_id if trace.doc_id is not None else "unknown"
        return (
            f"{label}: {' '.join(parts)}"
            f" -> Fused={f.fused_probability:.3f} ({f.method}{alpha_str})"
        )

    def format_comparison(self, comparison: ComparisonResult) -> str:
        a, b = comparison.doc_a, comparison.doc_b
        a_label = a.doc_id if a.doc_id is not None else "doc_a"
        b_label = b.doc_id if b.doc_id is not None else "doc_b"
        lines = [
            f"Comparison: {a_label} vs {b_label}",
            f"  {'Signal':<12} {str(a_label):>8}  {str(b_label):>8}"
            f"  {'delta':>8}   dominant",
        ]
        for name, delta in comparison.signal_deltas.items():
            pa = self._signal_probability(a, name)
            pb = self._signal_probability(b, name)
            marker = "   <-- largest" if name == comparison.dominant_signal else ""
            lines.append(
                f"  {name:<12} {pa:>8.3f}  {pb:>8.3f}  {delta:>+8.3f}{marker}"
            )
        fused_delta = a.final_probability - b.final_probability
        lines.append(
            f"  {'Fused':<12} {a.final_probability:>8.3f}"
            f"  {b.final_probability:>8.3f}  {fused_delta:>+8.3f}"
        )
        lines.append("")
        if fused_delta > 0:
            lines.append(f"  Rank order: {a_label} > {b_label} (by {fused_delta:+.3f})")
        elif fused_delta < 0:
            lines.append(
                f"  Rank order: {b_label} > {a_label} (by +{abs(fused_delta):.3f})"
            )
        else:
            lines.append("  Rank order: tied")
        dom = comparison.dominant_signal
        dom_delta = comparison.signal_deltas[dom]
        favored = a_label if dom_delta >= 0 else b_label
        lines.append(
            f"  Dominant signal: {dom} ({dom_delta:+.3f} in {favored}'s favor)"
        )
        if comparison.crossover_stage is not None:
            cross = comparison.crossover_stage
            cf = a_label if comparison.signal_deltas[cross] >= 0 else b_label
            lines.append(
                f"  Note: {cross} favored {cf}, but {dom} signal outweighed it"
            )
        return "\n".join(lines)

"""FusionDebugger breadth: reference test classes not covered elsewhere.

Mirrors the behavior inventory of the reference's tests/test_debug.py
(trace field semantics, hierarchical composition, formatter content,
compare semantics, lazy import) against this package's tracer."""

import numpy as np
import pytest

import bayesian_bm25_tpu as bb
from bayesian_bm25_tpu import (
    BayesianProbabilityTransform,
    log_odds_conjunction,
    prob_and,
    prob_not,
    prob_or,
)
from bayesian_bm25_tpu.ops.mathx import logit
from bayesian_bm25_tpu.utils.debug import (
    BM25SignalTrace,
    ComparisonResult,
    DocumentTrace,
    FusionDebugger,
    FusionTrace,
    NotTrace,
    VectorSignalTrace,
)


@pytest.fixture
def debugger():
    return FusionDebugger(BayesianProbabilityTransform(alpha=1.0, beta=2.0))


@pytest.fixture
def debugger_br():
    return FusionDebugger(
        BayesianProbabilityTransform(alpha=1.0, beta=2.0, base_rate=0.01))


class TestTraceBM25Fields:
    def test_logit_values(self, debugger):
        t = debugger.trace_bm25(3.0, 2.0, 1.0)
        assert t.logit_likelihood == pytest.approx(
            float(logit(t.likelihood)), rel=1e-6)
        assert t.logit_prior == pytest.approx(
            float(logit(t.composite_prior)), rel=1e-6)
        assert t.logit_base_rate is None

    def test_params_snapshot(self, debugger_br):
        t = debugger_br.trace_bm25(3.0, 2.0, 1.0)
        assert t.alpha == 1.0 and t.beta == 2.0 and t.base_rate == 0.01
        assert t.logit_base_rate == pytest.approx(float(logit(0.01)), rel=1e-6)

    def test_base_rate_changes_posterior(self, debugger, debugger_br):
        plain = debugger.trace_bm25(3.0, 2.0, 1.0)
        br = debugger_br.trace_bm25(3.0, 2.0, 1.0)
        assert br.posterior < plain.posterior

    def test_extreme_score(self, debugger):
        t = debugger.trace_bm25(1000.0, 5.0, 1.0)
        assert t.likelihood == pytest.approx(1.0, abs=1e-6)
        assert 0.0 < t.posterior < 1.0
        assert np.isfinite(t.logit_likelihood)

    def test_zero_score(self, debugger):
        t = debugger.trace_bm25(0.0, 0.0, 1.0)
        assert 0.0 < t.posterior < 1.0
        assert t.tf_prior == pytest.approx(0.2)

    def test_returns_trace_type(self, debugger):
        assert isinstance(debugger.trace_bm25(1.0, 1.0, 1.0), BM25SignalTrace)


class TestTraceVectorRange:
    def test_zero_cosine_is_half(self, debugger):
        assert debugger.trace_vector(0.0).probability == pytest.approx(0.5)

    def test_high_cosine(self, debugger):
        t = debugger.trace_vector(0.9)
        assert t.probability == pytest.approx(0.95, rel=1e-6)

    def test_negative_cosine(self, debugger):
        assert debugger.trace_vector(-0.6).probability == pytest.approx(
            0.2, rel=1e-6)

    def test_returns_trace_type(self, debugger):
        t = debugger.trace_vector(0.4)
        assert isinstance(t, VectorSignalTrace)
        assert t.logit_probability == pytest.approx(
            float(logit(t.probability)), rel=1e-6)


class TestTraceFusionSurface:
    def test_explicit_alpha(self, debugger):
        probs = [0.8, 0.7]
        t = debugger.trace_fusion(probs, alpha=0.25)
        assert t.alpha == 0.25
        assert t.fused_probability == pytest.approx(
            float(log_odds_conjunction(np.array(probs), alpha=0.25)), rel=1e-6)

    def test_weighted_with_alpha(self, debugger):
        probs = [0.8, 0.6]
        w = [0.7, 0.3]
        t = debugger.trace_fusion(probs, weights=w, alpha=0.5)
        assert t.fused_probability == pytest.approx(
            float(log_odds_conjunction(
                np.array(probs), weights=np.array(w), alpha=0.5)), rel=1e-6)

    def test_default_signal_names(self, debugger):
        t = debugger.trace_fusion([0.7, 0.8, 0.9])
        assert t.signal_names == ["signal_0", "signal_1", "signal_2"]

    def test_custom_signal_names(self, debugger):
        t = debugger.trace_fusion([0.7, 0.8], names=["bm25", "vec"])
        assert t.signal_names == ["bm25", "vec"]

    def test_single_signal(self, debugger):
        t = debugger.trace_fusion([0.7])
        assert t.fused_probability == pytest.approx(
            float(log_odds_conjunction(np.array([0.7]))), rel=1e-6)

    def test_invalid_method_raises(self, debugger):
        with pytest.raises(ValueError):
            debugger.trace_fusion([0.5], method="xor")

    def test_returns_fusion_trace(self, debugger):
        assert isinstance(debugger.trace_fusion([0.5, 0.6]), FusionTrace)

    def test_prob_and_intermediates(self, debugger):
        t = debugger.trace_fusion([0.8, 0.5], method="prob_and")
        np.testing.assert_allclose(t.log_probs, np.log([0.8, 0.5]), rtol=1e-9)
        assert t.log_prob_sum == pytest.approx(float(np.log(0.4)), rel=1e-9)
        assert t.fused_probability == pytest.approx(0.4, rel=1e-9)

    def test_prob_or_intermediates(self, debugger):
        t = debugger.trace_fusion([0.8, 0.5], method="prob_or")
        np.testing.assert_allclose(t.complements, [0.2, 0.5], rtol=1e-9)
        assert t.log_complement_sum == pytest.approx(
            float(np.log(0.1)), rel=1e-9)
        assert t.fused_probability == pytest.approx(0.9, rel=1e-9)

    def test_prob_not_is_complement_of_prob_or(self, debugger):
        probs = [0.6, 0.3, 0.8]
        t_or = debugger.trace_fusion(probs, method="prob_or")
        t_not = debugger.trace_fusion(probs, method="prob_not")
        assert t_not.fused_probability == pytest.approx(
            1.0 - t_or.fused_probability, rel=1e-9)

    def test_prob_not_single_signal(self, debugger):
        t = debugger.trace_fusion([0.73], method="prob_not")
        assert t.fused_probability == pytest.approx(
            float(prob_not(0.73)), rel=1e-6)


class TestTraceNotSurface:
    def test_half(self, debugger):
        t = debugger.trace_not(0.5)
        assert t.complement == pytest.approx(0.5)
        assert t.logit_complement == pytest.approx(-t.logit_input, abs=1e-9)

    def test_near_bounds(self, debugger):
        assert debugger.trace_not(1e-6).complement == pytest.approx(
            1.0, abs=1e-5)
        assert debugger.trace_not(1.0 - 1e-6).complement == pytest.approx(
            0.0, abs=1e-5)

    def test_involution(self, debugger):
        t1 = debugger.trace_not(0.3)
        t2 = debugger.trace_not(t1.complement)
        assert t2.complement == pytest.approx(0.3, rel=1e-9)

    def test_default_name(self, debugger):
        assert debugger.trace_not(0.4).input_name == "signal"
        assert debugger.trace_not(0.4, name="spam").input_name == "spam"

    def test_returns_not_trace(self, debugger):
        assert isinstance(debugger.trace_not(0.4), NotTrace)


class TestTraceDocumentSurface:
    def test_bm25_only(self, debugger):
        t = debugger.trace_document(bm25_score=3.0, tf=2.0, doc_len_ratio=1.0)
        assert set(t.signals) == {"BM25"}
        assert isinstance(t, DocumentTrace)

    def test_vector_only(self, debugger):
        t = debugger.trace_document(cosine_score=0.7)
        assert set(t.signals) == {"Vector"}

    def test_fusion_method_recorded(self, debugger):
        t = debugger.trace_document(
            bm25_score=3.0, tf=2.0, doc_len_ratio=1.0, cosine_score=0.7,
            method="prob_and")
        assert t.fusion.method == "prob_and"

    def test_final_probability_matches_fusion_functions(self, debugger):
        t = debugger.trace_document(
            bm25_score=3.0, tf=2.0, doc_len_ratio=1.0, cosine_score=0.7)
        expected = float(log_odds_conjunction(np.array(
            [t.signals["BM25"].posterior, t.signals["Vector"].probability])))
        assert t.final_probability == pytest.approx(expected, rel=1e-6)

    def test_consistency_with_individual_traces(self, debugger):
        doc = debugger.trace_document(
            bm25_score=3.0, tf=2.0, doc_len_ratio=1.0, cosine_score=0.7)
        solo_b = debugger.trace_bm25(3.0, 2.0, 1.0)
        solo_v = debugger.trace_vector(0.7)
        assert doc.signals["BM25"].posterior == pytest.approx(
            solo_b.posterior, rel=1e-9)
        assert doc.signals["Vector"].probability == pytest.approx(
            solo_v.probability, rel=1e-9)


class TestCompareSurface:
    def _docs(self, debugger, cos_a=0.9, cos_b=0.3):
        a = debugger.trace_document(
            bm25_score=3.0, tf=2.0, doc_len_ratio=1.0, cosine_score=cos_a,
            doc_id="A")
        b = debugger.trace_document(
            bm25_score=3.0, tf=2.0, doc_len_ratio=1.0, cosine_score=cos_b,
            doc_id="B")
        return a, b

    def test_signal_delta_values(self, debugger):
        a, b = self._docs(debugger)
        cmp = debugger.compare(a, b)
        assert cmp.signal_deltas["BM25"] == pytest.approx(0.0, abs=1e-9)
        assert cmp.signal_deltas["Vector"] == pytest.approx(
            a.signals["Vector"].probability - b.signals["Vector"].probability,
            rel=1e-9)

    def test_dominant_signal(self, debugger):
        a, b = self._docs(debugger)
        assert debugger.compare(a, b).dominant_signal == "Vector"

    def test_no_crossover_when_signals_agree(self, debugger):
        a = debugger.trace_document(
            bm25_score=5.0, tf=4.0, doc_len_ratio=1.0, cosine_score=0.9)
        b = debugger.trace_document(
            bm25_score=1.0, tf=1.0, doc_len_ratio=1.0, cosine_score=0.2)
        assert debugger.compare(a, b).crossover_stage is None

    def test_single_signal_comparison(self, debugger):
        a = debugger.trace_document(cosine_score=0.8, doc_id=1)
        b = debugger.trace_document(cosine_score=0.4, doc_id=2)
        cmp = debugger.compare(a, b)
        assert isinstance(cmp, ComparisonResult)
        assert cmp.dominant_signal == "Vector"


class TestFormatterContent:
    def test_format_trace_contains_doc_id(self, debugger):
        t = debugger.trace_document(cosine_score=0.7, doc_id="doc42")
        assert "doc42" in debugger.format_trace(t)

    def test_format_trace_unknown_doc_id(self, debugger):
        t = debugger.trace_document(cosine_score=0.7)
        assert "unknown" in debugger.format_trace(t)

    def test_format_summary_contains_method_and_doc(self, debugger):
        t = debugger.trace_document(cosine_score=0.7, doc_id="d7",
                                    method="prob_or")
        s = debugger.format_summary(t)
        assert "d7" in s and "prob_or" in s
        assert "\n" not in s  # one line

    def test_format_comparison_contains_both_ids(self, debugger):
        a = debugger.trace_document(cosine_score=0.8, doc_id="first")
        b = debugger.trace_document(cosine_score=0.4, doc_id="second")
        out = debugger.format_comparison(debugger.compare(a, b))
        assert "first" in out and "second" in out

    def test_format_comparison_default_labels(self, debugger):
        a = debugger.trace_document(cosine_score=0.8)
        b = debugger.trace_document(cosine_score=0.4)
        out = debugger.format_comparison(debugger.compare(a, b))
        assert "doc_a" in out and "doc_b" in out

    def test_prob_and_non_verbose_hides_intermediates(self, debugger):
        t = debugger.trace_document(cosine_score=0.7, method="prob_and")
        assert "ln(P)" in debugger.format_trace(t, verbose=True)
        assert "ln(P)" not in debugger.format_trace(t, verbose=False)

    def test_prob_or_non_verbose_hides_intermediates(self, debugger):
        t = debugger.trace_document(cosine_score=0.7, method="prob_or")
        assert "ln(1-P)" in debugger.format_trace(t, verbose=True)
        assert "ln(1-P)" not in debugger.format_trace(t, verbose=False)


class TestHierarchicalComposition:
    def test_and_or_not(self, debugger):
        """AND(OR(title, body), vector, NOT(spam)) step by step."""
        p_title, p_body, p_vec, p_spam = 0.85, 0.70, 0.80, 0.90
        s1 = debugger.trace_fusion([p_title, p_body], method="prob_or",
                                   names=["title", "body"])
        assert s1.fused_probability == pytest.approx(
            float(prob_or(np.array([p_title, p_body]))), rel=1e-9)
        s2 = debugger.trace_not(p_spam, name="spam")
        s3 = debugger.trace_fusion(
            [s1.fused_probability, p_vec, s2.complement],
            names=["OR(title,body)", "vector", "NOT(spam)"],
            method="prob_and")
        expected = float(prob_and(np.array([
            s1.fused_probability, p_vec, float(prob_not(p_spam))])))
        assert s3.fused_probability == pytest.approx(expected, rel=1e-9)

    def test_nested_or_of_ands(self, debugger):
        a, b, c, d = 0.9, 0.8, 0.6, 0.7
        left = debugger.trace_fusion([a, b], method="prob_and")
        right = debugger.trace_fusion([c, d], method="prob_and")
        final = debugger.trace_fusion(
            [left.fused_probability, right.fused_probability],
            method="prob_or")
        expected = float(prob_or(np.array([
            float(prob_and(np.array([a, b]))),
            float(prob_and(np.array([c, d])))])))
        assert final.fused_probability == pytest.approx(expected, rel=1e-9)

    def test_not_into_log_odds(self, debugger):
        nt = debugger.trace_not(0.70)
        fused = debugger.trace_fusion([0.85, nt.complement],
                                      method="log_odds")
        expected = float(log_odds_conjunction(
            np.array([0.85, float(prob_not(0.70))])))
        assert fused.fused_probability == pytest.approx(expected, rel=1e-6)

    def test_full_pipeline_with_base_rate(self, debugger_br):
        """Traced posterior equals the transform's score_to_probability."""
        score, tf, dlr = 3.5, 2.0, 1.1
        t = debugger_br.trace_bm25(score, tf, dlr)
        expected = float(np.asarray(
            debugger_br._transform.score_to_probability(
                np.array([score]), np.array([tf]), np.array([dlr])))[0])
        assert t.posterior == pytest.approx(expected, rel=1e-6)


class TestGatingTraceSurface:
    def test_gating_none_by_default(self, debugger):
        assert debugger.trace_fusion([0.7, 0.8]).gating is None

    def test_gating_and_beta_recorded(self, debugger):
        t = debugger.trace_fusion([0.7, 0.8], gating="swish", gating_beta=2.0)
        assert t.gating == "swish" and t.gating_beta == 2.0

    def test_gelu_recorded(self, debugger):
        assert debugger.trace_fusion([0.7], gating="gelu").gating == "gelu"

    @pytest.mark.parametrize("gate,beta", [
        ("relu", None), ("gelu", None), ("swish", 2.0), ("softplus", 1.5),
    ])
    def test_trace_matches_function(self, debugger, gate, beta):
        probs = [0.8, 0.35]
        kwargs = {} if beta is None else {"gating_beta": beta}
        t = debugger.trace_fusion(probs, gating=gate, **kwargs)
        expected = float(log_odds_conjunction(
            np.array(probs), gating=gate, **kwargs))
        assert t.fused_probability == pytest.approx(expected, rel=1e-6)


class TestLazyImport:
    def test_fusion_debugger_importable(self):
        assert bb.utils.debug.FusionDebugger is FusionDebugger

    def test_nonexistent_attribute_raises(self):
        with pytest.raises(AttributeError):
            bb.does_not_exist_attr

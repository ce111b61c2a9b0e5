"""FusionDebugger tests: trace correctness (trace == pipeline output),
comparison semantics, formatted output."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    BayesianProbabilityTransform,
    FusionDebugger,
    log_odds_conjunction,
    prob_and,
    prob_or,
)


@pytest.fixture
def debugger():
    return FusionDebugger(
        BayesianProbabilityTransform(alpha=0.8, beta=2.0, base_rate=0.05)
    )


class TestBM25Trace:
    def test_trace_matches_pipeline(self, debugger):
        t = debugger._transform
        trace = debugger.trace_bm25(5.0, 3.0, 0.8)
        expected = t.score_to_probability(5.0, 3.0, 0.8)
        assert trace.posterior == pytest.approx(expected, rel=1e-12)

    def test_intermediates_consistent(self, debugger):
        t = debugger._transform
        tr = debugger.trace_bm25(4.0, 7.0, 0.5)
        assert tr.likelihood == pytest.approx(t.likelihood(4.0))
        assert tr.tf_prior == pytest.approx(t.tf_prior(7.0))
        assert tr.norm_prior == pytest.approx(t.norm_prior(0.5))
        assert tr.composite_prior == pytest.approx(t.composite_prior(7.0, 0.5))
        assert tr.alpha == t.alpha and tr.beta == t.beta
        assert tr.logit_base_rate is not None

    def test_no_base_rate(self):
        d = FusionDebugger(BayesianProbabilityTransform(alpha=1.0, beta=0.0))
        tr = d.trace_bm25(1.0, 1.0, 1.0)
        assert tr.logit_base_rate is None
        assert tr.base_rate is None


class TestVectorTrace:
    def test_cosine_conversion(self, debugger):
        tr = debugger.trace_vector(0.5)
        assert tr.probability == pytest.approx(0.75)
        assert tr.logit_probability == pytest.approx(np.log(3), rel=1e-9)

    def test_calibrated_with_calibrator(self, debugger):
        from bayesian_bm25_tpu import VectorProbabilityTransform

        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1)
        tr = debugger.trace_calibrated_vector(
            0.4, 0.8, f_R=2.5, calibration_method="kde", calibrator=vpt
        )
        assert tr.f_G is not None
        expected_f_G = np.exp(-0.5) / (0.1 * np.sqrt(2 * np.pi))
        assert tr.f_G == pytest.approx(expected_f_G, rel=1e-9)
        assert tr.log_density_ratio == pytest.approx(
            np.log(2.5 / expected_f_G), rel=1e-9
        )
        assert tr.calibration_method == "kde"


class TestNotTrace:
    def test_sign_flip(self, debugger):
        tr = debugger.trace_not(0.8, name="bm25")
        assert tr.complement == pytest.approx(0.2)
        assert tr.logit_complement == pytest.approx(-tr.logit_input, rel=1e-9)
        text = debugger.format_not(tr)
        assert "NOT bm25" in text and "sign flipped" in text


class TestFusionTraces:
    def test_log_odds_matches_function(self, debugger):
        probs = [0.8, 0.6, 0.7]
        tr = debugger.trace_fusion(probs, method="log_odds", alpha=0.5)
        assert tr.fused_probability == pytest.approx(
            float(log_odds_conjunction(np.array(probs), alpha=0.5)), rel=1e-9
        )
        assert tr.n_alpha_scale == pytest.approx(np.sqrt(3))

    def test_weighted_log_odds(self, debugger):
        probs = [0.8, 0.6]
        w = [0.3, 0.7]
        tr = debugger.trace_fusion(probs, method="log_odds", weights=w)
        assert tr.fused_probability == pytest.approx(
            float(log_odds_conjunction(np.array(probs), weights=np.array(w))),
            rel=1e-9,
        )
        assert tr.weights == pytest.approx(w)

    def test_gated_log_odds(self, debugger):
        probs = [0.3, 0.9]
        tr = debugger.trace_fusion(probs, method="log_odds", gating="relu")
        assert tr.fused_probability == pytest.approx(
            float(log_odds_conjunction(np.array(probs), gating="relu")),
            rel=1e-9,
        )
        assert tr.gating == "relu"
        assert tr.logits[0] == 0.0  # negative evidence zeroed

    def test_prob_and_or(self, debugger):
        probs = [0.5, 0.4]
        tr_and = debugger.trace_fusion(probs, method="prob_and")
        assert tr_and.fused_probability == pytest.approx(
            float(prob_and(np.array(probs))), rel=1e-9
        )
        assert tr_and.log_prob_sum == pytest.approx(np.log(0.2), rel=1e-9)
        tr_or = debugger.trace_fusion(probs, method="prob_or")
        assert tr_or.fused_probability == pytest.approx(
            float(prob_or(np.array(probs))), rel=1e-9
        )

    def test_prob_not_is_none_relevant(self, debugger):
        tr = debugger.trace_fusion([0.5, 0.4], method="prob_not")
        assert tr.fused_probability == pytest.approx(0.5 * 0.6, rel=1e-9)

    def test_invalid_method(self, debugger):
        with pytest.raises(ValueError):
            debugger.trace_fusion([0.5], method="mean")


class TestDocumentTrace:
    def test_both_signals(self, debugger):
        tr = debugger.trace_document(
            bm25_score=5.0, tf=3.0, doc_len_ratio=0.8,
            cosine_score=0.4, doc_id="d1",
        )
        assert set(tr.signals) == {"BM25", "Vector"}
        expected = debugger.trace_fusion(
            [tr.signals["BM25"].posterior, tr.signals["Vector"].probability]
        ).fused_probability
        assert tr.final_probability == pytest.approx(expected, rel=1e-12)

    def test_requires_features_with_bm25(self, debugger):
        with pytest.raises(ValueError):
            debugger.trace_document(bm25_score=5.0)

    def test_requires_some_signal(self, debugger):
        with pytest.raises(ValueError):
            debugger.trace_document()

    def test_formatting(self, debugger):
        tr = debugger.trace_document(
            bm25_score=5.0, tf=3.0, doc_len_ratio=0.8, cosine_score=0.4,
            doc_id="docA",
        )
        text = debugger.format_trace(tr)
        assert "docA" in text and "BM25" in text and "Fusion" in text
        summary = debugger.format_summary(tr)
        assert "docA" in summary and "Fused=" in summary


class TestComparison:
    def test_dominant_and_crossover(self, debugger):
        a = debugger.trace_document(
            bm25_score=8.0, tf=5.0, doc_len_ratio=0.6, cosine_score=0.1,
            doc_id="A",
        )
        b = debugger.trace_document(
            bm25_score=2.0, tf=1.0, doc_len_ratio=0.6, cosine_score=0.5,
            doc_id="B",
        )
        cmp = debugger.compare(a, b)
        assert cmp.dominant_signal == "BM25"
        # Vector favors B while fused favors A -> crossover on Vector
        assert cmp.crossover_stage == "Vector"
        text = debugger.format_comparison(cmp)
        assert "Comparison: A vs B" in text
        assert "largest" in text

    def test_missing_signal_neutral(self, debugger):
        a = debugger.trace_document(bm25_score=5.0, tf=2.0, doc_len_ratio=0.8,
                                    doc_id="A")
        b = debugger.trace_document(cosine_score=0.3, doc_id="B")
        cmp = debugger.compare(a, b)
        assert set(cmp.signal_deltas) == {"BM25", "Vector"}

"""FusionDebugger formatter CONTENT tests (ref tests/test_debug.py has
1,135 LoC of these; round-1 coverage had only smoke asserts). Every
formatter's output is checked for the numeric values and structural
markers it promises, across trace types and fusion methods."""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianProbabilityTransform, FusionDebugger


@pytest.fixture
def debugger():
    return FusionDebugger(BayesianProbabilityTransform(alpha=1.2, beta=2.0))


@pytest.fixture
def debugger_br():
    return FusionDebugger(
        BayesianProbabilityTransform(alpha=1.2, beta=2.0, base_rate=0.05))


class TestFormatTrace:
    def test_bm25_values_appear(self, debugger):
        tr = debugger.trace_document(
            bm25_score=4.0, tf=3.0, doc_len_ratio=0.8, doc_id="d7")
        out = debugger.format_trace(tr)
        sig = tr.signals["BM25"]
        assert "Document: d7" in out
        assert "raw=4.00" in out
        assert f"likelihood={sig.likelihood:.3f}" in out
        assert "alpha=1.20, beta=2.00" in out
        assert "tf=3" in out and f"tf_prior={sig.tf_prior:.3f}" in out
        assert "dl_ratio=0.80" in out
        assert f"norm_prior={sig.norm_prior:.3f}" in out
        assert f"composite_prior={sig.composite_prior:.3f}" in out
        assert f"posterior={sig.posterior:.3f}" in out
        assert f"final={tr.fusion.fused_probability:.3f}" in out

    def test_base_rate_shows_both_posteriors(self, debugger_br):
        tr = debugger_br.trace_document(
            bm25_score=4.0, tf=3.0, doc_len_ratio=0.8)
        out = debugger_br.format_trace(tr)
        assert "with base_rate=0.050" in out
        sig = tr.signals["BM25"]
        no_br = float(debugger_br._transform.posterior(
            sig.likelihood, sig.composite_prior, base_rate=None))
        assert f"posterior={no_br:.3f}" in out
        assert f"posterior={sig.posterior:.3f}" in out

    def test_vector_signal_block(self, debugger):
        tr = debugger.trace_document(cosine_score=0.62, doc_id=3)
        out = debugger.format_trace(tr)
        sig = tr.signals["Vector"]
        assert "cosine=0.620" in out
        assert f"prob={sig.probability:.3f}" in out
        assert f"logit(prob)={sig.logit_probability:.3f}" in out

    def test_fusion_block_log_odds(self, debugger):
        tr = debugger.trace_document(
            bm25_score=4.0, tf=3.0, doc_len_ratio=0.8, cosine_score=0.7,
            method="log_odds", alpha=0.5)
        out = debugger.format_trace(tr)
        f = tr.fusion
        assert "method=log_odds" in out and "alpha=0.5" in out
        assert "n=2" in out
        assert f"mean_logit={f.mean_logit:.3f}" in out
        assert f"n^alpha={f.n_alpha_scale:.3f}" in out
        assert f"scaled={f.scaled_logit:.3f}" in out
        # logits list rendered with each entry
        for v in f.logits:
            assert f"{v:.3f}" in out

    def test_fusion_block_prob_and_shows_log_sums(self, debugger):
        tr = debugger.trace_fusion([0.6, 0.7], method="prob_and")
        doc = debugger.trace_document(
            bm25_score=4.0, tf=1.0, doc_len_ratio=1.0, cosine_score=0.4,
            method="prob_and")
        out = debugger.format_trace(doc)
        assert "method=prob_and" in out
        assert "ln(P)=[" in out
        assert f"sum(ln(P))={doc.fusion.log_prob_sum:.3f}" in out
        del tr

    def test_fusion_block_prob_or_shows_complements(self, debugger):
        doc = debugger.trace_document(
            bm25_score=4.0, tf=1.0, doc_len_ratio=1.0, cosine_score=0.4,
            method="prob_or")
        out = debugger.format_trace(doc)
        assert "1-P=[" in out and "ln(1-P)=[" in out
        assert f"sum(ln(1-P))={doc.fusion.log_complement_sum:.3f}" in out

    def test_gating_annotation(self, debugger):
        from bayesian_bm25_tpu.utils.debug import DocumentTrace

        ft = debugger.trace_fusion([0.7, 0.6], method="log_odds",
                                   gating="swish", gating_beta=2.0)
        doc = DocumentTrace(doc_id="g", signals={}, fusion=ft,
                            final_probability=ft.fused_probability)
        out = debugger.format_trace(doc)
        assert "gating=swish(beta=2.0)" in out
        # gelu hides its fixed beta
        ft2 = debugger.trace_fusion([0.7, 0.6], method="log_odds",
                                    gating="gelu")
        doc2 = DocumentTrace(doc_id="g2", signals={}, fusion=ft2,
                             final_probability=ft2.fused_probability)
        out2 = debugger.format_trace(doc2)
        assert "gating=gelu" in out2 and "beta=" not in out2.split(
            "gating=gelu")[1].split("\n")[0]

    def test_weighted_fusion_shows_weights(self, debugger):
        doc = debugger.trace_document(
            bm25_score=4.0, tf=1.0, doc_len_ratio=1.0, cosine_score=0.7,
            method="log_odds", weights=[0.7, 0.3])
        out = debugger.format_trace(doc)
        assert "weights=[0.700, 0.300]" in out

    def test_non_verbose_hides_logits(self, debugger):
        doc = debugger.trace_document(
            bm25_score=4.0, tf=3.0, doc_len_ratio=0.8, cosine_score=0.7)
        out = debugger.format_trace(doc, verbose=False)
        assert "logits=[" not in out
        assert "mean_logit" not in out
        assert "logit(posterior)" not in out
        assert f"final={doc.fusion.fused_probability:.3f}" in out


class TestFormatNot:
    def test_content(self, debugger):
        tr = debugger.trace_not(0.8, name="spam")
        out = debugger.format_not(tr)
        assert "[NOT spam]" in out
        assert "P(spam) = 0.800" in out
        assert "P(NOT spam) = 1 - 0.800 = 0.200" in out
        assert "sign flipped" in out
        assert f"{tr.logit_input:+.3f}" in out
        assert f"{tr.logit_complement:+.3f}" in out


class TestFormatSummary:
    def test_one_line_with_both_signals(self, debugger):
        tr = debugger.trace_document(
            bm25_score=4.0, tf=3.0, doc_len_ratio=0.8, cosine_score=0.7,
            doc_id="docX")
        out = debugger.format_summary(tr)
        assert out.count("\n") == 0
        assert out.startswith("docX:")
        assert f"BM25={tr.signals['BM25'].posterior:.3f}" in out
        assert f"Vec={tr.signals['Vector'].probability:.3f}" in out
        assert f"Fused={tr.fusion.fused_probability:.3f}" in out
        assert "(log_odds" in out

    def test_unknown_doc_label(self, debugger):
        tr = debugger.trace_document(cosine_score=0.5)
        assert debugger.format_summary(tr).startswith("unknown:")


class TestFormatComparison:
    def _pair(self, debugger, s_a=6.0, s_b=1.0, c_a=0.4, c_b=0.8):
        a = debugger.trace_document(bm25_score=s_a, tf=4.0,
                                    doc_len_ratio=0.9, cosine_score=c_a,
                                    doc_id="A")
        b = debugger.trace_document(bm25_score=s_b, tf=1.0,
                                    doc_len_ratio=0.4, cosine_score=c_b,
                                    doc_id="B")
        return a, b

    def test_table_and_rank_order(self, debugger):
        a, b = self._pair(debugger)
        cmp_res = debugger.compare(a, b)
        out = debugger.format_comparison(cmp_res)
        assert "Comparison: A vs B" in out
        # per-signal rows with probabilities and deltas
        for name, delta in cmp_res.signal_deltas.items():
            assert name in out
            assert f"{delta:+.3f}" in out
        assert "<-- largest" in out
        fused_delta = a.final_probability - b.final_probability
        assert f"{fused_delta:+.3f}" in out
        winner = "A > B" if fused_delta > 0 else "B > A"
        assert f"Rank order: {winner}" in out
        assert f"Dominant signal: {cmp_res.dominant_signal}" in out

    def test_crossover_note(self, debugger):
        # BM25 strongly favors A, vector favors B -> crossover when the
        # dominant signal outweighs the other
        a, b = self._pair(debugger, s_a=8.0, s_b=0.5, c_a=0.3, c_b=0.9)
        cmp_res = debugger.compare(a, b)
        out = debugger.format_comparison(cmp_res)
        if cmp_res.crossover_stage is not None:
            assert "outweighed" in out
            assert cmp_res.crossover_stage in out

    def test_tie_renders(self, debugger):
        a = debugger.trace_document(bm25_score=4.0, tf=2.0,
                                    doc_len_ratio=0.8, doc_id="A")
        out = debugger.format_comparison(debugger.compare(a, a))
        assert "Rank order: tied" in out

"""Analytic-vs-numerical gradient checks for the attention learner and
coverage of the VPT forced-method weight fallback chains."""

import numpy as np
import pytest

from bayesian_bm25_tpu import VectorProbabilityTransform
from bayesian_bm25_tpu.ops import fusion_learn as FL


class TestAttentionGradientNumerical:
    def _bce(self, W, b, probs, labels, qf, scale):
        z = qf @ W.T + b
        z = z - z.max(axis=1, keepdims=True)
        w = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
        x = np.log(probs / (1 - probs))
        pred = 1 / (1 + np.exp(-scale * np.sum(w * x, axis=1)))
        pred = np.clip(pred, 1e-12, 1 - 1e-12)
        return -np.mean(labels * np.log(pred) +
                        (1 - labels) * np.log(1 - pred))

    def test_grad_W_and_b_match_finite_differences(self):
        rng = np.random.default_rng(0)
        m, n_sig, n_qf = 30, 3, 2
        probs = rng.uniform(0.1, 0.9, (m, n_sig))
        labels = rng.integers(0, 2, m).astype(float)
        qf = rng.normal(0, 1, (m, n_qf))
        W = rng.normal(0, 0.5, (n_sig, n_qf))
        b = rng.normal(0, 0.2, n_sig)
        scale = n_sig ** 0.5

        from bayesian_bm25_tpu.ops.mathx import logit

        x = np.asarray(logit(probs))
        params = FL.AttentionParams(W, b)
        g = FL._attention_grads(params, x, labels, qf, scale, None)
        gW = np.asarray(g.W)
        gb = np.asarray(g.b)

        eps = 1e-6
        for i in range(n_sig):
            for j in range(n_qf):
                Wp = W.copy(); Wp[i, j] += eps
                Wm = W.copy(); Wm[i, j] -= eps
                num = (self._bce(Wp, b, probs, labels, qf, scale)
                       - self._bce(Wm, b, probs, labels, qf, scale)) / (2 * eps)
                assert gW[i, j] == pytest.approx(num, abs=1e-6)
            bp = b.copy(); bp[i] += eps
            bm = b.copy(); bm[i] -= eps
            num = (self._bce(W, bp, probs, labels, qf, scale)
                   - self._bce(W, bm, probs, labels, qf, scale)) / (2 * eps)
            assert gb[i] == pytest.approx(num, abs=1e-6)


class TestVPTForcedMethodFallbacks:
    """method='kde' / 'gmm' weight-resolution chains
    (vector_probability.py:502-531)."""

    def _vpt(self):
        return VectorProbabilityTransform(mu_G=0.6, sigma_G=0.1)

    def test_kde_uses_explicit_weights_first(self):
        rng = np.random.default_rng(1)
        d = rng.normal(0.5, 0.1, 80)
        w = np.exp(-5 * d)
        vpt = self._vpt()
        out_w = vpt.calibrate(d, method="kde", weights=w)
        out_none = vpt.calibrate(d, method="kde")
        assert not np.allclose(out_w, out_none)

    def test_kde_uses_density_prior_second(self):
        rng = np.random.default_rng(2)
        d = rng.normal(0.5, 0.1, 80)
        prior = np.linspace(0.1, 0.9, 80)
        vpt = self._vpt()
        out_p = vpt.calibrate(d, method="kde", density_prior=prior)
        out_none = vpt.calibrate(d, method="kde")
        assert not np.allclose(out_p, out_none)

    def test_kde_gap_weights_third(self):
        # clear gap: forced kde without weights must find gap weights
        d = np.concatenate([np.full(10, 0.15), np.full(60, 0.7)])
        vpt = self._vpt()
        out = vpt.calibrate(d, method="kde")
        assert out[:10].mean() > out[10:].mean()

    def test_kde_distance_fallback_last(self):
        # no gap, no weights: sigmoid(median/d - 1) fallback drives KDE
        d = np.linspace(0.3, 0.9, 60)
        vpt = self._vpt()
        out = vpt.calibrate(d, method="kde")
        assert np.all(np.isfinite(out))
        assert out[0] > out[-1]  # closer distances score higher

    def test_gmm_weight_chain(self):
        rng = np.random.default_rng(3)
        d = np.concatenate([rng.normal(0.45, 0.04, 40),
                            rng.normal(0.65, 0.08, 60)])
        vpt = VectorProbabilityTransform(mu_G=0.65, sigma_G=0.08)
        w = (d < 0.55).astype(float)
        out_w = vpt.calibrate(d, method="gmm", weights=w)
        out_none = vpt.calibrate(d, method="gmm")
        # informed init localizes the relevant component near 0.45
        assert out_w[:40].mean() > out_w[40:].mean()
        assert np.all(np.isfinite(out_none))

    def test_zero_mass_weights_ignored(self):
        rng = np.random.default_rng(4)
        d = rng.normal(0.5, 0.1, 60)
        vpt = self._vpt()
        out_zero = vpt.calibrate(d, weights=np.zeros(60))
        out_none = vpt.calibrate(d)
        np.testing.assert_allclose(out_zero, out_none, rtol=1e-9)


class TestDebugFormattingExtra:
    def test_gated_fusion_format_mentions_gate(self):
        from bayesian_bm25_tpu import (
            BayesianProbabilityTransform,
            FusionDebugger,
        )

        d = FusionDebugger(BayesianProbabilityTransform(alpha=1.0, beta=2.0))
        tr = d.trace_document(bm25_score=5.0, tf=2.0, doc_len_ratio=0.7,
                              cosine_score=0.4, doc_id="g")
        ft = d.trace_fusion([0.7, 0.4], method="log_odds", gating="swish",
                            gating_beta=2.0)
        tr.fusion = ft
        text = d.format_trace(tr)
        assert "gating=swish(beta=2.0)" in text

    def test_weighted_fusion_format_lists_weights(self):
        from bayesian_bm25_tpu import (
            BayesianProbabilityTransform,
            FusionDebugger,
        )

        d = FusionDebugger(BayesianProbabilityTransform())
        tr = d.trace_document(bm25_score=3.0, tf=1.0, doc_len_ratio=1.0,
                              cosine_score=0.2, method="log_odds",
                              weights=[0.8, 0.2])
        text = d.format_trace(tr)
        assert "weights=[0.800, 0.200]" in text

    def test_prob_and_format(self):
        from bayesian_bm25_tpu import (
            BayesianProbabilityTransform,
            FusionDebugger,
        )

        d = FusionDebugger(BayesianProbabilityTransform())
        tr = d.trace_document(bm25_score=3.0, tf=1.0, doc_len_ratio=1.0,
                              cosine_score=0.2, method="prob_and")
        text = d.format_trace(tr)
        assert "sum(ln(P))" in text

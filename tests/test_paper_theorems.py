"""Numerical verification of the paper theorems the reference treats as its
spec (mirrors tests/test_paper_theorems.py invariants, SURVEY §4.2).

Each class validates one theorem/remark: posterior log-odds equivalence,
sqrt(n) confidence scaling, Log-OP weight/scaling orthogonality, gating
identities (ReLU-as-MAP, GELU~Swish_1.702, softplus->ReLU), WAND/BMW/
attention pruning exactness (pruned top-k == brute-force top-k), Hebbian
gradient structure, Naive-Bayes correspondence, and the vector
likelihood-ratio calibration identity.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    BayesianProbabilityTransform,
    LearnableLogOddsWeights,
    VectorProbabilityTransform,
    log_odds_conjunction,
)
from bayesian_bm25_tpu.models.probability import logit, sigmoid


class TestPosteriorLogOddsEquivalence:
    """Eq. 22 / Remark 4.4.5: two-step odds update == additive logits."""

    def test_equivalence_with_and_without_base_rate(self):
        rng = np.random.default_rng(0)
        L = rng.uniform(0.01, 0.99, 200)
        p = rng.uniform(0.1, 0.9, 200)
        t = BayesianProbabilityTransform
        np.testing.assert_allclose(
            t.posterior(L, p),
            sigmoid(logit(L) + logit(p)), rtol=1e-9,
        )
        for br in (0.001, 0.3, 0.5):
            np.testing.assert_allclose(
                t.posterior(L, p, base_rate=br),
                sigmoid(logit(L) + logit(p) + logit(br)), rtol=1e-8,
            )

    def test_neutral_elements(self):
        t = BayesianProbabilityTransform
        rng = np.random.default_rng(1)
        L = rng.uniform(0.01, 0.99, 50)
        np.testing.assert_allclose(t.posterior(L, 0.5), L, rtol=1e-9)
        np.testing.assert_allclose(
            t.posterior(L, 0.5, base_rate=0.5), L, rtol=1e-9
        )


class TestSqrtNScalingLaw:
    """Theorem 4.2.1: n agreeing signals scale the fused logit by n^0.5."""

    def test_fused_logit_scales_as_sqrt_n(self):
        p = 0.75
        base_logit = float(np.asarray(logit(p)))
        for n in (1, 2, 4, 9, 16):
            fused = log_odds_conjunction(np.full(n, p), alpha=0.5)
            assert float(np.asarray(logit(fused))) == pytest.approx(
                base_logit * np.sqrt(n), rel=1e-6
            )

    def test_alpha_zero_is_scale_free(self):
        p = 0.75
        for n in (1, 3, 10):
            fused = log_odds_conjunction(np.full(n, p), alpha=0.0)
            assert fused == pytest.approx(p, rel=1e-9)

    def test_disagreement_cancels(self):
        # logit(p) + logit(1-p) = 0 -> fused = 0.5 regardless of alpha
        for alpha in (0.0, 0.5, 1.0):
            fused = log_odds_conjunction(np.array([0.9, 0.1]), alpha=alpha)
            assert fused == pytest.approx(0.5, abs=1e-9)


class TestLogOPOrthogonality:
    """Theorem 8.3 / Section 4.2: reliability weights and confidence
    scaling compose multiplicatively and independently."""

    def test_weights_and_alpha_compose(self):
        rng = np.random.default_rng(2)
        p = rng.uniform(0.1, 0.9, 3)
        w = np.array([0.5, 0.3, 0.2])
        for alpha in (0.0, 0.5, 1.0):
            fused = log_odds_conjunction(p, alpha=alpha, weights=w)
            expected = sigmoid(
                (3 ** alpha) * float(np.sum(w * np.asarray(logit(p))))
            )
            assert fused == pytest.approx(float(np.asarray(expected)), rel=1e-9)

    def test_degenerate_weight_selects_signal(self):
        p = np.array([0.9, 0.2, 0.4])
        fused = log_odds_conjunction(p, weights=np.array([1.0, 0.0, 0.0]))
        assert fused == pytest.approx(0.9, rel=1e-6)


class TestNaiveBayesCorrespondence:
    """Remark 5.3.2: uniform weights recover Naive Bayes; alpha=1 with
    uniform weights equals the sum of logits (NB with neutral prior)."""

    def test_uniform_weights_alpha_one_is_logit_sum(self):
        rng = np.random.default_rng(3)
        p = rng.uniform(0.2, 0.8, 4)
        fused = log_odds_conjunction(p, alpha=1.0, weights=np.full(4, 0.25))
        expected = sigmoid(np.sum(np.asarray(logit(p))))
        assert fused == pytest.approx(float(np.asarray(expected)), rel=1e-9)

    def test_learnable_init_is_naive_bayes(self):
        lw = LearnableLogOddsWeights(n_signals=4, alpha=1.0)
        rng = np.random.default_rng(4)
        p = rng.uniform(0.2, 0.8, 4)
        expected = sigmoid(np.sum(np.asarray(logit(p))))
        assert lw(p) == pytest.approx(float(np.asarray(expected)), rel=1e-9)


class TestGatingTheorems:
    def test_relu_is_map_closed_form(self):
        """Theorem 6.5.3: gated logit argmax of (xz - z^2/2) over z>=0 is
        max(0, x) — verify the closed form against a grid search."""
        grid = np.linspace(0.0, 30.0, 30001)
        for x in (-5.0, -0.3, 0.0, 0.4, 3.0, 12.0):
            objective = x * grid - grid ** 2 / 2.0
            z_star = grid[np.argmax(objective)]
            assert z_star == pytest.approx(max(0.0, x), abs=2e-3)

    def test_gelu_equals_swish_1702(self):
        xs = np.linspace(-8, 8, 100)
        from bayesian_bm25_tpu.ops.fusion import apply_gating

        g = np.asarray(apply_gating(xs, "gelu"))
        s = np.asarray(apply_gating(xs, "swish", beta=1.702))
        np.testing.assert_allclose(g, s, atol=1e-9)

    def test_gelu_approximates_true_gelu(self):
        from math import erf

        from bayesian_bm25_tpu.ops.fusion import apply_gating

        xs = np.linspace(-4, 4, 81)
        true_gelu = xs * 0.5 * (1 + np.array([erf(x / np.sqrt(2)) for x in xs]))
        approx = np.asarray(apply_gating(xs, "gelu"))
        # sigmoid(1.702x) approximation: max error ~0.0203 (Prop. 6.8.2)
        np.testing.assert_allclose(approx, true_gelu, atol=0.021)

    def test_softplus_beta_limit_is_relu(self):
        from bayesian_bm25_tpu.ops.fusion import apply_gating

        xs = np.linspace(-5, 5, 51)
        # softplus(0) = ln(2)/beta, the max deviation from ReLU
        sp = np.asarray(apply_gating(xs, "softplus", beta=1000.0))
        np.testing.assert_allclose(sp, np.maximum(0, xs), atol=1e-3)

    def test_swish_beta_zero_limit_is_half_x(self):
        from bayesian_bm25_tpu.ops.fusion import apply_gating

        xs = np.linspace(-5, 5, 51)
        sw = np.asarray(apply_gating(xs, "swish", beta=1e-6))
        np.testing.assert_allclose(sw, xs / 2.0, atol=1e-5)

    def test_softplus_dominates_identity(self):
        from bayesian_bm25_tpu.ops.fusion import apply_gating

        xs = np.linspace(-10, 10, 101)
        sp = np.asarray(apply_gating(xs, "softplus", beta=1.0))
        assert np.all(sp > xs)
        assert np.all(sp > 0)


class TestWandPruningExactness:
    """Theorem 6.1.2: pruning at the WAND bound never changes the top-k."""

    def test_pruned_topk_equals_brute_force(self):
        rng = np.random.default_rng(5)
        t = BayesianProbabilityTransform(alpha=0.9, beta=3.0, base_rate=0.05)
        n = 400
        max_score = 10.0
        scores = rng.uniform(0, max_score, n)
        tfs = rng.integers(0, 20, n).astype(float)
        ratios = rng.uniform(0.1, 2.0, n)
        probs = np.asarray(t.score_to_probability(scores, tfs, ratios))

        k = 10
        brute_topk = set(np.argsort(-probs)[:k])
        threshold = np.sort(probs)[-k]  # k-th largest

        # Per-doc upper bound from each doc's own score
        doc_bounds = np.asarray(t.wand_upper_bound(scores))
        surviving = np.where(doc_bounds >= threshold)[0]
        assert brute_topk.issubset(set(surviving))
        # pruning actually removes something
        assert len(surviving) < n


class TestAttentionPruningExactness:
    """Theorem 8.7.1 / Corollary 8.7.2: attention pruning is exact."""

    def test_topk_preserved_under_pruning(self):
        rng = np.random.default_rng(6)
        m = 300
        probs = rng.uniform(0.05, 0.95, (m, 3))
        qf = rng.normal(0, 1, (m, 4))
        a = AttentionLogOddsWeights(3, 4, seed=3)
        fused = a(probs, qf)
        k = 15
        topk = set(np.argsort(-fused)[:k])
        threshold = np.sort(fused)[-k]
        surviving, pruned_fused = a.prune(probs, qf, threshold)
        assert topk.issubset(set(surviving.tolist()))
        np.testing.assert_allclose(pruned_fused, fused[surviving], rtol=1e-9)


class TestHebbianGradientStructure:
    """Remark 5.3.2: dL/dz_j = scale * (p - y) * w_j * (x_j - x_bar_w).

    Verifies the three structural properties: zero error -> zero gradient,
    gradient orthogonal to the all-ones direction through w (softmax
    invariance), and sign driven by (x_j - x_bar)."""

    def test_zero_error_zero_gradient(self):
        from bayesian_bm25_tpu.ops.fusion_learn import _learnable_grads

        x = np.array([[1.0, -1.0]])
        z = np.zeros(2)
        # label equals prediction exactly
        p = float(np.asarray(sigmoid(0.0)))
        g = np.asarray(_learnable_grads(z, x, np.array([p]), 1.0, None))
        np.testing.assert_allclose(g, 0.0, atol=1e-12)

    def test_gradient_sums_to_zero(self):
        """Softmax reparameterization: sum_j w_j (x_j - x_bar_w) = 0 implies
        the weighted gradient components sum to zero."""
        from bayesian_bm25_tpu.ops.fusion_learn import _learnable_grads

        rng = np.random.default_rng(7)
        x = rng.normal(0, 2, (20, 3))
        z = rng.normal(0, 1, 3)
        y = rng.integers(0, 2, 20).astype(float)
        g = np.asarray(_learnable_grads(z, x, y, 1.0, None))
        assert float(np.sum(g)) == pytest.approx(0.0, abs=1e-10)

    def test_positive_error_pushes_weight_off_high_signal(self):
        from bayesian_bm25_tpu.ops.fusion_learn import _learnable_grads

        # One sample, prediction too high (y=0), signal 0 above the mean:
        # gradient for signal 0 must be positive (weight decreases).
        x = np.array([[2.0, -2.0]])
        g = np.asarray(_learnable_grads(np.zeros(2), x, np.array([0.0]),
                                        1.0, None))
        assert g[0] > 0 and g[1] < 0


class TestVectorCalibrationIdentity:
    """Theorem 3.1.1: P(R|d) = sigmoid(log(f_R/f_G) + logit P_base)."""

    def test_identity_holds(self):
        rng = np.random.default_rng(8)
        d = rng.normal(0.5, 0.1, 100)
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1, base_rate=0.2)
        w = np.ones(100)
        f_R = vpt.estimate_kde(d, w)
        expected = np.asarray(sigmoid(
            vpt.log_density_ratio(d, f_R)
            + float(np.asarray(logit(0.2)))
        ))
        got = vpt.calibrate(d, weights=w, method="kde")
        np.testing.assert_allclose(got, np.clip(expected, 1e-10, 1 - 1e-10),
                                   rtol=1e-8)

    def test_equal_densities_give_base_rate(self):
        """f_R == f_G everywhere -> P(R|d) == P_base."""
        vpt = VectorProbabilityTransform(mu_G=0.5, sigma_G=0.1, base_rate=0.3)
        d = np.array([0.4, 0.5, 0.6])
        f_G = np.exp(-0.5 * ((d - 0.5) / 0.1) ** 2) / (0.1 * np.sqrt(2 * np.pi))
        ratio = vpt.log_density_ratio(d, f_G)
        np.testing.assert_allclose(ratio, 0.0, atol=1e-9)
        p = np.asarray(sigmoid(ratio + float(np.asarray(logit(0.3)))))
        np.testing.assert_allclose(p, 0.3, rtol=1e-9)


class TestBalancedFusionInvariants:
    def test_rank_preservation_within_signal(self):
        """Min-max normalization is monotone: with the other signal held
        constant, balanced fusion preserves each signal's ranking."""
        from bayesian_bm25_tpu import balanced_log_odds_fusion

        rng = np.random.default_rng(9)
        sparse = np.sort(rng.uniform(0.01, 0.99, 50))
        dense = np.full(50, 0.3)
        fused = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        assert np.all(np.diff(fused) >= -1e-12)

"""Fusion API breadth: reference test classes not covered elsewhere.

Mirrors the behavior inventory of the reference's tests/test_fusion.py
(boundary cases, algebraic identities, validation, base-rate semantics,
normalization edges) against this package's API. Deeper invariants live
in tests/test_paper_theorems.py + test_theorems_*; this file is the
per-function surface coverage."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
    balanced_log_odds_fusion,
    cosine_to_probability,
    log_odds_conjunction,
    prob_and,
    prob_not,
    prob_or,
)
from bayesian_bm25_tpu.ops.mathx import logit, sigmoid


class TestCosineToProbability:
    def test_boundaries(self):
        assert cosine_to_probability(1.0) == pytest.approx(1.0)
        assert cosine_to_probability(-1.0) == pytest.approx(0.0, abs=1e-9)
        assert cosine_to_probability(0.0) == pytest.approx(0.5)

    def test_bounds_random(self):
        s = np.random.default_rng(0).uniform(-1, 1, 100)
        p = cosine_to_probability(s)
        assert np.all(p >= 0) and np.all(p <= 1)

    def test_strict_monotonicity(self):
        s = np.linspace(-0.99, 0.99, 50)
        p = cosine_to_probability(s)
        assert np.all(np.diff(p) > 0)

    def test_out_of_range_clamped(self):
        assert 0.0 <= float(cosine_to_probability(1.5)) <= 1.0
        assert 0.0 <= float(cosine_to_probability(-1.5)) <= 1.0


class TestProbNot:
    def test_involution(self):
        p = np.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(prob_not(prob_not(p)), p, rtol=1e-6)

    def test_half_fixed_point(self):
        assert prob_not(0.5) == pytest.approx(0.5)

    def test_near_bounds(self):
        assert prob_not(1e-9) == pytest.approx(1.0, abs=1e-8)
        assert prob_not(1.0 - 1e-9) == pytest.approx(0.0, abs=1e-8)

    def test_log_odds_negation(self):
        """logit(NOT p) == -logit(p)."""
        p = np.array([0.2, 0.7, 0.95])
        np.testing.assert_allclose(
            np.asarray(logit(prob_not(p))), -np.asarray(logit(p)), rtol=1e-5)


class TestProbAnd:
    def test_all_ones(self):
        assert prob_and(np.ones(4)) == pytest.approx(1.0)

    def test_contains_zero(self):
        assert prob_and(np.array([0.9, 0.0, 0.8])) == pytest.approx(
            0.0, abs=1e-9)

    def test_single_value_identity(self):
        assert prob_and(np.array([0.37])) == pytest.approx(0.37, rel=1e-6)

    def test_shrinkage(self):
        """AND of independent events is <= the smallest probability."""
        p = np.array([0.9, 0.8, 0.6])
        assert float(prob_and(p)) <= 0.6 + 1e-9

    def test_batched(self):
        p = np.array([[0.5, 0.5], [0.9, 0.1]])
        np.testing.assert_allclose(prob_and(p), [0.25, 0.09], rtol=1e-6)


class TestProbOr:
    def test_all_zeros(self):
        assert prob_or(np.zeros(4)) == pytest.approx(0.0, abs=1e-9)

    def test_contains_one(self):
        assert prob_or(np.array([0.1, 1.0, 0.2])) == pytest.approx(1.0)

    def test_single_value_identity(self):
        assert prob_or(np.array([0.42])) == pytest.approx(0.42, rel=1e-6)

    def test_at_least_max(self):
        p = np.array([0.3, 0.5, 0.2])
        assert float(prob_or(p)) >= 0.5 - 1e-9

    def test_complement_of_and(self):
        """OR(p) == 1 - AND(1-p)."""
        p = np.array([0.3, 0.6, 0.8])
        assert float(prob_or(p)) == pytest.approx(
            1.0 - float(prob_and(1.0 - p)), rel=1e-6)

    def test_batched(self):
        p = np.array([[0.5, 0.5], [0.9, 0.1]])
        np.testing.assert_allclose(prob_or(p), [0.75, 0.91], rtol=1e-6)


class TestLogOddsConjunctionSurface:
    def test_irrelevance_preservation(self):
        """All-0.5 inputs stay exactly at 0.5 for any alpha."""
        p = np.full(3, 0.5)
        for alpha in (0.0, 0.5, 1.0):
            assert log_odds_conjunction(p, alpha=alpha) == pytest.approx(0.5)

    def test_single_signal_identity(self):
        """One signal, alpha=0: the fused probability is the signal."""
        assert log_odds_conjunction(
            np.array([0.73]), alpha=0.0) == pytest.approx(0.73, rel=1e-5)

    def test_bounds(self):
        rng = np.random.default_rng(1)
        p = rng.uniform(0.01, 0.99, (20, 4))
        out = log_odds_conjunction(p)
        assert np.all(out > 0) and np.all(out < 1)

    def test_more_signals_amplify(self):
        """With alpha=0.5, more agreeing signals push further from 0.5."""
        two = log_odds_conjunction(np.full(2, 0.7), alpha=0.5)
        four = log_odds_conjunction(np.full(4, 0.7), alpha=0.5)
        assert four > two > 0.5

    def test_weighted_higher_weight_follows_signal(self):
        p = np.array([0.9, 0.2])
        up = log_odds_conjunction(p, weights=np.array([0.8, 0.2]))
        down = log_odds_conjunction(p, weights=np.array([0.2, 0.8]))
        assert up > down

    def test_weighted_single_signal_full_weight(self):
        assert log_odds_conjunction(
            np.array([0.61]), weights=np.array([1.0])
        ) == pytest.approx(0.61, rel=1e-5)

    def test_weighted_three_signals(self):
        p = np.array([0.8, 0.6, 0.4])
        w = np.array([0.5, 0.3, 0.2])
        expected = sigmoid(np.sum(w * np.asarray(logit(p))))
        assert log_odds_conjunction(p, weights=w) == pytest.approx(
            float(expected), rel=1e-5)

    def test_weighted_explicit_alpha(self):
        p = np.array([0.8, 0.6])
        w = np.array([0.5, 0.5])
        expected = sigmoid(2 ** 0.7 * np.sum(w * np.asarray(logit(p))))
        assert log_odds_conjunction(p, weights=w, alpha=0.7) == pytest.approx(
            float(expected), rel=1e-5)

    def test_uniform_weights_match_unweighted_alpha_zero(self):
        p = np.array([0.8, 0.55, 0.3])
        weighted = log_odds_conjunction(p, weights=np.full(3, 1 / 3))
        unweighted = log_odds_conjunction(p, alpha=0.0)
        assert weighted == pytest.approx(unweighted, rel=1e-6)

    def test_auto_alpha_weighted_and_unweighted(self):
        p = np.array([0.7, 0.65])
        assert log_odds_conjunction(p, alpha="auto") == pytest.approx(
            log_odds_conjunction(p, alpha=0.5), rel=1e-9)
        w = np.array([0.6, 0.4])
        assert log_odds_conjunction(
            p, weights=w, alpha="auto") == pytest.approx(
            log_odds_conjunction(p, weights=w, alpha=0.5), rel=1e-9)

    def test_batched(self):
        p = np.array([[0.7, 0.8], [0.4, 0.3]])
        out = log_odds_conjunction(p)
        assert out.shape == (2,)
        assert out[0] > 0.5 > out[1]


class TestGatingSurface:
    def test_none_gating_identity(self):
        p = np.array([0.7, 0.3])
        assert log_odds_conjunction(p, gating="none") == pytest.approx(
            log_odds_conjunction(p), rel=1e-9)

    def test_relu_zeros_weak_evidence(self):
        """All-below-0.5 signals gate to zero logits -> fused 0.5."""
        p = np.array([0.4, 0.3, 0.2])
        assert log_odds_conjunction(p, gating="relu") == pytest.approx(0.5)

    def test_relu_all_above_half_unchanged(self):
        p = np.array([0.7, 0.8])
        assert log_odds_conjunction(p, gating="relu") == pytest.approx(
            log_odds_conjunction(p), rel=1e-6)

    def test_swish_soft_gate_keeps_some_negative(self):
        """Swish passes attenuated negative evidence: below relu's 0.5."""
        p = np.array([0.3, 0.3])
        out = log_odds_conjunction(p, gating="swish")
        assert out < 0.5
        assert out > float(log_odds_conjunction(p))  # attenuated, not full

    def test_softplus_preserves_all_evidence(self):
        """Softplus output is strictly positive -> fused > 0.5 always."""
        p = np.array([0.2, 0.3])
        assert log_odds_conjunction(p, gating="softplus") > 0.5

    def test_gating_with_weights(self):
        p = np.array([0.8, 0.3])
        w = np.array([0.7, 0.3])
        out = log_odds_conjunction(p, weights=w, gating="relu")
        expected = sigmoid(0.7 * np.maximum(np.asarray(logit(0.8)), 0.0))
        assert out == pytest.approx(float(expected), rel=1e-5)

    def test_gating_with_alpha_auto(self):
        p = np.array([0.8, 0.7])
        assert log_odds_conjunction(
            p, gating="gelu", alpha="auto") == pytest.approx(
            log_odds_conjunction(p, gating="gelu", alpha=0.5), rel=1e-9)

    @pytest.mark.parametrize("gate", ["relu", "swish", "gelu", "softplus"])
    def test_each_gate_batched(self, gate):
        p = np.random.default_rng(2).uniform(0.05, 0.95, (8, 3))
        out = log_odds_conjunction(p, gating=gate)
        assert out.shape == (8,)
        assert np.all((out > 0) & (out < 1))


class TestGatingBeta:
    def test_beta_zero_approaches_half_strength(self):
        """Swish with beta->0 halves every logit: sigma(x*sigma(0))."""
        p = np.array([0.8, 0.7])
        out = log_odds_conjunction(p, gating="swish", gating_beta=1e-8,
                                   alpha=0.0)
        expected = sigmoid(np.mean(np.asarray(logit(p))) * 0.5)
        assert out == pytest.approx(float(expected), rel=1e-4)

    def test_beta_large_approaches_relu(self):
        p = np.array([0.8, 0.3])
        big = log_odds_conjunction(p, gating="swish", gating_beta=1e4)
        relu = log_odds_conjunction(p, gating="relu")
        assert big == pytest.approx(relu, rel=1e-3)

    def test_swish_beta_1702_matches_gelu(self):
        p = np.random.default_rng(3).uniform(0.1, 0.9, 6)
        np.testing.assert_allclose(
            log_odds_conjunction(p, gating="swish", gating_beta=1.702),
            log_odds_conjunction(p, gating="gelu"), rtol=1e-6)

    def test_gelu_ignores_gating_beta(self):
        p = np.array([0.8, 0.35])
        np.testing.assert_allclose(
            log_odds_conjunction(p, gating="gelu", gating_beta=7.0),
            log_odds_conjunction(p, gating="gelu"), rtol=1e-9)

    def test_softplus_beta_large_approaches_relu(self):
        p = np.array([0.75, 0.4])
        big = log_odds_conjunction(p, gating="softplus", gating_beta=1e3)
        relu = log_odds_conjunction(p, gating="relu")
        assert big == pytest.approx(relu, rel=1e-3)

    def test_gelu_between_swish1_and_relu_for_positive(self):
        """For moderate positive logits: swish_1 <= gelu <= relu."""
        p = np.array([0.75, 0.8])
        s = log_odds_conjunction(p, gating="swish", gating_beta=1.0)
        g = log_odds_conjunction(p, gating="gelu")
        r = log_odds_conjunction(p, gating="relu")
        assert s <= g <= r + 1e-12


class TestBalancedFusionSurface:
    def test_monotone_in_sparse(self):
        sparse = np.array([0.2, 0.5, 0.8])
        dense = np.array([0.1, 0.1, 0.1])
        out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        assert out[2] > out[1] > out[0]

    def test_monotone_in_dense(self):
        sparse = np.array([0.4, 0.4, 0.4])
        dense = np.array([-0.5, 0.0, 0.5])
        out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        assert out[2] > out[1] > out[0]

    def test_scalar_input_returns_float(self):
        out = balanced_log_odds_fusion(np.float64(0.7), np.float64(0.5))
        assert isinstance(out, float) and np.isfinite(out)

    def test_extreme_inputs_finite(self):
        sparse = np.array([0.01, 0.5, 0.99])
        dense = np.array([-0.99, 0.0, 0.99])
        assert np.all(np.isfinite(balanced_log_odds_fusion(sparse, dense)))


class TestLearnableSurface:
    def test_weights_stay_simplex_after_training(self):
        lw = LearnableLogOddsWeights(3)
        rng = np.random.default_rng(4)
        probs = rng.uniform(0.05, 0.95, (50, 3))
        labels = (probs[:, 0] > 0.5).astype(float)
        lw.fit(probs, labels, max_iterations=50)
        w = lw.weights
        assert np.all(w >= 0) and np.sum(w) == pytest.approx(1.0, rel=1e-9)

    def test_fit_resets_online_state(self):
        lw = LearnableLogOddsWeights(2)
        lw.update(np.array([0.9, 0.1]), 1.0)
        assert lw._n_updates == 1
        lw.fit(np.array([[0.8, 0.2]]), np.array([1.0]), max_iterations=5)
        assert lw._n_updates == 0
        assert np.all(lw._grad_logits_ema == 0)

    def test_update_accepts_mini_batches(self):
        lw = LearnableLogOddsWeights(2)
        probs = np.array([[0.9, 0.1], [0.8, 0.3], [0.2, 0.7]])
        labels = np.array([1.0, 1.0, 0.0])
        lw.update(probs, labels)
        assert lw._n_updates == 1
        assert np.isfinite(lw.weights).all()

    def test_averaged_weights_returns_copy(self):
        lw = LearnableLogOddsWeights(2)
        a = lw.averaged_weights
        a[0] = 99.0
        assert lw.averaged_weights[0] != 99.0

    def test_softmax_numerical_stability(self):
        lw = LearnableLogOddsWeights(3)
        lw._logits = np.array([1000.0, 1000.0, -1000.0])
        w = lw.weights
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w, [0.5, 0.5, 0.0], atol=1e-12)
        assert np.isfinite(lw(np.array([0.7, 0.6, 0.5])))

    def test_alpha_auto_resolves_to_half(self):
        lw = LearnableLogOddsWeights(4, alpha="auto")
        assert lw.alpha == 0.5

    def test_call_use_averaged_differs_after_updates(self):
        lw = LearnableLogOddsWeights(2)
        for _ in range(20):
            lw.update(np.array([0.9, 0.1]), 1.0, learning_rate=0.5)
        p = np.array([0.8, 0.3])
        raw = lw(p)
        avg = lw(p, use_averaged=True)
        assert raw != pytest.approx(avg, rel=1e-9)

    def test_properties(self):
        lw = LearnableLogOddsWeights(3, alpha=0.25, base_rate=0.1)
        assert lw.n_signals == 3
        assert lw.alpha == 0.25
        assert lw.base_rate == 0.1


class TestLearnableBaseRate:
    def test_none_preserves_plain_forward(self):
        p = np.array([0.8, 0.6])
        plain = LearnableLogOddsWeights(2)(p)
        assert plain == pytest.approx(
            float(log_odds_conjunction(p, weights=np.array([0.5, 0.5]))),
            rel=1e-5)

    def test_half_is_neutral(self):
        p = np.array([0.8, 0.6])
        assert LearnableLogOddsWeights(2, base_rate=0.5)(p) == pytest.approx(
            LearnableLogOddsWeights(2)(p), rel=1e-6)

    def test_low_shifts_down_high_shifts_up(self):
        p = np.array([0.8, 0.6])
        mid = LearnableLogOddsWeights(2)(p)
        assert LearnableLogOddsWeights(2, base_rate=0.05)(p) < mid
        assert LearnableLogOddsWeights(2, base_rate=0.95)(p) > mid

    @pytest.mark.parametrize("br", [0.0, 1.0, -0.1, 1.5])
    def test_invalid_raises(self, br):
        with pytest.raises(ValueError):
            LearnableLogOddsWeights(2, base_rate=br)

    def test_fit_and_update_with_base_rate(self):
        lw = LearnableLogOddsWeights(2, base_rate=0.1)
        rng = np.random.default_rng(5)
        probs = rng.uniform(0.05, 0.95, (30, 2))
        labels = (probs[:, 0] > 0.5).astype(float)
        lw.fit(probs, labels, max_iterations=20)
        lw.update(probs[0], labels[0])
        assert np.isfinite(lw.weights).all()
        assert lw.base_rate == 0.1


class TestAttentionSurface:
    def test_init_shapes(self):
        attn = AttentionLogOddsWeights(n_signals=3, n_query_features=5)
        assert attn.weights_matrix.shape == (3, 5)
        assert attn._b.shape == (3,)

    def test_init_alpha_auto(self):
        assert AttentionLogOddsWeights(2, 3, alpha="auto").alpha == 0.5

    @pytest.mark.parametrize("ns,nqf", [(0, 3), (2, 0), (-1, 3)])
    def test_init_invalid(self, ns, nqf):
        with pytest.raises(ValueError):
            AttentionLogOddsWeights(n_signals=ns, n_query_features=nqf)

    def test_different_queries_different_weights(self):
        attn = AttentionLogOddsWeights(2, 3)
        w1 = attn._compute_weights(np.array([1.0, 0.0, 0.0]))
        w2 = attn._compute_weights(np.array([0.0, 0.0, 1.0]))
        assert not np.allclose(w1, w2)

    def test_single_query_broadcast(self):
        attn = AttentionLogOddsWeights(2, 3)
        probs = np.array([[0.8, 0.7], [0.3, 0.9], [0.6, 0.6]])
        out = attn(probs, np.array([1.0, 0.5, -0.3]))
        assert out.shape == (3,)
        assert np.all((out > 0) & (out < 1))

    def test_vectorized_matches_per_row(self):
        attn = AttentionLogOddsWeights(2, 3, seed=7)
        rng = np.random.default_rng(6)
        probs = rng.uniform(0.1, 0.9, (5, 2))
        qf = rng.normal(size=(5, 3))
        batched = attn(probs, qf)
        singles = [attn(probs[i], qf[i]) for i in range(5)]
        np.testing.assert_allclose(batched, singles, rtol=1e-5)

    def test_update_moves_parameters(self):
        attn = AttentionLogOddsWeights(2, 3)
        w0 = attn.weights_matrix
        attn.update(np.array([0.9, 0.1]), 1.0, np.array([1.0, 0.5, 0.2]),
                    learning_rate=0.5)
        assert not np.allclose(attn.weights_matrix, w0)
        assert attn._n_updates == 1

    def test_use_averaged_differs_after_updates(self):
        attn = AttentionLogOddsWeights(2, 3)
        qf = np.array([1.0, 0.5, 0.2])
        for _ in range(10):
            attn.update(np.array([0.9, 0.1]), 1.0, qf, learning_rate=0.5)
        p = np.array([0.8, 0.3])
        assert attn(p, qf) != pytest.approx(
            attn(p, qf, use_averaged=True), rel=1e-9)

    def test_weights_matrix_returns_copy(self):
        attn = AttentionLogOddsWeights(2, 3)
        m = attn.weights_matrix
        m[0, 0] = 99.0
        assert attn.weights_matrix[0, 0] != 99.0

    def test_fit_resets_online_state(self):
        attn = AttentionLogOddsWeights(2, 3)
        attn.update(np.array([0.9, 0.1]), 1.0, np.array([1.0, 0.0, 0.0]))
        assert attn._n_updates == 1
        attn.fit(np.array([[0.8, 0.2]]), np.array([1.0]),
                 np.array([[1.0, 0.0, 0.0]]), max_iterations=5)
        assert attn._n_updates == 0
        assert np.all(attn._grad_W_ema == 0)

    def test_softmax_numerical_stability(self):
        attn = AttentionLogOddsWeights(2, 2)
        attn._W = np.array([[1000.0, 0.0], [-1000.0, 0.0]])
        w = attn._compute_weights(np.array([1.0, 1.0]))
        assert np.isfinite(w).all()
        np.testing.assert_allclose(np.sum(w, axis=-1), 1.0, rtol=1e-9)

    def test_normalize_default_false_and_property(self):
        assert AttentionLogOddsWeights(2, 3).normalize is False
        assert AttentionLogOddsWeights(2, 3, normalize=True).normalize is True

    def test_normalize_rescales_batch(self):
        attn_n = AttentionLogOddsWeights(2, 3, normalize=True, seed=1)
        attn_p = AttentionLogOddsWeights(2, 3, normalize=False, seed=1)
        rng = np.random.default_rng(7)
        probs = rng.uniform(0.1, 0.9, (6, 2))
        qf = rng.normal(size=(6, 3))
        assert not np.allclose(attn_n(probs, qf), attn_p(probs, qf))

    def test_normalize_uniform_signal_zeros_out(self):
        attn = AttentionLogOddsWeights(2, 2, normalize=True)
        probs = np.array([[0.9, 0.5], [0.5, 0.5], [0.1, 0.5]])
        out = attn(probs, np.array([1.0, 0.0]))
        assert out.shape == (3,)
        assert np.all(np.isfinite(out))

    def test_fit_normalize_query_ids_vs_global_differ(self):
        rng = np.random.default_rng(8)
        probs = rng.uniform(0.1, 0.9, (40, 2))
        labels = (probs[:, 0] > 0.5).astype(float)
        qf = rng.normal(size=(40, 3))
        qids = np.repeat(np.arange(8), 5)
        a = AttentionLogOddsWeights(2, 3, normalize=True, seed=2)
        b = AttentionLogOddsWeights(2, 3, normalize=True, seed=2)
        a.fit(probs, labels, qf, query_ids=qids, max_iterations=30)
        b.fit(probs, labels, qf, max_iterations=30)
        assert not np.allclose(a.weights_matrix, b.weights_matrix)

    def test_fit_normalize_without_query_ids(self):
        rng = np.random.default_rng(9)
        probs = rng.uniform(0.1, 0.9, (20, 2))
        labels = (probs[:, 1] > 0.5).astype(float)
        attn = AttentionLogOddsWeights(2, 3, normalize=True)
        attn.fit(probs, labels, rng.normal(size=(20, 3)), max_iterations=20)
        assert np.isfinite(attn.weights_matrix).all()


class TestAttentionBaseRate:
    def test_half_is_neutral(self):
        p = np.array([[0.8, 0.6]])
        qf = np.array([[1.0, 0.5]])
        a = AttentionLogOddsWeights(2, 2, seed=3, base_rate=0.5)
        b = AttentionLogOddsWeights(2, 2, seed=3)
        np.testing.assert_allclose(a(p, qf), b(p, qf), rtol=1e-6)

    def test_low_shifts_down_high_shifts_up(self):
        p = np.array([[0.8, 0.6]])
        qf = np.array([[1.0, 0.5]])
        mid = AttentionLogOddsWeights(2, 2, seed=3)(p, qf)
        lo = AttentionLogOddsWeights(2, 2, seed=3, base_rate=0.05)(p, qf)
        hi = AttentionLogOddsWeights(2, 2, seed=3, base_rate=0.95)(p, qf)
        assert lo < mid < hi

    @pytest.mark.parametrize("br", [0.0, 1.0, 2.0])
    def test_invalid_raises(self, br):
        with pytest.raises(ValueError):
            AttentionLogOddsWeights(2, 2, base_rate=br)

    def test_property_and_training(self):
        attn = AttentionLogOddsWeights(2, 2, base_rate=0.2)
        assert attn.base_rate == 0.2
        rng = np.random.default_rng(10)
        probs = rng.uniform(0.1, 0.9, (20, 2))
        labels = (probs[:, 0] > 0.5).astype(float)
        qf = rng.normal(size=(20, 2))
        attn.fit(probs, labels, qf, max_iterations=10)
        attn.update(probs[0], labels[0], qf[0])
        assert np.isfinite(attn.weights_matrix).all()


class TestMultiHeadSurface:
    def test_output_in_unit_interval(self):
        mh = MultiHeadAttentionLogOddsWeights(4, 2, 3)
        rng = np.random.default_rng(11)
        out = mh(rng.uniform(0.1, 0.9, (10, 2)), rng.normal(size=(10, 3)))
        assert np.all((out > 0) & (out < 1))

    def test_fit_reduces_bce(self):
        rng = np.random.default_rng(12)
        probs = rng.uniform(0.05, 0.95, (60, 2))
        labels = (probs[:, 0] > 0.5).astype(float)
        qf = rng.normal(size=(60, 3))
        mh = MultiHeadAttentionLogOddsWeights(2, 2, 3)

        def bce():
            p = np.clip(mh(probs, qf), 1e-9, 1 - 1e-9)
            return -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))

        before = bce()
        mh.fit(probs, labels, qf, max_iterations=100)
        assert bce() < before

    def test_n_heads_property_and_invalid(self):
        assert MultiHeadAttentionLogOddsWeights(3, 2, 2).n_heads == 3
        with pytest.raises(ValueError):
            MultiHeadAttentionLogOddsWeights(0, 2, 2)

    def test_update_moves_all_heads(self):
        mh = MultiHeadAttentionLogOddsWeights(2, 2, 2)
        before = [h.weights_matrix for h in mh.heads]
        mh.update(np.array([0.9, 0.1]), 1.0, np.array([1.0, 0.5]),
                  learning_rate=0.5)
        for b, h in zip(before, mh.heads):
            assert not np.allclose(h.weights_matrix, b)


class TestPruningEdges:
    def _attn(self):
        return AttentionLogOddsWeights(2, 2, seed=4)

    def test_empty_when_all_below(self):
        attn = self._attn()
        probs = np.full((5, 2), 0.01)
        surviving, fused = attn.prune(probs, np.ones((5, 2)), threshold=0.999)
        assert len(surviving) == 0 and len(fused) == 0

    def test_no_pruning_when_all_above(self):
        attn = self._attn()
        probs = np.full((5, 2), 0.99)
        surviving, fused = attn.prune(probs, np.ones((5, 2)), threshold=0.001)
        assert list(surviving) == [0, 1, 2, 3, 4]
        assert len(fused) == 5

    def test_multihead_prune_shapes(self):
        mh = MultiHeadAttentionLogOddsWeights(2, 2, 2)
        rng = np.random.default_rng(13)
        probs = rng.uniform(0.1, 0.9, (8, 2))
        qf = rng.normal(size=(8, 2))
        surviving, fused = mh.prune(probs, qf, threshold=0.0)
        assert len(surviving) == 8 and fused.shape == (8,)

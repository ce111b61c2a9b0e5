"""Fusion algebra + learnable/attention weight tests.

Covers: boolean ops, gating identities (GELU ~ Swish_1.702), log-odds
conjunction formulas (weighted/unweighted, sqrt(n) scaling), balanced
fusion, Hebbian gradient vs numerical gradient, attention pruning safety,
multi-head averaging semantics.
"""

import copy
import pickle

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
from bayesian_bm25_tpu.models.probability import logit, sigmoid


class TestBooleanOps:
    def test_cosine_mapping(self):
        assert cosine_to_probability(1.0) == pytest.approx(1.0, abs=1e-9)
        assert cosine_to_probability(-1.0) == pytest.approx(0.0, abs=1e-9)
        assert cosine_to_probability(0.0) == pytest.approx(0.5)

    def test_not_complement(self):
        assert prob_not(0.3) == pytest.approx(0.7)
        arr = np.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(prob_not(arr), 1 - arr, atol=1e-9)

    def test_and_is_product(self):
        p = np.array([0.5, 0.4, 0.9])
        assert prob_and(p) == pytest.approx(np.prod(p), rel=1e-9)

    def test_or_is_inclusion_exclusion(self):
        p = np.array([0.5, 0.4])
        assert prob_or(p) == pytest.approx(1 - 0.5 * 0.6, rel=1e-9)

    def test_batched_last_axis(self):
        p = np.random.default_rng(0).uniform(0.1, 0.9, (6, 3))
        out = prob_and(p)
        assert out.shape == (6,)
        np.testing.assert_allclose(out, np.prod(p, axis=-1), rtol=1e-9)

    def test_de_morgan(self):
        p = np.array([0.3, 0.6, 0.8])
        lhs = prob_not(prob_and(p))
        rhs = prob_or(np.asarray(prob_not(p)))
        assert lhs == pytest.approx(rhs, rel=1e-6)


class TestLogOddsConjunction:
    def test_unweighted_formula(self):
        p = np.array([0.8, 0.7, 0.9])
        x = logit(p)
        expected = sigmoid(np.mean(x) * 3 ** 0.5)
        assert log_odds_conjunction(p) == pytest.approx(expected, rel=1e-9)

    def test_auto_alpha_is_sqrt_n(self):
        p = np.array([0.8, 0.7])
        assert log_odds_conjunction(p, alpha="auto") == pytest.approx(
            log_odds_conjunction(p, alpha=0.5), rel=1e-12
        )

    def test_weighted_default_alpha_zero(self):
        p = np.array([0.8, 0.6])
        w = np.array([0.3, 0.7])
        expected = sigmoid(np.sum(w * logit(p)))
        assert log_odds_conjunction(p, weights=w) == pytest.approx(expected, rel=1e-9)

    def test_agreement_amplification(self):
        """sqrt(n) scaling: many agreeing signals beat one."""
        single = log_odds_conjunction(np.array([0.7]))
        many = log_odds_conjunction(np.full(9, 0.7))
        assert many > single

    def test_sign_preservation(self):
        """All-below-half signals fuse below half (Theorem 4.2.2)."""
        assert log_odds_conjunction(np.array([0.3, 0.4, 0.2])) < 0.5

    def test_weights_validation(self):
        p = np.array([0.8, 0.6])
        with pytest.raises(ValueError):
            log_odds_conjunction(p, weights=np.array([-0.1, 1.1]))
        with pytest.raises(ValueError):
            log_odds_conjunction(p, weights=np.array([0.3, 0.3]))

    def test_invalid_alpha_string(self):
        with pytest.raises(ValueError):
            log_odds_conjunction(np.array([0.5, 0.5]), alpha="bad")

    def test_max_logit_clipping(self):
        p = np.array([1 - 1e-12, 0.6])
        clipped = log_odds_conjunction(p, max_logit=5.0)
        unclipped = log_odds_conjunction(p)
        assert clipped < unclipped


class TestGating:
    def test_relu_zeroes_negative_evidence(self):
        p = np.array([0.3, 0.8])  # logits: negative, positive
        out = log_odds_conjunction(p, gating="relu")
        expected = sigmoid(np.mean([0.0, logit(0.8)]) * 2 ** 0.5)
        assert out == pytest.approx(expected, rel=1e-9)

    def test_gelu_matches_swish_1702(self):
        p = np.random.default_rng(1).uniform(0.05, 0.95, 20)
        g = log_odds_conjunction(p, gating="gelu")
        s = log_odds_conjunction(p, gating="swish", gating_beta=1.702)
        assert g == pytest.approx(s, rel=1e-9)

    def test_softplus_inflates_logits(self):
        p = np.array([0.8, 0.9])
        assert log_odds_conjunction(p, gating="softplus") > log_odds_conjunction(p)

    def test_invalid_gate_raises(self):
        with pytest.raises(ValueError):
            log_odds_conjunction(np.array([0.5, 0.5]), gating="tanh")

    def test_swish_beta_limit_approaches_relu(self):
        p = np.array([0.2, 0.9])
        hi_beta = log_odds_conjunction(p, gating="swish", gating_beta=50.0)
        relu = log_odds_conjunction(p, gating="relu")
        assert hi_beta == pytest.approx(relu, abs=1e-3)


class TestBalancedFusion:
    def test_equal_weight_midpoint(self):
        rng = np.random.default_rng(2)
        sparse = rng.uniform(0.01, 0.99, 100)
        dense = rng.uniform(-1, 1, 100)
        out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        assert out.shape == (100,)
        assert np.all(out >= 0.0) and np.all(out <= 1.0)

    def test_zero_variance_signal_contributes_nothing(self):
        sparse = np.full(10, 0.7)
        dense = np.linspace(-0.5, 0.5, 10)
        out = balanced_log_odds_fusion(sparse, dense, weight=0.5)
        dense_only = balanced_log_odds_fusion(sparse, dense, weight=1.0)
        np.testing.assert_allclose(out, 0.5 * dense_only, atol=1e-9)

    def test_weight_extremes(self):
        rng = np.random.default_rng(3)
        sparse = rng.uniform(0.01, 0.99, 50)
        dense = rng.uniform(-1, 1, 50)
        w0 = balanced_log_odds_fusion(sparse, dense, weight=0.0)
        # weight=0: ranking equals sparse-prob ranking
        np.testing.assert_array_equal(np.argsort(w0), np.argsort(sparse))


class TestLearnableWeights:
    def test_uniform_init(self):
        lw = LearnableLogOddsWeights(n_signals=3)
        np.testing.assert_allclose(lw.weights, 1 / 3, rtol=1e-12)

    def test_forward_matches_conjunction_at_uniform(self):
        lw = LearnableLogOddsWeights(n_signals=3, alpha=0.0)
        p = np.array([0.7, 0.6, 0.8])
        expected = log_odds_conjunction(p, alpha=0.0, weights=np.full(3, 1 / 3))
        assert lw(p) == pytest.approx(expected, rel=1e-9)

    def test_validation(self):
        with pytest.raises(ValueError):
            LearnableLogOddsWeights(n_signals=0)
        with pytest.raises(ValueError):
            LearnableLogOddsWeights(n_signals=2, base_rate=2.0)
        lw = LearnableLogOddsWeights(n_signals=2)
        with pytest.raises(ValueError):
            lw(np.array([0.5, 0.5, 0.5]))

    def test_hebbian_gradient_matches_numerical(self):
        """Analytic dBCE/dz vs central finite differences."""
        rng = np.random.default_rng(4)
        n = 3
        probs = rng.uniform(0.1, 0.9, (40, n))
        labels = rng.integers(0, 2, 40).astype(float)
        z = rng.normal(0, 0.5, n)

        def bce(zv):
            zs = zv - np.max(zv)
            w = np.exp(zs) / np.sum(np.exp(zs))
            x = np.log(probs / (1 - probs))
            pred = 1 / (1 + np.exp(-np.sum(w * x, axis=-1)))
            pred = np.clip(pred, 1e-12, 1 - 1e-12)
            return -np.mean(labels * np.log(pred) + (1 - labels) * np.log(1 - pred))

        from bayesian_bm25_tpu.ops.fusion_learn import _learnable_grads
        from bayesian_bm25_tpu.ops.mathx import logit as jlogit

        x = np.asarray(jlogit(probs))
        analytic = np.asarray(_learnable_grads(z, x, labels, 1.0, None))
        eps = 1e-6
        for j in range(n):
            zp = z.copy(); zp[j] += eps
            zm = z.copy(); zm[j] -= eps
            num = (bce(zp) - bce(zm)) / (2 * eps)
            assert analytic[j] == pytest.approx(num, abs=1e-6)

    def test_fit_recovers_reliable_signal(self):
        """Signal 0 is informative, signal 1 is noise -> w0 > w1."""
        rng = np.random.default_rng(5)
        m = 2000
        labels = rng.integers(0, 2, m).astype(float)
        good = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.05, m), 0.01, 0.99)
        noise = rng.uniform(0.01, 0.99, m)
        probs = np.column_stack([good, noise])
        lw = LearnableLogOddsWeights(n_signals=2)
        lw.fit(probs, labels, learning_rate=0.5, max_iterations=3000)
        assert lw.weights[0] > 0.7

    def test_online_update_converges_same_direction(self):
        rng = np.random.default_rng(6)
        m = 500
        labels = rng.integers(0, 2, m).astype(float)
        good = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.05, m), 0.01, 0.99)
        noise = rng.uniform(0.01, 0.99, m)
        probs = np.column_stack([good, noise])
        lw = LearnableLogOddsWeights(n_signals=2)
        for i in range(m):
            lw.update(probs[i], labels[i], learning_rate=0.5)
        assert lw.weights[0] > 0.6
        assert lw.averaged_weights[0] > 0.5

    def test_base_rate_shifts_output(self):
        p = np.array([0.7, 0.7])
        plain = LearnableLogOddsWeights(n_signals=2)(p)
        low = LearnableLogOddsWeights(n_signals=2, base_rate=0.01)(p)
        assert low < plain

    def test_pickle_round_trip(self):
        lw = LearnableLogOddsWeights(n_signals=2)
        lw.update(np.array([0.8, 0.3]), 1.0)
        lw2 = pickle.loads(pickle.dumps(lw))
        p = np.array([0.6, 0.7])
        assert lw2(p) == pytest.approx(lw(p), rel=1e-12)
        lw3 = copy.deepcopy(lw)
        lw3.update(np.array([0.9, 0.1]), 1.0)
        assert lw(p) != lw3(p)


class TestAttentionWeights:
    def test_validation(self):
        with pytest.raises(ValueError):
            AttentionLogOddsWeights(n_signals=0, n_query_features=3)
        with pytest.raises(ValueError):
            AttentionLogOddsWeights(n_signals=2, n_query_features=0)

    def test_seeded_init_reproducible(self):
        a = AttentionLogOddsWeights(2, 3, seed=7)
        b = AttentionLogOddsWeights(2, 3, seed=7)
        np.testing.assert_array_equal(a.weights_matrix, b.weights_matrix)
        c = AttentionLogOddsWeights(2, 3, seed=8)
        assert not np.array_equal(a.weights_matrix, c.weights_matrix)

    def test_weights_are_softmax(self):
        a = AttentionLogOddsWeights(3, 4, seed=0)
        qf = np.random.default_rng(0).normal(0, 1, (5, 4))
        w = a._compute_weights(qf)
        assert w.shape == (5, 3)
        np.testing.assert_allclose(np.sum(w, axis=-1), 1.0, rtol=1e-9)
        assert np.all(w > 0)

    def test_single_sample_forward(self):
        a = AttentionLogOddsWeights(2, 3, seed=0)
        out = a(np.array([0.7, 0.6]), np.array([1.0, 0.5, 0.2]))
        assert isinstance(out, float)
        assert 0 < out < 1

    def test_batched_forward(self):
        a = AttentionLogOddsWeights(2, 3, seed=0)
        probs = np.random.default_rng(1).uniform(0.1, 0.9, (8, 2))
        qf = np.random.default_rng(2).normal(0, 1, (8, 3))
        out = a(probs, qf)
        assert out.shape == (8,)

    def test_fit_learns_query_dependent_weights(self):
        """Queries with feature +1 should trust signal 0; feature -1 signal 1."""
        rng = np.random.default_rng(8)
        m = 3000
        f = rng.choice([-1.0, 1.0], m)
        labels = rng.integers(0, 2, m).astype(float)
        informative = np.clip(0.5 + (labels - 0.5) * 0.7 + rng.normal(0, 0.05, m), 0.01, 0.99)
        noise = rng.uniform(0.01, 0.99, m)
        s0 = np.where(f > 0, informative, noise)
        s1 = np.where(f > 0, noise, informative)
        probs = np.column_stack([s0, s1])
        qf = f.reshape(-1, 1)
        a = AttentionLogOddsWeights(2, 1, seed=0)
        a.fit(probs, labels, qf, learning_rate=0.5, max_iterations=2000)
        w_pos = a._compute_weights(np.array([[1.0]]))[0]
        w_neg = a._compute_weights(np.array([[-1.0]]))[0]
        assert w_pos[0] > 0.6
        assert w_neg[1] > 0.6

    def test_normalization_changes_output(self):
        rng = np.random.default_rng(9)
        probs = rng.uniform(0.1, 0.9, (10, 2))
        qf = rng.normal(0, 1, (10, 3))
        plain = AttentionLogOddsWeights(2, 3, seed=0)(probs, qf)
        norm = AttentionLogOddsWeights(2, 3, seed=0, normalize=True)(probs, qf)
        assert not np.allclose(plain, norm)

    def test_pruning_is_exact(self):
        """Pruned survivors' fused probs match unpruned values, and no
        candidate above threshold is dropped (Theorem 8.7.1)."""
        rng = np.random.default_rng(10)
        m = 200
        probs = rng.uniform(0.05, 0.95, (m, 2))
        qf = rng.normal(0, 1, (m, 3))
        a = AttentionLogOddsWeights(2, 3, seed=1)
        full = a(probs, qf)
        threshold = float(np.median(full))
        surviving, fused = a.prune(probs, qf, threshold)
        # safety: every candidate with fused >= threshold survives
        should_survive = np.where(full >= threshold)[0]
        assert set(should_survive).issubset(set(surviving.tolist()))
        # exactness on survivors
        np.testing.assert_allclose(fused, full[surviving], rtol=1e-9)

    def test_prune_with_loose_upper_bounds_safe(self):
        rng = np.random.default_rng(11)
        m = 100
        probs = rng.uniform(0.05, 0.6, (m, 2))
        ub = np.clip(probs + 0.2, 0, 0.99)  # genuine upper bounds
        qf = rng.normal(0, 1, (m, 3))
        a = AttentionLogOddsWeights(2, 3, seed=2)
        full = a(probs, qf)
        threshold = float(np.percentile(full, 70))
        surviving, _ = a.prune(probs, qf, threshold, upper_bound_probs=ub)
        should_survive = np.where(full >= threshold)[0]
        assert set(should_survive).issubset(set(surviving.tolist()))

    def test_prune_empty_result(self):
        a = AttentionLogOddsWeights(2, 2, seed=0)
        surviving, fused = a.prune(
            np.array([[0.1, 0.1]]), np.array([0.0, 0.0]), threshold=0.999999
        )
        assert len(surviving) == 0 and len(fused) == 0


class TestMultiHead:
    def test_validation(self):
        with pytest.raises(ValueError):
            MultiHeadAttentionLogOddsWeights(0, 2, 3)

    def test_heads_are_diverse(self):
        mh = MultiHeadAttentionLogOddsWeights(3, 2, 3)
        mats = [h.weights_matrix for h in mh.heads]
        assert not np.array_equal(mats[0], mats[1])
        assert not np.array_equal(mats[1], mats[2])

    def test_single_head_equals_attention(self):
        mh = MultiHeadAttentionLogOddsWeights(1, 2, 3)
        a = AttentionLogOddsWeights(2, 3, seed=0)
        rng = np.random.default_rng(12)
        probs = rng.uniform(0.1, 0.9, (6, 2))
        qf = rng.normal(0, 1, (6, 3))
        np.testing.assert_allclose(mh(probs, qf), a(probs, qf), rtol=1e-9)

    def test_forward_is_log_odds_average(self):
        mh = MultiHeadAttentionLogOddsWeights(4, 2, 3)
        rng = np.random.default_rng(13)
        probs = rng.uniform(0.1, 0.9, (5, 2))
        qf = rng.normal(0, 1, (5, 3))
        per_head = np.stack([h(probs, qf) for h in mh.heads])
        x = np.log(per_head / (1 - per_head))
        expected = 1 / (1 + np.exp(-np.mean(x, axis=0)))
        np.testing.assert_allclose(mh(probs, qf), expected, rtol=1e-8)

    def test_fit_trains_all_heads(self):
        rng = np.random.default_rng(14)
        m = 300
        labels = rng.integers(0, 2, m).astype(float)
        good = np.clip(0.5 + (labels - 0.5) * 0.6 + rng.normal(0, 0.05, m), 0.01, 0.99)
        probs = np.column_stack([good, rng.uniform(0.01, 0.99, m)])
        qf = rng.normal(0, 1, (m, 3))
        mh = MultiHeadAttentionLogOddsWeights(2, 2, 3)
        before = [h.weights_matrix.copy() for h in mh.heads]
        mh.fit(probs, labels, qf, max_iterations=50)
        for b, h in zip(before, mh.heads):
            assert not np.array_equal(b, h.weights_matrix)

    def test_multihead_pruning_safe(self):
        rng = np.random.default_rng(15)
        m = 150
        probs = rng.uniform(0.05, 0.95, (m, 2))
        qf = rng.normal(0, 1, (m, 3))
        mh = MultiHeadAttentionLogOddsWeights(3, 2, 3)
        full = mh(probs, qf)
        threshold = float(np.median(full))
        surviving, fused = mh.prune(probs, qf, threshold)
        should_survive = np.where(full >= threshold)[0]
        assert set(should_survive).issubset(set(surviving.tolist()))
        np.testing.assert_allclose(fused, full[surviving], rtol=1e-9)

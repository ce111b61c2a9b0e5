"""Second theorem/property file: deeper invariants of the probability,
fusion, calibration, and density layers."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    BayesianProbabilityTransform,
    IsotonicCalibrator,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
    TemporalBayesianTransform,
    balanced_log_odds_fusion,
    expected_calibration_error,
    log_odds_conjunction,
    prob_and,
    prob_or,
)


class TestBaseRateRankInvariance:
    """README claim: the base rate recalibrates but never re-ranks."""

    def test_posterior_order_preserved(self):
        rng = np.random.default_rng(0)
        t_plain = BayesianProbabilityTransform(alpha=1.1, beta=3.0)
        t_br = BayesianProbabilityTransform(alpha=1.1, beta=3.0,
                                            base_rate=0.003)
        scores = rng.uniform(0, 12, 300)
        tfs = rng.integers(0, 15, 300).astype(float)
        dlr = rng.uniform(0.2, 2.0, 300)
        p1 = np.asarray(t_plain.score_to_probability(scores, tfs, dlr))
        p2 = np.asarray(t_br.score_to_probability(scores, tfs, dlr))
        np.testing.assert_array_equal(np.argsort(p1), np.argsort(p2))

    def test_base_rate_is_logit_shift(self):
        """posterior(.., br) = sigmoid(logit(posterior(..)) + logit(br))."""
        t = BayesianProbabilityTransform
        L, prior, br = 0.73, 0.42, 0.01
        base = t.posterior(L, prior)
        lhs = t.posterior(L, prior, base_rate=br)
        rhs = 1 / (1 + np.exp(-(np.log(base / (1 - base))
                                + np.log(br / (1 - br)))))
        assert lhs == pytest.approx(rhs, rel=1e-9)


class TestPosteriorMonotonicity:
    def test_monotone_in_likelihood(self):
        t = BayesianProbabilityTransform
        Ls = np.linspace(0.01, 0.99, 50)
        out = np.asarray(t.posterior(Ls, 0.3))
        assert np.all(np.diff(out) > 0)

    def test_monotone_in_prior(self):
        t = BayesianProbabilityTransform
        ps = np.linspace(0.1, 0.9, 50)
        out = np.asarray(t.posterior(0.6, ps))
        assert np.all(np.diff(out) > 0)

    def test_wand_bound_approached(self):
        """The bound is attained as the prior approaches p_max at the
        maximal score (tightness of Theorem 6.1.2)."""
        t = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        ub = 9.0
        bound = t.wand_upper_bound(ub)
        at_max = t.posterior(t.likelihood(ub), 0.9)
        assert at_max == pytest.approx(bound, rel=1e-12)


class TestSoftmaxParameterization:
    def test_learnable_logit_shift_invariance(self):
        """softmax(z) == softmax(z + c): shifted logits give identical
        forward outputs."""
        lw1 = LearnableLogOddsWeights(3)
        lw2 = LearnableLogOddsWeights(3)
        lw1._logits = np.array([0.5, -0.2, 1.0])
        lw2._logits = lw1._logits + 7.3
        p = np.array([0.7, 0.4, 0.6])
        assert lw1(p) == pytest.approx(lw2(p), rel=1e-12)

    def test_attention_weights_stay_in_simplex_through_training(self):
        rng = np.random.default_rng(1)
        a = AttentionLogOddsWeights(3, 2, seed=0)
        probs = rng.uniform(0.1, 0.9, (200, 3))
        labels = rng.integers(0, 2, 200).astype(float)
        qf = rng.normal(0, 1, (200, 2))
        a.fit(probs, labels, qf, max_iterations=50)
        for _ in range(20):
            a.update(probs[:8], labels[:8], qf[:8])
        w = a._compute_weights(qf[:50])
        assert np.all(w > 0)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-9)
        w_avg = a._compute_weights(qf[:50], use_averaged=True)
        np.testing.assert_allclose(w_avg.sum(axis=1), 1.0, rtol=1e-9)

    def test_learnable_polyak_average_stays_in_simplex(self):
        rng = np.random.default_rng(2)
        lw = LearnableLogOddsWeights(4)
        for _ in range(30):
            lw.update(rng.uniform(0.1, 0.9, 4), float(rng.integers(0, 2)))
        assert np.all(lw.averaged_weights > 0)
        assert lw.averaged_weights.sum() == pytest.approx(1.0, rel=1e-9)


class TestBooleanAlgebraIdentities:
    def test_single_signal_identity(self):
        assert prob_and(np.array([0.42])) == pytest.approx(0.42, rel=1e-8)
        assert prob_or(np.array([0.42])) == pytest.approx(0.42, rel=1e-8)
        assert log_odds_conjunction(np.array([0.42]), alpha=0.0) == \
            pytest.approx(0.42, rel=1e-8)

    def test_or_monotone_in_each_argument(self):
        base = prob_or(np.array([0.3, 0.5]))
        assert prob_or(np.array([0.4, 0.5])) > base
        assert prob_or(np.array([0.3, 0.6])) > base

    def test_and_bounded_by_min(self):
        rng = np.random.default_rng(3)
        p = rng.uniform(0.05, 0.95, (50, 3))
        out = np.asarray(prob_and(p))
        assert np.all(out <= p.min(axis=1) + 1e-12)

    def test_or_bounded_by_max(self):
        rng = np.random.default_rng(4)
        p = rng.uniform(0.05, 0.95, (50, 3))
        out = np.asarray(prob_or(p))
        assert np.all(out >= p.max(axis=1) - 1e-12)

    def test_max_logit_only_affects_saturated(self):
        moderate = np.array([0.7, 0.6])
        assert log_odds_conjunction(moderate, max_logit=10.0) == \
            pytest.approx(float(log_odds_conjunction(moderate)), rel=1e-9)


class TestBalancedFusionProperties:
    def test_weight_one_is_pure_dense_ranking(self):
        rng = np.random.default_rng(5)
        sparse = rng.uniform(0.01, 0.99, 40)
        dense = rng.uniform(-1, 1, 40)
        fused = np.asarray(balanced_log_odds_fusion(sparse, dense, 1.0))
        np.testing.assert_array_equal(np.argsort(fused), np.argsort(dense))

    def test_output_in_unit_interval(self):
        rng = np.random.default_rng(6)
        fused = np.asarray(balanced_log_odds_fusion(
            rng.uniform(0.01, 0.99, 100), rng.uniform(-1, 1, 100), 0.3))
        assert fused.min() >= 0.0 and fused.max() <= 1.0


class TestTemporalWeighting:
    def test_weights_normalized_to_n(self):
        """Sample weights are normalized to sum to n
        (probability.py:571-578)."""
        t = TemporalBayesianTransform(decay_half_life=10.0)
        ts = np.arange(100, dtype=float)
        w = np.exp(-t._decay_rate * (ts.max() - ts))
        w = w * (len(ts) / w.sum())
        assert w.sum() == pytest.approx(100.0)
        # half-life semantics: weight halves every 10 steps
        assert w[-1] / w[-11] == pytest.approx(2.0, rel=1e-9)

    def test_infinite_half_life_weights_uniform(self):
        t = TemporalBayesianTransform(decay_half_life=1e12)
        ts = np.arange(50, dtype=float)
        w = np.exp(-t._decay_rate * (ts.max() - ts))
        np.testing.assert_allclose(w, 1.0, rtol=1e-9)


class TestDensityMath:
    def test_silverman_closed_form_unweighted(self):
        from bayesian_bm25_tpu.ops.density import silverman_bandwidth

        rng = np.random.default_rng(7)
        d = rng.normal(0, 1.7, 400)
        h = float(np.asarray(silverman_bandwidth(d)))
        sigma = d.std()
        assert h == pytest.approx(1.06 * sigma * 400 ** (-0.2), rel=1e-6)

    def test_effective_sample_size(self):
        """K_eff = n for uniform weights; K_eff = 1 for one-hot weights."""
        from bayesian_bm25_tpu.ops.density import silverman_bandwidth

        d = np.linspace(0, 1, 100)
        h_uniform = float(np.asarray(silverman_bandwidth(d, np.ones(100))))
        w_onehot = np.zeros(100)
        w_onehot[50] = 1.0
        h_onehot = float(np.asarray(silverman_bandwidth(d, w_onehot)))
        # one-hot: sigma_w = 0 -> epsilon floor
        assert h_onehot < 1e-6 < h_uniform

    def test_gmm_background_frozen(self):
        """Remark 5.3.2: EM must not move the background component."""
        from bayesian_bm25_tpu.ops.density import gmm_fixed_background

        rng = np.random.default_rng(8)
        d = np.concatenate([rng.normal(0.3, 0.05, 50),
                            rng.normal(0.7, 0.1, 150)])
        mu_G, sigma_G = 0.7, 0.1
        mu_R, sigma_R, pi_R = gmm_fixed_background(
            d, mu_G, sigma_G, 0.35, 0.05, 0.3)
        # fitted relevant component approaches the planted mode; the
        # background parameters are inputs and by construction unchanged
        assert float(mu_R) == pytest.approx(0.3, abs=0.05)
        assert 0.01 <= float(pi_R) <= 0.99

    def test_kde_single_point_peak(self):
        from bayesian_bm25_tpu.ops.density import kernel_density

        d = np.array([0.5])
        vals = np.asarray(kernel_density(
            np.array([0.5, 0.6]), d, np.array([1.0]), 0.1))
        assert vals[0] > vals[1]
        assert vals[0] == pytest.approx(1 / (0.1 * np.sqrt(2 * np.pi)),
                                        rel=1e-6)


class TestCalibrationInvariants:
    def test_ece_permutation_invariant(self):
        rng = np.random.default_rng(9)
        p = rng.uniform(0, 1, 500)
        y = rng.integers(0, 2, 500).astype(float)
        perm = rng.permutation(500)
        assert expected_calibration_error(p, y) == pytest.approx(
            expected_calibration_error(p[perm], y[perm]), abs=1e-12)

    def test_isotonic_preserves_label_mean(self):
        """PAVA block values are label means -> the calibrated training
        predictions preserve the global mean."""
        rng = np.random.default_rng(10)
        s = rng.normal(0, 1, 400)
        y = (rng.uniform(size=400) < 1 / (1 + np.exp(-2 * s))).astype(float)
        cal = IsotonicCalibrator()
        cal.fit(s, y)
        preds = np.asarray(cal.calibrate(s))
        assert preds.mean() == pytest.approx(y.mean(), abs=0.02)


class TestMultiHeadReduction:
    def test_identical_heads_collapse_to_single(self):
        """If every head shares parameters, the log-odds average equals any
        single head (mean of identical values)."""
        mh = MultiHeadAttentionLogOddsWeights(3, 2, 2)
        W = mh.heads[0]._W.copy()
        for h in mh.heads:
            h._W = W.copy()
            h._b = mh.heads[0]._b.copy()
        rng = np.random.default_rng(11)
        probs = rng.uniform(0.1, 0.9, (6, 2))
        qf = rng.normal(0, 1, (6, 2))
        single = mh.heads[0](probs, qf)
        np.testing.assert_allclose(mh(probs, qf), single, rtol=1e-9)


class TestSegmentNormalization:
    def test_groups_normalized_independently(self):
        from bayesian_bm25_tpu.ops.mathx import segment_min_max_normalize

        x = np.array([[1.0], [3.0], [10.0], [20.0]])
        seg = np.array([0, 0, 1, 1])
        out = np.asarray(segment_min_max_normalize(x, seg, 2))
        np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 0.0, 1.0],
                                   atol=1e-12)

    def test_zero_variance_group_maps_to_zero(self):
        from bayesian_bm25_tpu.ops.mathx import segment_min_max_normalize

        x = np.array([[5.0], [5.0], [1.0], [2.0]])
        seg = np.array([0, 0, 1, 1])
        out = np.asarray(segment_min_max_normalize(x, seg, 2))
        np.testing.assert_allclose(out[:2, 0], 0.0, atol=1e-12)

"""Paper 2 neural-correspondence theorems (completes the reference's spec
coverage, ref tests/test_paper_theorems.py:1022-2012, 2585-2790):
sigmoid uniqueness (C1-C4 characterization and the exclusion proofs for
tanh/probit/softplus/ReLU), neuron-posterior identity, ReLU-as-MAP,
Swish/GELU as Bayesian expected signals, generalized-Swish limits, the
soft-gate hierarchy, attention-as-LogOP, recursive inference depth, and
the Naive-Bayes weight initialization."""

import math

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    BayesianProbabilityTransform,
    LearnableLogOddsWeights,
    log_odds_conjunction,
)
from bayesian_bm25_tpu.api_fusion import log_odds_conjunction as api_conj
from bayesian_bm25_tpu.models.probability import logit, sigmoid
from bayesian_bm25_tpu.ops.fusion import apply_gating


def gauss_cdf(x):
    return 0.5 * (1.0 + np.vectorize(math.erf)(np.asarray(x) / np.sqrt(2)))


def conj(probs, **kw):
    return float(log_odds_conjunction(np.asarray(probs, float), **kw))


class TestSigmoidUniqueness:
    """Theorem 6.2.1: sigmoid uniquely satisfies (a) range (0,1),
    (b) symmetry f(x)+f(-x)=1, (c) self-derivative f'=f(1-f)
    (ref :1022-1082)."""

    def test_sigmoid_satisfies_all_three(self):
        x = np.linspace(-10, 10, 1000)
        s = np.asarray(sigmoid(x))
        assert np.all((s > 0) & (s < 1))
        np.testing.assert_allclose(s + np.asarray(sigmoid(-x)), 1.0,
                                   atol=1e-12)
        h = 1e-7
        numerical = (np.asarray(sigmoid(x + h)) -
                     np.asarray(sigmoid(x - h))) / (2 * h)
        np.testing.assert_allclose(s * (1 - s), numerical, atol=1e-6)

    def test_relu_violates_range(self):
        assert np.any(np.maximum(0, np.array([2.0, 5.0])) > 1)

    def test_rescaled_tanh_violates_self_derivative(self):
        x = np.linspace(-5, 5, 1000)
        f = (1 + np.tanh(x)) / 2
        assert np.all((f > 0) & (f < 1))
        np.testing.assert_allclose(f + (1 + np.tanh(-x)) / 2, 1.0, atol=1e-12)
        actual = (1 - np.tanh(x) ** 2) / 2
        assert not np.allclose(actual, f * (1 - f), atol=1e-4)

    def test_tanh_half_argument_is_sigmoid(self):
        # (1 + tanh(x/2)) / 2 == sigmoid(x): tanh only "violates" the
        # axioms at the wrong argument scale (ref :1128-1158)
        x = np.linspace(-20, 20, 2000)
        np.testing.assert_allclose((1 + np.tanh(x / 2)) / 2,
                                   np.asarray(sigmoid(x)), atol=1e-12)


class TestProbitExclusion:
    """Theorem 6.2.x: the probit satisfies range and symmetry but not
    the self-derivative axiom (ref :1161-1193)."""

    def test_satisfies_range_and_symmetry(self):
        x = np.linspace(-6, 6, 500)
        p = gauss_cdf(x)
        assert np.all((p > 0) & (p < 1))
        np.testing.assert_allclose(p + gauss_cdf(-x), 1.0, atol=1e-12)

    def test_violates_self_derivative(self):
        x = np.linspace(-3, 3, 500)
        p = gauss_cdf(x)
        density = np.exp(-x ** 2 / 2) / np.sqrt(2 * np.pi)
        assert not np.allclose(density, p * (1 - p), atol=1e-3)


class TestSoftplusExclusion:
    """Softplus violates range (unbounded above, never exactly 0) and
    symmetry (ref :1975-2025)."""

    def test_unbounded_above_and_positive(self):
        sp = np.log1p(np.exp(np.array([0.0, 2.0, 10.0, 30.0])))
        assert sp[-1] > 1
        assert np.all(sp > 0)
        # never reaches zero even for very negative inputs
        assert np.log1p(np.exp(-30.0)) > 0

    def test_violates_symmetry(self):
        x = np.linspace(-4, 4, 100)
        sp = np.log1p(np.exp(x))
        assert not np.allclose(sp + np.log1p(np.exp(-x)), 1.0, atol=1e-2)

    def test_violates_self_derivative(self):
        x = np.linspace(-4, 4, 500)
        sp = np.log1p(np.exp(x))
        deriv = np.asarray(sigmoid(x))  # softplus' = sigmoid
        assert not np.allclose(deriv, sp * (1 - sp), atol=1e-3)


class TestReLUCharacterization:
    """Theorem 6.5.x: ReLU's defining properties Q1-Q4 and its failure
    of the probability axioms (ref :2028-2157)."""

    def test_q1_non_negative(self):
        x = np.linspace(-10, 10, 1000)
        assert np.all(np.maximum(0, x) >= 0)

    def test_q2_sparsity(self):
        x = np.linspace(-10, -0.01, 100)
        assert np.all(np.maximum(0, x) == 0)

    def test_q3_linearity_above_threshold(self):
        x = np.linspace(0.01, 10, 100)
        np.testing.assert_allclose(np.maximum(0, x), x, atol=1e-15)

    def test_q4_hard_threshold_nondifferentiable(self):
        h = 1e-6
        left = (max(0, 0.0) - max(0, -h)) / h
        right = (max(0, h) - max(0, 0.0)) / h
        assert abs(left - right) > 0.5  # kink at 0

    def test_violates_probability_axioms(self):
        x = np.linspace(-2, 2, 100)
        r = np.maximum(0, x)
        assert np.any(r == 0.0)  # violates strict (0,1) range
        assert not np.allclose(r + np.maximum(0, -x), 1.0, atol=1e-2)


class TestOutputRange:
    """All probability outputs stay in (0, 1) for any finite input
    (ref :1085-1126)."""

    def test_score_to_probability_range(self):
        rng = np.random.default_rng(42)
        for _ in range(20):
            t = BayesianProbabilityTransform(
                alpha=float(rng.uniform(0.01, 10)),
                beta=float(rng.uniform(-10, 10)))
            probs = np.asarray(t.score_to_probability(
                rng.uniform(-100, 100, 100), rng.uniform(0, 100, 100),
                rng.uniform(0, 10, 100)))
            assert np.all((probs > 0) & (probs < 1))

    def test_conjunction_range_extreme_inputs(self):
        for probs in ([1e-9, 1e-9], [1 - 1e-9, 1 - 1e-9],
                      [1e-9, 1 - 1e-9], [0.5] * 10):
            r = conj(probs, alpha=1.0)
            assert 0.0 <= r <= 1.0


class TestNeuronPosteriorIdentity:
    """Theorem 6.4.1: sigma(alpha (s - beta)) IS the sigmoid neuron
    sigma(w s + b) under w=alpha, b=-alpha beta (ref :1196-1228)."""

    def test_parameter_correspondence(self):
        rng = np.random.default_rng(42)
        alpha = rng.uniform(0.1, 5.0, 200)
        beta = rng.uniform(-3.0, 5.0, 200)
        s = rng.uniform(-10, 10, 200)
        np.testing.assert_allclose(
            np.asarray(sigmoid(alpha * (s - beta))),
            np.asarray(sigmoid(alpha * s + (-alpha * beta))), atol=1e-14)

    def test_batch_equivalence(self):
        rng = np.random.default_rng(1)
        scores = rng.uniform(-5, 10, 1000)
        np.testing.assert_allclose(
            np.asarray(sigmoid(2.5 * (scores - 1.3))),
            np.asarray(sigmoid(2.5 * scores - 2.5 * 1.3)), atol=1e-14)


class TestReLUFromMAP:
    """Theorem 6.5.3: MAP under exponential prior + Gaussian likelihood
    is max(0, x/w - lambda tau^2 / w^2) (ref :1230-1297)."""

    def test_closed_form_matches_grid_search(self):
        rng = np.random.default_rng(42)
        for _ in range(30):
            w = float(rng.uniform(0.5, 3.0))
            lam = float(rng.uniform(0.1, 5.0))
            tau = float(rng.uniform(0.1, 2.0))
            x = float(rng.uniform(-3, 5))
            z = x / w
            h_closed = max(0.0, z - lam * tau ** 2 / w ** 2)
            h_grid = np.linspace(0, max(10.0, z + 5), 10000)
            log_post = -(x - w * h_grid) ** 2 / (2 * tau ** 2) - lam * h_grid
            assert h_closed == pytest.approx(
                float(h_grid[np.argmax(log_post)]), abs=0.01)

    def test_stationarity_at_optimum(self):
        rng = np.random.default_rng(43)
        for _ in range(50):
            w = float(rng.uniform(0.5, 3.0))
            lam = float(rng.uniform(0.1, 5.0))
            tau = float(rng.uniform(0.1, 2.0))
            x = float(rng.uniform(-5, 10))
            h = max(0.0, x / w - lam * tau ** 2 / w ** 2)
            grad = w * (x - w * h) / tau ** 2 - lam
            if h > 0:
                assert abs(grad) < 1e-8
            else:
                assert grad <= 1e-8

    def test_sparsity_threshold(self):
        theta = 1.0  # lam=tau=w=1
        assert max(0.0, -1.0 - theta) == 0.0
        assert max(0.0, 0.5 - theta) == 0.0
        assert max(0.0, 2.0 - theta) > 0.0


class TestSwishBayesianExpectedSignal:
    """Theorem 6.7.4/6.7.5: Swish(x) = x sigma(x) is the Bayes expected
    signal; ReLU is its hard-gate (MAP) counterpart (ref :1299-1366)."""

    def test_expected_value_identity(self):
        x = np.linspace(-10, 10, 2000)
        ev = x * np.asarray(sigmoid(x)) + 0.0 * (1 - np.asarray(sigmoid(x)))
        np.testing.assert_allclose(ev, x * np.asarray(sigmoid(x)), atol=1e-15)

    def test_asymptotic_to_relu_and_negative_dip(self):
        x = np.linspace(10, 20, 100)
        np.testing.assert_allclose(x * np.asarray(sigmoid(x)),
                                   np.maximum(0, x), atol=1e-3)
        xf = np.linspace(-2, 0, 2000)
        assert np.min(xf * np.asarray(sigmoid(xf))) < 0

    def test_relu_is_hard_gate(self):
        x = np.linspace(-10, 10, 2000)
        np.testing.assert_allclose(np.maximum(0, x), x * (x > 0), atol=1e-15)

    def test_swish_beta_converges_to_relu(self):
        x = np.linspace(-10, 10, 2000)
        mask = np.abs(x) > 0.5
        relu = np.maximum(0, x)
        for beta in (10, 50, 100):
            sb = x * np.asarray(sigmoid(beta * x))
            assert np.max(np.abs(sb[mask] - relu[mask])) < 1.0 / beta + 0.01


class TestGeneralizedSwishLimits:
    """Theorem 6.7.6: x sigma(beta x) -> x/2 (beta->0), Swish (beta=1),
    ReLU (beta->inf); monotone in beta for x > 0 (ref :1369-1421)."""

    def test_beta_zero_limit(self):
        x = np.linspace(-5, 5, 500)
        for beta in (0.001, 0.01, 0.05):
            tol = beta * np.max(x ** 2) / 4 + 1e-10
            np.testing.assert_allclose(x * np.asarray(sigmoid(beta * x)),
                                       x / 2, atol=tol)

    def test_beta_inf_limit(self):
        x = np.linspace(-5, 5, 2000)
        mask = np.abs(x) > 0.5
        for beta in (20, 100, 500):
            np.testing.assert_allclose(
                (x * np.asarray(sigmoid(beta * x)))[mask],
                np.maximum(0, x)[mask], atol=2.0 / beta + 0.01)

    def test_monotone_in_beta_for_positive_x(self):
        x = 2.0
        vals = [x * float(sigmoid(b * x))
                for b in (0.01, 0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 50.0)]
        assert np.all(np.diff(vals) >= -1e-10)

    def test_api_gating_matches_formulas(self):
        """apply_gating implements exactly these gates in logit space
        (GELU via the 1.702 sigmoid approximation, fusion.py:163)."""
        x = np.linspace(-4, 4, 200)
        np.testing.assert_allclose(np.asarray(apply_gating(x, "relu")),
                                   np.maximum(0, x), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(apply_gating(x, "swish", 2.0)),
            x * np.asarray(sigmoid(2.0 * x)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(apply_gating(x, "gelu")),
            x * np.asarray(sigmoid(1.702 * x)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(apply_gating(x, "softplus", 2.0)),
            np.log1p(np.exp(2.0 * x)) / 2.0, atol=1e-6)


class TestGELUFromGaussianRelevance:
    """Theorem 6.8.1/6.8.2: GELU(x) = x Phi(x); Phi(x) ~ sigma(1.702 x)
    makes GELU ~ Swish_1.702 (ref :1424-1494)."""

    def test_definition(self):
        x = np.linspace(-5, 5, 2000)
        expected = x * 0.5 * (1 + np.vectorize(math.erf)(x / np.sqrt(2)))
        np.testing.assert_allclose(x * gauss_cdf(x), expected, atol=1e-14)

    def test_asymptotics(self):
        xp = np.linspace(5, 20, 100)
        np.testing.assert_allclose(xp * gauss_cdf(xp), xp, atol=0.01)
        xn = np.linspace(-20, -5, 100)
        np.testing.assert_allclose(xn * gauss_cdf(xn), 0.0, atol=1e-4)

    def test_cdf_sigmoid_approximation(self):
        x = np.linspace(-6, 6, 2000)
        err = np.abs(gauss_cdf(x) - np.asarray(sigmoid(1.702 * x)))
        assert np.max(err) < 0.02

    def test_gelu_approx_swish_1702(self):
        x = np.linspace(-6, 6, 2000)
        gelu = x * gauss_cdf(x)
        swish = x * np.asarray(sigmoid(1.702 * x))
        assert np.max(np.abs(gelu - swish)) < 0.11
        # shape preserved: same sign, single negative dip
        assert np.sign(gelu[x > 1]).min() == 1
        assert np.sign(swish[x > 1]).min() == 1


class TestSoftGatedActivationHierarchy:
    """Proposition 6.8.3: for 0 < x < 6, x/2 < swish < gelu < relu, from
    the gate ordering 0.5 < sigma(x) < Phi(x) < 1 (ref :1497-1545)."""

    def test_hierarchy(self):
        x = np.linspace(0.01, 6, 2000)
        swish = x * np.asarray(sigmoid(x))
        gelu = x * gauss_cdf(x)
        assert np.all(x / 2 < swish)
        assert np.all(swish < gelu)
        assert np.all(gelu < x)

    def test_gate_ordering(self):
        x = np.linspace(0.01, 6, 2000)
        sig = np.asarray(sigmoid(x))
        phi = gauss_cdf(x)
        assert np.all(sig > 0.5) and np.all(sig < phi) and np.all(phi < 1)

    def test_collapse_at_zero(self):
        assert float(apply_gating(np.array(0.0), "relu")) == 0.0
        assert float(apply_gating(np.array(0.0), "swish")) == 0.0
        assert float(apply_gating(np.array(0.0), "gelu")) == 0.0


class TestAttentionAsLogOP:
    """Theorem 8.3: attention = logarithmic opinion pooling; Log-OP ==
    weighted normalized PoE, with n^alpha confidence scaling
    (ref :1814-1897)."""

    def test_log_op_formula_matches_weighted_conjunction(self):
        rng = np.random.default_rng(42)
        for _ in range(100):
            n = int(rng.integers(2, 7))
            probs = rng.uniform(0.01, 0.99, n)
            w = rng.uniform(0.1, 3.0, n)
            w = w / w.sum()
            manual = float(sigmoid(np.sum(w * np.asarray(logit(probs)))))
            got = float(api_conj(probs, alpha=0.0, weights=w))
            assert got == pytest.approx(manual, abs=1e-9)

    def test_weighted_poe_equivalence(self):
        rng = np.random.default_rng(43)
        for _ in range(100):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.05, 0.95, n)
            w = rng.uniform(0.1, 3.0, n)
            w = w / w.sum()
            log_op = float(sigmoid(np.sum(w * np.asarray(logit(probs)))))
            pp = np.prod(probs ** w)
            pq = np.prod((1 - probs) ** w)
            assert log_op == pytest.approx(pp / (pp + pq), abs=1e-9)

    def test_confidence_scaling(self):
        rng = np.random.default_rng(44)
        for _ in range(50):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.1, 0.9, n)
            w = rng.uniform(0.1, 3.0, n)
            w = w / w.sum()
            alpha = float(rng.uniform(0.0, 1.0))
            manual = float(sigmoid(
                n ** alpha * np.sum(w * np.asarray(logit(probs)))))
            got = float(api_conj(probs, alpha=alpha, weights=w))
            assert got == pytest.approx(manual, abs=1e-9)


class TestRecursiveBayesianInference:
    """Theorem 9.1.1: stacked inference units stay valid probabilities;
    depth of agreement compounds confidence, depth of irrelevance does
    not invert (ref :1900-1972)."""

    def test_multi_layer_validity(self):
        rng = np.random.default_rng(42)
        for _ in range(30):
            n = int(rng.integers(2, 5))
            layers = int(rng.integers(2, 8))
            alpha = float(rng.uniform(0.0, 0.5))
            signals = rng.uniform(0.01, 0.99, n)
            for _layer in range(layers):
                r = conj(signals, alpha=alpha)
                assert 0 < r < 1
                signals = np.concatenate(
                    [rng.uniform(0.01, 0.99, n - 1), [r]])

    def test_depth_compounds_agreement(self):
        current = 0.8
        for _ in range(20):
            current = conj([current, 0.8], alpha=0.5)
        assert current > 0.95

    def test_depth_preserves_irrelevance(self):
        current = 0.3
        for _ in range(10):
            current = conj([current, 0.3], alpha=0.5)
        assert current < 0.5


class TestNaiveBayesInitialization:
    """Remark 5.3.2 / Theorem 5.3.1: uniform 1/n init is the Naive
    Bayes prior; equal-quality signals keep ~uniform weights after
    training (ref :2585-2719)."""

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
    def test_initial_weights_uniform(self, n):
        learner = LearnableLogOddsWeights(n_signals=n)
        np.testing.assert_allclose(learner.weights, np.full(n, 1.0 / n),
                                   atol=1e-12)

    def test_uniform_init_matches_unweighted(self):
        rng = np.random.default_rng(42)
        for n in (2, 3, 5):
            learner = LearnableLogOddsWeights(n_signals=n, alpha=0.0)
            probs = rng.uniform(0.1, 0.9, n)
            assert float(learner(probs)) == pytest.approx(
                conj(probs, alpha=0.0), abs=1e-9)

    def test_equal_quality_signals_stay_uniform(self):
        rng = np.random.default_rng(42)
        n, m = 3, 500
        labels = rng.integers(0, 2, m).astype(float)
        probs = np.column_stack([
            np.clip(np.where(labels == 1, 0.8, 0.2)
                    + rng.uniform(-0.1, 0.1, m), 0.05, 0.95)
            for _ in range(n)
        ])
        learner = LearnableLogOddsWeights(n_signals=n, alpha=0.0)
        learner.fit(probs, labels, learning_rate=0.05, max_iterations=1000)
        np.testing.assert_allclose(learner.weights, np.full(n, 1.0 / n),
                                   atol=0.1)

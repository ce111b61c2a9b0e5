"""Paper 1/2 fusion-algebra theorems, part 2 (completes the reference's
spec coverage, ref tests/test_paper_theorems.py:262-1020): paper value
tables, scale neutrality, sign preservation, irrelevance non-inversion,
disagreement moderation, logistic-regression equivalence, agreement
amplification, strict conjunction/disjunction bounds, LogOP/PoE
equivalence, heterogeneous combination, weighted-alpha composition,
monotone shrinkage, information loss, sqrt(n) scaling comparisons,
spread property, and the geometric-mean residual.

Style: invariants are checked over vectorized random draws (one device
batch instead of the reference's Python loops)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    BayesianProbabilityTransform,
    cosine_to_probability,
    log_odds_conjunction,
    prob_and,
    prob_or,
)
from bayesian_bm25_tpu.models.probability import logit, sigmoid


def conj(probs, **kw):
    return float(log_odds_conjunction(np.asarray(probs, float), **kw))


class TestPaperValuesSection111:
    """Paper 1 §11.1: example BM25 scores produce valid, order-preserving
    probabilities (ref :262-283)."""

    def test_ordering(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        scores = np.array([1.0464478, 0.56150854, 1.1230172])
        tf = np.array([5.0, 3.0, 7.0])
        ratio = np.array([0.5, 0.5, 0.5])
        probs = np.asarray(t.score_to_probability(scores, tf, ratio))
        assert np.all((probs > 0) & (probs < 1))
        assert probs[2] > probs[1]
        assert probs[0] > probs[1]


class TestScaleNeutrality:
    """Theorem 4.1.2: identical signals pass through at alpha=0; at
    alpha=0.5 the common logit scales by sqrt(n) (ref :290-318)."""

    @pytest.mark.parametrize("p", [0.1, 0.3, 0.5, 0.7, 0.9])
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 10])
    def test_alpha_zero_identity(self, p, n):
        assert conj(np.full(n, p), alpha=0.0) == pytest.approx(p, abs=1e-8)

    @pytest.mark.parametrize("p", [0.6, 0.7, 0.8, 0.9])
    @pytest.mark.parametrize("n", [2, 3, 5])
    def test_alpha_half_formula(self, p, n):
        expected = float(sigmoid(logit(p) * np.sqrt(n)))
        assert conj(np.full(n, p), alpha=0.5) == pytest.approx(expected,
                                                              abs=1e-9)


class TestSignPreservation:
    """Theorem 4.2.2: n^alpha scaling preserves the sign of the mean
    logit (ref :321-352)."""

    def test_positive_mean_logit_above_half(self):
        rng = np.random.default_rng(42)
        for n in (2, 3, 5):
            probs = rng.uniform(0.55, 0.99, size=(200, n))
            out = np.array([conj(row) for row in probs])
            assert np.all(out > 0.5)

    def test_negative_mean_logit_below_half(self):
        rng = np.random.default_rng(43)
        for n in (2, 3, 5):
            probs = rng.uniform(0.01, 0.45, size=(200, n))
            out = np.array([conj(row) for row in probs])
            assert np.all(out < 0.5)


class TestIrrelevanceNonInversion:
    """Corollary 4.2.3 / Theorem 4.5.1(iv): unanimous irrelevance
    (relevance) survives any alpha (ref :355-386)."""

    @pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0, 2.0])
    def test_all_irrelevant_stays_irrelevant(self, alpha):
        rng = np.random.default_rng(7)
        for n in (2, 4, 9):
            probs = rng.uniform(0.01, 0.49, size=(100, n))
            out = np.array([conj(row, alpha=alpha) for row in probs])
            assert np.all(out < 0.5)

    @pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0, 2.0])
    def test_all_relevant_stays_relevant(self, alpha):
        rng = np.random.default_rng(8)
        for n in (2, 4, 9):
            probs = rng.uniform(0.51, 0.99, size=(100, n))
            out = np.array([conj(row, alpha=alpha) for row in probs])
            assert np.all(out > 0.5)


class TestPaper2NumericalTable:
    """Paper 2 §4.5 table: product rule vs conjunction for n=2,
    alpha=0.5 (ref :389-431)."""

    @pytest.mark.parametrize("p1,p2,expected_and,expected_conj", [
        (0.9, 0.9, 0.81, 0.96),
        (0.7, 0.7, 0.49, 0.77),
        (0.7, 0.3, 0.21, 0.50),
        (0.3, 0.3, 0.09, 0.23),
    ])
    def test_table_row(self, p1, p2, expected_and, expected_conj):
        pair = np.array([p1, p2])
        assert float(prob_and(pair)) == pytest.approx(expected_and, abs=0.01)
        assert conj(pair) == pytest.approx(expected_conj, abs=0.01)

    def test_hand_traced_09_09(self):
        expected = float(sigmoid(logit(0.9) * np.sqrt(2)))
        assert conj([0.9, 0.9]) == pytest.approx(expected, abs=1e-9)

    def test_hand_traced_07_03_exact_neutrality(self):
        # logit(0.7) + logit(0.3) = 0 by sigmoid symmetry
        assert conj([0.7, 0.3]) == pytest.approx(0.5, abs=1e-9)


class TestDisagreementModeration:
    """Theorem 4.5.1(ii): symmetric disagreement (p, 1-p) lands exactly
    at 0.5 (ref :433-447)."""

    def test_symmetric_pairs(self):
        for p in np.linspace(0.01, 0.99, 50):
            assert conj([p, 1.0 - p]) == pytest.approx(0.5, abs=1e-7)


class TestLogisticRegressionEquivalence:
    """Theorem 5.2.1a: conjunction of sigmoid-calibrated signals IS
    logistic regression on the raw scores (ref :450-488)."""

    def test_two_paths_agree(self):
        rng = np.random.default_rng(42)
        for _ in range(30):
            n = int(rng.integers(2, 6))
            alphas = rng.uniform(0.5, 3.0, n)
            betas = rng.uniform(-1.0, 3.0, n)
            scores = rng.uniform(-2.0, 5.0, n)
            calibrated = np.asarray(sigmoid(alphas * (scores - betas)))
            got = conj(calibrated, alpha=0.5)
            pre = alphas * (scores - betas)
            want = float(sigmoid(np.mean(pre) * n ** 0.5))
            assert got == pytest.approx(want, abs=1e-9)


class TestAgreementAmplification:
    """Theorem 4.5.1(i): agreeing signals > 0.5 amplify beyond any
    input; amplification is monotone in n (ref :491-519)."""

    def test_exceeds_input(self):
        rng = np.random.default_rng(9)
        for _ in range(100):
            n = int(rng.integers(2, 6))
            p = float(rng.uniform(0.55, 0.95))
            assert conj(np.full(n, p), alpha=0.5) > p

    @pytest.mark.parametrize("p", [0.6, 0.7, 0.8, 0.9])
    def test_monotone_in_n(self, p):
        prev = p
        for n in range(2, 8):
            r = conj(np.full(n, p), alpha=0.5)
            assert r >= prev - 1e-10
            prev = r


class TestConjunctionVsProductRule:
    """For agreeing relevance signals the conjunction beats the product
    rule's shrinkage (ref :522-545)."""

    def test_beats_product(self):
        rng = np.random.default_rng(10)
        for _ in range(200):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.55, 0.99, n)
            assert conj(probs, alpha=0.5) > float(prob_and(probs))


class TestStrictBounds:
    """Theorem 5.1.2: 0 < prob_and < min(p); symmetric bound for
    prob_or (ref :548-591)."""

    def test_and_strictly_below_min(self):
        rng = np.random.default_rng(11)
        probs = rng.uniform(0.01, 0.99, size=(500, 4))
        out = np.asarray(prob_and(probs))
        assert np.all(out > 0)
        assert np.all(out < probs.min(axis=1))

    def test_or_strictly_above_max(self):
        rng = np.random.default_rng(12)
        probs = rng.uniform(0.01, 0.99, size=(500, 4))
        out = np.asarray(prob_or(probs))
        assert np.all(out < 1)
        assert np.all(out > probs.max(axis=1))


class TestLogOPEquivalence:
    """Theorem 4.1.2a: the log-odds mean equals the normalized product
    of experts (ref :594-621)."""

    def test_normalized_poe(self):
        rng = np.random.default_rng(42)
        for _ in range(200):
            n = int(rng.integers(2, 7))
            probs = rng.uniform(0.01, 0.99, n)
            log_odds = float(sigmoid(np.mean(np.asarray(logit(probs)))))
            gp = np.prod(probs ** (1.0 / n))
            gq = np.prod((1.0 - probs) ** (1.0 / n))
            poe = gp / (gp + gq)
            assert log_odds == pytest.approx(poe, abs=1e-9)


class TestHeterogeneousSignals:
    """Remark 5.2.3: sigmoid-calibrated BM25 + linear-calibrated cosine
    combine into a valid monotone probability; the logit is a genuine
    nonlinearity on the linear calibration (ref :624-677)."""

    def test_bm25_plus_cosine_monotone(self):
        bm25 = np.array([0.5, 1.0, 2.0, 3.0, 5.0])
        cos = np.array([0.2, 0.4, 0.6, 0.8, 0.95])
        bp = np.asarray(sigmoid(bm25 - 1.0))
        cp = np.asarray(cosine_to_probability(cos))
        out = np.array([conj([bp[i], cp[i]]) for i in range(5)])
        assert np.all((out > 0) & (out < 1))
        assert np.all(np.diff(out) > 0)

    def test_logit_of_linear_calibration_is_nonlinear(self):
        s = np.linspace(-0.9, 0.9, 100)
        y = np.asarray(logit(cosine_to_probability(s)))
        assert not np.allclose(np.diff(y, n=2), 0.0, atol=1e-8)


class TestSingleSignalIdentity:
    """Proposition 4.3.2: n=1 passes through for every alpha
    (n^alpha = 1) (ref :679-697)."""

    @pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 1.0, 3.0])
    def test_identity(self, alpha):
        for p in [0.05, 0.3, 0.5, 0.8, 0.99]:
            assert conj([p], alpha=alpha) == pytest.approx(p, abs=1e-8)


class TestWeightedAlphaComposition:
    """Theorem 5.3.2: weighted fusion with confidence scaling =
    sigmoid(n^alpha * sum(w_i logit p_i)); uniform weights with the
    same alpha reproduce the unweighted mean form (ref :699-744)."""

    def test_weighted_formula(self):
        rng = np.random.default_rng(13)
        for _ in range(50):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.05, 0.95, n)
            w = rng.uniform(0.1, 1.0, n)
            w = w / w.sum()
            got = conj(probs, weights=w, alpha=0.5)
            want = float(sigmoid(n ** 0.5 * np.sum(
                w * np.asarray(logit(probs)))))
            assert got == pytest.approx(want, abs=1e-9)

    def test_uniform_weights_match_unweighted(self):
        rng = np.random.default_rng(14)
        for _ in range(50):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.05, 0.95, n)
            w = np.full(n, 1.0 / n)
            assert conj(probs, weights=w, alpha=0.5) == pytest.approx(
                conj(probs, alpha=0.5), abs=1e-9)


class TestMonotoneShrinkage:
    """prob_and shrinks monotonically as signals accumulate and
    approaches zero (ref :747-777)."""

    def test_decreasing_in_n(self):
        rng = np.random.default_rng(15)
        probs = rng.uniform(0.2, 0.95, 10)
        vals = [float(prob_and(probs[: n])) for n in range(1, 11)]
        assert np.all(np.diff(vals) < 0)

    def test_approaches_zero(self):
        assert float(prob_and(np.full(200, 0.9))) < 1e-8


class TestInformationLoss:
    """Proposition 3.4.1: prob_and depends only on the product of its
    inputs (losing the agreement structure); the conjunction does not
    (ref :779-823)."""

    def test_same_product_same_and(self):
        a = float(prob_and(np.array([0.9, 0.1])))
        b = float(prob_and(np.array([0.3, 0.3])))
        assert a == pytest.approx(b, abs=1e-10)

    def test_conjunction_distinguishes_agreement(self):
        disagreement = conj([0.9, 0.1])
        agreement = conj([0.3, 0.3])
        assert abs(disagreement - agreement) > 0.01
        assert disagreement == pytest.approx(0.5, abs=0.01)

    def test_randomized_product_invariance(self):
        rng = np.random.default_rng(42)
        for _ in range(200):
            target = float(rng.uniform(0.01, 0.99))
            a = float(rng.uniform(max(target, 0.01), 0.99))
            b = float(rng.uniform(max(target, 0.01), 0.99))
            ra = float(prob_and(np.array([a, target / a])))
            rb = float(prob_and(np.array([b, target / b])))
            assert ra == pytest.approx(rb, abs=1e-7)


class TestSqrtNScalingComparisons:
    """Theorem 4.4.1 / Proposition 4.4.2: alpha=1 amplifies beyond
    alpha=0.5 beyond alpha=0; effective logit doubles over 4x the
    signals (ref :826-890)."""

    @pytest.mark.parametrize("n", [2, 3, 5, 10])
    def test_scaling_order(self, n):
        probs = np.full(n, 0.8)
        none = conj(probs, alpha=0.0)
        root = conj(probs, alpha=0.5)
        linear = conj(probs, alpha=1.0)
        assert linear > root > none

    def test_growth_rate_sqrt2(self):
        base = float(logit(0.75))
        for n in (2, 4, 8):
            ratio = (base * np.sqrt(2 * n)) / (base * np.sqrt(n))
            assert ratio == pytest.approx(np.sqrt(2), abs=1e-10)


class TestSpreadProperty:
    """Theorem 4.5.1(iii): contradiction moderates confidence toward
    0.5; at alpha=0 the result depends only on the mean logit
    (ref :892-953)."""

    def test_contradiction_reduces_confidence(self):
        rng = np.random.default_rng(16)
        for _ in range(100):
            p_high = float(rng.uniform(0.7, 0.95))
            p_low = float(rng.uniform(0.05, 0.3))
            agree = conj([p_high, p_high], alpha=0.0)
            mixed = conj([p_high, p_high, p_low], alpha=0.0)
            assert abs(mixed - 0.5) < abs(agree - 0.5)

    @pytest.mark.parametrize("offset", [0.1, 0.2, 0.3, 0.4])
    def test_symmetric_spread_neutral(self, offset):
        assert conj([0.5 + offset, 0.5 - offset], alpha=0.0) == (
            pytest.approx(0.5, abs=1e-7))

    def test_alpha_zero_spread_invariant(self):
        mean_logit = float(logit(0.75))
        expected = float(sigmoid(mean_logit))
        for spread in (0.0, 0.5, 1.0, 1.5):
            p1 = float(sigmoid(mean_logit + spread))
            p2 = float(sigmoid(mean_logit - spread))
            assert conj([p1, p2], alpha=0.0) == pytest.approx(expected,
                                                              abs=1e-7)


class TestGeometricMeanResidual:
    """Remark 4.1.3: the probability-space geometric mean differs from
    the log-odds mean except for identical inputs, and underestimates
    consensus for agreeing high signals (ref :956-1019)."""

    def test_differs_for_heterogeneous(self):
        rng = np.random.default_rng(42)
        differ = 0
        trials = 300
        for _ in range(trials):
            n = int(rng.integers(2, 6))
            probs = rng.uniform(0.1, 0.9, n)
            geo = np.prod(probs) ** (1.0 / n)
            lom = float(sigmoid(np.mean(np.asarray(logit(probs)))))
            if abs(geo - lom) > 1e-6:
                differ += 1
        assert differ > 0.9 * trials

    def test_identical_no_residual(self):
        for p in (0.1, 0.5, 0.9):
            for n in (2, 5, 10):
                probs = np.full(n, p)
                geo = np.prod(probs) ** (1.0 / n)
                lom = float(sigmoid(np.mean(np.asarray(logit(probs)))))
                assert geo == pytest.approx(p, abs=1e-9)
                assert lom == pytest.approx(p, abs=1e-7)

    def test_geo_underestimates_consensus(self):
        rng = np.random.default_rng(17)
        for _ in range(100):
            n = int(rng.integers(2, 6))
            probs = np.sort(rng.uniform(0.6, 0.95, n))
            if np.allclose(probs, probs[0]):
                continue
            geo = np.prod(probs) ** (1.0 / n)
            lom = float(sigmoid(np.mean(np.asarray(logit(probs)))))
            assert geo < lom

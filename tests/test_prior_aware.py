"""Training-mode semantics: C1 (balanced), C2 (prior-aware), C3 (prior-free).

Mirrors the reference suite (tests/test_prior_aware.py): mode validation,
inference semantics per mode, mode inheritance between fit() and update(),
and convergence of all modes on the same data.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianProbabilityTransform


def make_data(rng, n=1500, alpha=1.8, beta=1.0):
    scores = rng.normal(1.0, 2.0, n)
    p = 1 / (1 + np.exp(-alpha * (scores - beta)))
    labels = (rng.uniform(size=n) < p).astype(float)
    tfs = rng.integers(0, 12, n).astype(float)
    dlrs = rng.uniform(0.3, 1.8, n)
    return scores, labels, tfs, dlrs


class TestModeValidation:
    def test_fit_rejects_unknown_mode(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="c4")

    def test_prior_aware_requires_features_fit(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="prior_aware")
        with pytest.raises(ValueError):
            t.fit(np.ones(4), np.ones(4), mode="prior_aware", tfs=np.ones(4))

    def test_prior_aware_requires_features_update(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.update(1.0, 1.0, mode="prior_aware")

    def test_update_rejects_unknown_mode(self):
        t = BayesianProbabilityTransform()
        with pytest.raises(ValueError):
            t.update(1.0, 1.0, mode="bogus")


class TestInferenceSemantics:
    def test_default_balanced_uses_composite_prior(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        s, tf, dlr = 2.0, 5.0, 0.5
        expected = t.posterior(t.likelihood(s), t.composite_prior(tf, dlr))
        assert t.score_to_probability(s, tf, dlr) == pytest.approx(expected)

    def test_prior_free_ignores_features(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        t._training_mode = "prior_free"
        a = t.score_to_probability(2.0, 0.0, 0.0)
        b = t.score_to_probability(2.0, 10.0, 0.5)
        assert a == pytest.approx(b)
        assert a == pytest.approx(float(np.asarray(t.likelihood(2.0))))

    def test_prior_free_keeps_base_rate(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0, base_rate=0.01)
        t._training_mode = "prior_free"
        # posterior = sigmoid(logit(L) + logit(br)) since prior=0.5
        L = float(np.asarray(t.likelihood(2.0)))
        expected = t.posterior(L, 0.5, base_rate=0.01)
        assert t.score_to_probability(2.0, 3.0, 0.8) == pytest.approx(expected)

    def test_prior_aware_inference_same_as_balanced(self):
        """C2 changes TRAINING, not the inference formula."""
        rng = np.random.default_rng(0)
        scores, labels, tfs, dlrs = make_data(rng, 400)
        t2 = BayesianProbabilityTransform()
        t2.fit(scores, labels, mode="prior_aware", tfs=tfs,
               doc_len_ratios=dlrs, max_iterations=100)
        manual = t2.posterior(
            t2.likelihood(3.0), t2.composite_prior(4.0, 0.9))
        assert t2.score_to_probability(3.0, 4.0, 0.9) == pytest.approx(manual)


class TestModeInheritance:
    def test_update_inherits_fit_mode(self):
        rng = np.random.default_rng(1)
        scores, labels, tfs, dlrs = make_data(rng, 300)
        t = BayesianProbabilityTransform()
        t.fit(scores, labels, mode="prior_free", max_iterations=50)
        t.update(1.0, 1.0)  # no mode arg: inherits prior_free
        assert t._training_mode == "prior_free"

    def test_update_mode_override_sticks(self):
        t = BayesianProbabilityTransform()
        t.update(1.0, 1.0, mode="prior_free")
        assert t._training_mode == "prior_free"
        t.update(1.0, 1.0)  # still prior_free
        assert t._training_mode == "prior_free"

    def test_prior_aware_update_inherits(self):
        rng = np.random.default_rng(2)
        scores, labels, tfs, dlrs = make_data(rng, 300)
        t = BayesianProbabilityTransform()
        t.fit(scores, labels, mode="prior_aware", tfs=tfs,
              doc_len_ratios=dlrs, max_iterations=50)
        # inherited prior_aware update without features must raise
        with pytest.raises(ValueError):
            t.update(1.0, 1.0)
        t.update(1.0, 1.0, tf=3.0, doc_len_ratio=0.8)  # with features: fine
        assert t._n_updates == 1


class TestConvergence:
    @pytest.mark.parametrize("mode", ["balanced", "prior_free"])
    def test_likelihood_modes_recover_parameters(self, mode):
        rng = np.random.default_rng(3)
        scores, labels, _, _ = make_data(rng, 4000, alpha=1.8, beta=1.0)
        t = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
        t.fit(scores, labels, mode=mode, learning_rate=0.1,
              max_iterations=5000)
        assert t.alpha == pytest.approx(1.8, abs=0.4)
        assert t.beta == pytest.approx(1.0, abs=0.4)

    def test_prior_aware_reduces_posterior_bce(self):
        rng = np.random.default_rng(4)
        scores, labels, tfs, dlrs = make_data(rng, 2000)

        def posterior_bce(t):
            p = np.clip(np.asarray(
                t.posterior(t.likelihood(scores),
                            t.composite_prior(tfs, dlrs))), 1e-12, 1 - 1e-12)
            return -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))

        t = BayesianProbabilityTransform(alpha=0.4, beta=-1.0)
        before = posterior_bce(t)
        t.fit(scores, labels, mode="prior_aware", tfs=tfs,
              doc_len_ratios=dlrs, learning_rate=0.1, max_iterations=3000)
        assert posterior_bce(t) < before

    def test_c2_differs_from_c1(self):
        """The chain-rule gradient trains different parameters than C1."""
        rng = np.random.default_rng(5)
        scores, labels, tfs, dlrs = make_data(rng, 2000)
        c1 = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
        c1.fit(scores, labels, mode="balanced", learning_rate=0.1,
               max_iterations=1000)
        c2 = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
        c2.fit(scores, labels, mode="prior_aware", tfs=tfs,
               doc_len_ratios=dlrs, learning_rate=0.1, max_iterations=1000)
        assert (abs(c1.alpha - c2.alpha) > 1e-6 or
                abs(c1.beta - c2.beta) > 1e-6)

    def test_online_prior_aware_converges_same_direction(self):
        rng = np.random.default_rng(6)
        scores, labels, tfs, dlrs = make_data(rng, 2000, alpha=2.0, beta=1.5)
        t = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
        for i in range(0, 2000, 8):
            sel = slice(i, i + 8)
            t.update(scores[sel], labels[sel], mode="prior_aware",
                     tf=tfs[sel], doc_len_ratio=dlrs[sel],
                     learning_rate=0.1)
        assert t.alpha > 0.5  # moved toward the true steeper slope
        assert t.beta > 0.0

"""Behavioral parity against the ACTUAL reference implementation.

When the upstream source tree is present at /root/reference (as in the
build/judge environment), its pure-numpy modules are loaded by file path
and used as a live oracle: our kernels and the reference run the SAME
random inputs and must agree to float32-rounding tolerance. This is a
strictly stronger guarantee than the re-derived formula tests — any
semantic drift (estimator protocol, gradient formula, routing fork,
normalization group, Polyak state) shows up as a numeric mismatch here.

The reference scorer module hard-requires bm25s at import; a stub module
satisfies the import so its pure-numpy base-rate estimators
(scorer.py:366-467) can be compared. The bm25s *scoring* path itself is
covered separately by tests/test_bm25_golden.py fixtures.

Tolerances: our kernels compute in f32 on device (f64 under the test
conftest, but jitted constants stay f32), so probability outputs match
to ~1e-6 absolute and iterative fits to ~1e-5.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "bayesian_bm25")),
    reason="reference tree not available")


def _load_ref():
    if "bayesian_bm25.scorer" in sys.modules:
        return {
            n: sys.modules[f"bayesian_bm25.{n}"]
            for n in ("probability", "fusion", "vector_probability",
                      "calibration", "metrics", "scorer")
        }
    pkg = types.ModuleType("bayesian_bm25")
    pkg.__path__ = [os.path.join(REF, "bayesian_bm25")]
    sys.modules.setdefault("bayesian_bm25", pkg)
    if "bm25s" not in sys.modules:  # satisfy the scorer module's import
        stub = types.ModuleType("bm25s")
        stub.BM25 = object
        stub.tokenize = None
        sys.modules["bm25s"] = stub
    mods = {}
    for name in ("probability", "fusion", "vector_probability",
                 "calibration", "metrics", "scorer"):
        spec = importlib.util.spec_from_file_location(
            f"bayesian_bm25.{name}",
            os.path.join(REF, "bayesian_bm25", f"{name}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"bayesian_bm25.{name}"] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    scores = rng.gamma(2.0, 2.0, 300)
    tfs = rng.integers(0, 12, 300).astype(float)
    dlrs = rng.uniform(0.3, 2.0, 300)
    labels = (rng.uniform(size=300)
              < 1.0 / (1.0 + np.exp(-1.2 * (scores - 4.0)))).astype(float)
    return scores, tfs, dlrs, labels


ATOL = 3e-6


class TestTransformOracle:
    def test_score_to_probability(self, ref, data):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        s, tf, dlr, _ = data
        for kw in (dict(alpha=1.0, beta=2.0),
                   dict(alpha=0.7, beta=3.0, base_rate=0.05),
                   dict(alpha=2.0, beta=0.5, base_rate=0.4)):
            a = ref["probability"].BayesianProbabilityTransform(
                **kw).score_to_probability(s, tf, dlr)
            b = np.asarray(BayesianProbabilityTransform(
                **kw).score_to_probability(s, tf, dlr))
            np.testing.assert_allclose(b, a, atol=ATOL)

    def test_components(self, ref, data):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        s, tf, dlr, _ = data
        ra = ref["probability"].BayesianProbabilityTransform(alpha=1.2,
                                                            beta=1.5)
        ob = BayesianProbabilityTransform(alpha=1.2, beta=1.5)
        np.testing.assert_allclose(np.asarray(ob.likelihood(s)),
                                   ra.likelihood(s), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ob.tf_prior(tf)),
                                   ra.tf_prior(tf), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ob.norm_prior(dlr)),
                                   ra.norm_prior(dlr), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ob.composite_prior(tf, dlr)),
                                   ra.composite_prior(tf, dlr), atol=ATOL)
        L = np.asarray(ob.likelihood(s))
        P = np.asarray(ob.composite_prior(tf, dlr))
        np.testing.assert_allclose(
            np.asarray(ob.posterior(L, P, base_rate=0.07)),
            ra.posterior(ra.likelihood(s), ra.composite_prior(tf, dlr),
                         base_rate=0.07), atol=ATOL)

    def test_wand_upper_bound(self, ref):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        ra = ref["probability"].BayesianProbabilityTransform(alpha=1.0,
                                                            beta=2.0)
        ob = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        for ub in (0.5, 3.0, 8.0):
            assert float(np.asarray(ob.wand_upper_bound(ub))) == \
                pytest.approx(ra.wand_upper_bound(ub), abs=ATOL)
        assert float(np.asarray(ob.wand_upper_bound(3.0, p_max=0.7))) == \
            pytest.approx(ra.wand_upper_bound(3.0, p_max=0.7), abs=ATOL)

    @pytest.mark.parametrize("mode", ["balanced", "prior_aware",
                                      "prior_free"])
    def test_fit_modes(self, ref, data, mode):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        s, tf, dlr, y = data
        kw = dict(learning_rate=0.05, max_iterations=200)
        extra = {} if mode == "balanced" else dict(
            tfs=tf, doc_len_ratios=dlr)
        ra = ref["probability"].BayesianProbabilityTransform(alpha=0.5,
                                                            beta=1.0)
        ra.fit(s, y, mode=mode, **extra, **kw)
        ob = BayesianProbabilityTransform(alpha=0.5, beta=1.0)
        ob.fit(s, y, mode=mode, **extra, **kw)
        assert ob.alpha == pytest.approx(ra.alpha, rel=1e-4, abs=1e-5)
        assert ob.beta == pytest.approx(ra.beta, rel=1e-4, abs=1e-5)

    def test_update_sequence_with_averaging(self, ref, data):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        s, _, _, y = data
        ra = ref["probability"].BayesianProbabilityTransform(alpha=1.0,
                                                            beta=2.0)
        ob = BayesianProbabilityTransform(alpha=1.0, beta=2.0)
        for i in range(80):
            ra.update(float(s[i]), float(y[i]), learning_rate=0.02)
            ob.update(float(s[i]), float(y[i]), learning_rate=0.02)
        assert ob.alpha == pytest.approx(ra.alpha, rel=1e-5)
        assert ob.beta == pytest.approx(ra.beta, rel=1e-5)
        assert ob.averaged_alpha == pytest.approx(ra.averaged_alpha,
                                                  rel=1e-5)
        assert ob.averaged_beta == pytest.approx(ra.averaged_beta, rel=1e-5)

    def test_temporal_fit_and_update(self, ref, data):
        from bayesian_bm25_tpu import TemporalBayesianTransform

        s, _, _, y = data
        ts = np.arange(len(s), dtype=float)
        ra = ref["probability"].TemporalBayesianTransform(
            alpha=0.5, beta=1.0, decay_half_life=100.0)
        ra.fit(s, y, timestamps=ts, learning_rate=0.05, max_iterations=150)
        ob = TemporalBayesianTransform(alpha=0.5, beta=1.0,
                                       decay_half_life=100.0)
        ob.fit(s, y, timestamps=ts, learning_rate=0.05, max_iterations=150)
        assert ob.alpha == pytest.approx(ra.alpha, rel=1e-4, abs=1e-5)
        assert ob.beta == pytest.approx(ra.beta, rel=1e-4, abs=1e-5)
        for i in range(40):
            ra.update(float(s[i]), float(y[i]))
            ob.update(float(s[i]), float(y[i]))
        assert ob.alpha == pytest.approx(ra.alpha, rel=1e-5)
        assert ob.averaged_alpha == pytest.approx(ra.averaged_alpha,
                                                  rel=1e-5)


class TestFusionOracle:
    def test_boolean_ops(self, ref):
        import bayesian_bm25_tpu as bb

        rng = np.random.default_rng(2)
        p = rng.uniform(0.02, 0.98, (40, 4))
        np.testing.assert_allclose(np.asarray(bb.prob_and(p)),
                                   ref["fusion"].prob_and(p), atol=ATOL)
        np.testing.assert_allclose(np.asarray(bb.prob_or(p)),
                                   ref["fusion"].prob_or(p), atol=ATOL)
        np.testing.assert_allclose(np.asarray(bb.prob_not(p)),
                                   ref["fusion"].prob_not(p), atol=ATOL)
        cs = rng.uniform(-1, 1, 40)
        np.testing.assert_allclose(
            np.asarray(bb.cosine_to_probability(cs)),
            ref["fusion"].cosine_to_probability(cs), atol=ATOL)

    @pytest.mark.parametrize("kwargs", [
        {}, {"alpha": 0.0}, {"alpha": "auto"}, {"max_logit": 3.0},
        {"weights": [0.5, 0.3, 0.2]}, {"weights": [0.5, 0.3, 0.2],
                                       "alpha": 0.5},
        {"gating": "relu"}, {"gating": "gelu"},
        {"gating": "swish", "gating_beta": 2.0},
        {"gating": "softplus", "gating_beta": 1.5},
        {"weights": [0.2, 0.3, 0.5], "gating": "swish"},
    ])
    def test_log_odds_conjunction(self, ref, kwargs):
        import bayesian_bm25_tpu as bb

        rng = np.random.default_rng(3)
        p = rng.uniform(0.02, 0.98, (30, 3))
        kw = dict(kwargs)
        if "weights" in kw:
            kw["weights"] = np.asarray(kw["weights"])
        a = ref["fusion"].log_odds_conjunction(p, **kw)
        b = np.asarray(bb.log_odds_conjunction(p, **kw))
        np.testing.assert_allclose(b, a, atol=ATOL)

    def test_balanced_fusion(self, ref):
        import bayesian_bm25_tpu as bb

        rng = np.random.default_rng(4)
        sp = rng.uniform(0.05, 0.95, 50)
        dn = rng.uniform(-1, 1, 50)
        for w in (0.0, 0.3, 0.5, 1.0):
            a = ref["fusion"].balanced_log_odds_fusion(sp, dn, weight=w)
            b = np.asarray(bb.balanced_log_odds_fusion(sp, dn, weight=w))
            np.testing.assert_allclose(b, a, atol=ATOL)


class TestLearnersOracle:
    def _data(self):
        rng = np.random.default_rng(5)
        probs = rng.uniform(0.05, 0.95, (80, 3))
        labels = (0.6 * probs[:, 0] + 0.4 * rng.uniform(size=80)
                  > 0.5).astype(float)
        qf = rng.normal(size=(80, 4))
        return probs, labels, qf

    def test_learnable_full_lifecycle(self, ref):
        from bayesian_bm25_tpu import LearnableLogOddsWeights

        probs, labels, _ = self._data()
        ra = ref["fusion"].LearnableLogOddsWeights(3, base_rate=0.1)
        ob = LearnableLogOddsWeights(3, base_rate=0.1)
        np.testing.assert_allclose(np.asarray(ob(probs)), ra(probs),
                                   atol=ATOL)
        ra.fit(probs, labels, learning_rate=0.05, max_iterations=100)
        ob.fit(probs, labels, learning_rate=0.05, max_iterations=100)
        np.testing.assert_allclose(ob.weights, ra.weights, atol=1e-5)
        for i in range(40):
            ra.update(probs[i], labels[i])
            ob.update(probs[i], labels[i])
        np.testing.assert_allclose(ob.weights, ra.weights, atol=1e-5)
        np.testing.assert_allclose(ob.averaged_weights, ra.averaged_weights,
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ob(probs, use_averaged=True)),
            ra(probs, use_averaged=True), atol=ATOL)

    def test_attention_full_lifecycle(self, ref):
        from bayesian_bm25_tpu import AttentionLogOddsWeights

        probs, labels, qf = self._data()
        ra = ref["fusion"].AttentionLogOddsWeights(
            n_signals=3, n_query_features=4, seed=0, base_rate=0.05)
        ob = AttentionLogOddsWeights(n_signals=3, n_query_features=4,
                                     seed=0, base_rate=0.05)
        np.testing.assert_allclose(ob.weights_matrix, ra.weights_matrix,
                                   atol=0)  # identical seeded init
        np.testing.assert_allclose(np.asarray(ob(probs, qf)), ra(probs, qf),
                                   atol=ATOL)
        ra.fit(probs, labels, qf, learning_rate=0.05, max_iterations=80)
        ob.fit(probs, labels, qf, learning_rate=0.05, max_iterations=80)
        np.testing.assert_allclose(ob.weights_matrix, ra.weights_matrix,
                                   atol=1e-5)
        for i in range(30):
            ra.update(probs[i], labels[i], qf[i])
            ob.update(probs[i], labels[i], qf[i])
        np.testing.assert_allclose(ob.weights_matrix, ra.weights_matrix,
                                   atol=1e-5)

    def test_attention_normalize_with_query_groups(self, ref):
        from bayesian_bm25_tpu import AttentionLogOddsWeights

        probs, labels, qf = self._data()
        qids = np.repeat(np.arange(16), 5)
        ra = ref["fusion"].AttentionLogOddsWeights(3, 4, seed=1,
                                                   normalize=True)
        ob = AttentionLogOddsWeights(3, 4, seed=1, normalize=True)
        ra.fit(probs, labels, qf, query_ids=qids, learning_rate=0.05,
               max_iterations=60)
        ob.fit(probs, labels, qf, query_ids=qids, learning_rate=0.05,
               max_iterations=60)
        np.testing.assert_allclose(ob.weights_matrix, ra.weights_matrix,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ob(probs, qf)), ra(probs, qf),
                                   atol=ATOL)

    def test_attention_upper_bounds_and_prune(self, ref):
        from bayesian_bm25_tpu import AttentionLogOddsWeights

        probs, _, qf = self._data()
        ra = ref["fusion"].AttentionLogOddsWeights(3, 4, seed=2)
        ob = AttentionLogOddsWeights(3, 4, seed=2)
        ub = np.minimum(probs + 0.05, 0.999)
        np.testing.assert_allclose(
            np.asarray(ob.compute_upper_bounds(ub, qf)),
            ra.compute_upper_bounds(ub, qf), atol=ATOL)
        sa, fa = ra.prune(probs, qf, threshold=0.6, upper_bound_probs=ub)
        sb, fb = ob.prune(probs, qf, threshold=0.6, upper_bound_probs=ub)
        np.testing.assert_array_equal(sb, sa)
        np.testing.assert_allclose(fb, fa, atol=ATOL)

    def test_multihead_forward_fit_bounds(self, ref):
        from bayesian_bm25_tpu import MultiHeadAttentionLogOddsWeights

        probs, labels, qf = self._data()
        ra = ref["fusion"].MultiHeadAttentionLogOddsWeights(
            n_heads=3, n_signals=3, n_query_features=4)
        ob = MultiHeadAttentionLogOddsWeights(n_heads=3, n_signals=3,
                                              n_query_features=4)
        np.testing.assert_allclose(np.asarray(ob(probs, qf)), ra(probs, qf),
                                   atol=ATOL)
        ra.fit(probs, labels, qf, learning_rate=0.05, max_iterations=50)
        ob.fit(probs, labels, qf, learning_rate=0.05, max_iterations=50)
        np.testing.assert_allclose(np.asarray(ob(probs, qf)), ra(probs, qf),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ob.compute_upper_bounds(probs, qf)),
            ra.compute_upper_bounds(probs, qf), atol=1e-5)


class TestVectorOracle:
    def _dists(self):
        rng = np.random.default_rng(6)
        corpus_d = rng.normal(1.0, 0.25, 500)
        eval_d = np.concatenate([rng.normal(0.3, 0.05, 25),
                                 rng.normal(1.0, 0.2, 75)])
        return corpus_d, eval_d

    def test_fit_background_and_calibrate_methods(self, ref):
        from bayesian_bm25_tpu.models.vector_probability import (
            VectorProbabilityTransform,
        )

        corpus_d, eval_d = self._dists()
        ra = ref["vector_probability"].VectorProbabilityTransform \
            .fit_background(corpus_d, base_rate=0.02)
        ob = VectorProbabilityTransform.fit_background(corpus_d,
                                                       base_rate=0.02)
        assert ob.mu_G == pytest.approx(ra.mu_G, rel=1e-9)
        assert ob.sigma_G == pytest.approx(ra.sigma_G, rel=1e-9)
        for method in ("auto", "kde", "gmm"):
            a = ra.calibrate(eval_d, method=method)
            b = np.asarray(ob.calibrate(eval_d, method=method))
            np.testing.assert_allclose(b, a, atol=3e-5)

    def test_calibrate_with_sample_and_weights(self, ref):
        from bayesian_bm25_tpu.models.vector_probability import (
            VectorProbabilityTransform,
        )

        rng = np.random.default_rng(7)
        corpus_d, eval_d = self._dists()
        sample_d = np.concatenate([rng.normal(0.35, 0.06, 40),
                                   rng.normal(1.0, 0.2, 40)])
        weights = np.exp(-3.0 * sample_d)
        ra = ref["vector_probability"].VectorProbabilityTransform \
            .fit_background(corpus_d)
        ob = VectorProbabilityTransform.fit_background(corpus_d)
        a = ra.calibrate_with_sample(eval_d, sample_d, weights=weights)
        b = np.asarray(ob.calibrate_with_sample(eval_d, sample_d,
                                                weights=weights))
        np.testing.assert_allclose(b, a, atol=3e-5)

    def test_density_priors(self, ref):
        from bayesian_bm25_tpu.models.vector_probability import (
            ivf_density_prior,
            knn_density_prior,
        )

        pops = np.array([5.0, 50.0, 500.0])
        np.testing.assert_allclose(
            np.asarray(ivf_density_prior(pops, 50.0, gamma=2.0)),
            ref["vector_probability"].ivf_density_prior(pops, 50.0,
                                                        gamma=2.0),
            atol=ATOL)
        kd = np.array([0.2, 1.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(knn_density_prior(kd, 1.0, gamma=2.0)),
            ref["vector_probability"].knn_density_prior(kd, 1.0, gamma=2.0),
            atol=ATOL)


class TestCalibratorsOracle:
    def test_platt(self, ref):
        from bayesian_bm25_tpu import PlattCalibrator

        rng = np.random.default_rng(8)
        scores = rng.normal(0, 2, 150)
        labels = (rng.uniform(size=150)
                  < 1.0 / (1.0 + np.exp(-1.5 * scores))).astype(float)
        ra = ref["calibration"].PlattCalibrator()
        ra.fit(scores, labels, learning_rate=0.1, max_iterations=300)
        ob = PlattCalibrator()
        ob.fit(scores, labels, learning_rate=0.1, max_iterations=300)
        assert ob.a == pytest.approx(ra.a, rel=1e-4, abs=1e-5)
        assert ob.b == pytest.approx(ra.b, rel=1e-4, abs=1e-5)
        grid = np.linspace(-5, 5, 40)
        np.testing.assert_allclose(np.asarray(ob.calibrate(grid)),
                                   ra.calibrate(grid), atol=1e-5)

    def test_isotonic(self, ref):
        from bayesian_bm25_tpu import IsotonicCalibrator

        rng = np.random.default_rng(9)
        scores = rng.uniform(0, 1, 120)
        labels = (rng.uniform(size=120) < scores ** 2).astype(float)
        ra = ref["calibration"].IsotonicCalibrator()
        ra.fit(scores, labels)
        ob = IsotonicCalibrator()
        ob.fit(scores, labels)
        grid = np.linspace(-0.2, 1.2, 60)
        np.testing.assert_allclose(np.asarray(ob.calibrate(grid)),
                                   ra.calibrate(grid), atol=3e-6)


class TestMetricsOracle:
    def test_all_metrics(self, ref):
        import bayesian_bm25_tpu as bb

        rng = np.random.default_rng(10)
        p = rng.uniform(0, 1, 400)
        y = (rng.uniform(size=400) < p).astype(float)
        assert float(bb.expected_calibration_error(p, y)) == pytest.approx(
            ref["metrics"].expected_calibration_error(p, y), abs=1e-7)
        assert float(bb.brier_score(p, y)) == pytest.approx(
            ref["metrics"].brier_score(p, y), abs=1e-7)
        assert float(bb.log_loss(p, y)) == pytest.approx(
            ref["metrics"].log_loss(p, y), abs=1e-6)
        ra = ref["metrics"].reliability_diagram(p, y)
        rb = bb.reliability_diagram(p, y)
        for a, b in zip(ra, rb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-7)

    def test_calibration_report(self, ref):
        import bayesian_bm25_tpu as bb

        rng = np.random.default_rng(11)
        p = rng.uniform(0, 1, 200)
        y = (rng.uniform(size=200) < 0.8 * p).astype(float)
        ra = ref["metrics"].calibration_report(p, y)
        rb = bb.calibration_report(p, y)
        assert rb.ece == pytest.approx(ra.ece, abs=1e-7)
        assert rb.brier == pytest.approx(ra.brier, abs=1e-7)
        assert rb.logloss == pytest.approx(ra.logloss, abs=1e-6)
        assert rb.n_samples == ra.n_samples


class TestBaseRateEstimatorOracle:
    """The estimators are numpy-only statics on the reference scorer
    class (scorer.py:366-467); bm25s never enters them."""

    def _pools(self):
        rng = np.random.default_rng(12)
        return [rng.gamma(2.0, 1.5, 250) + 0.01 for _ in range(6)]

    def test_percentile(self, ref):
        from bayesian_bm25_tpu import BayesianBM25Scorer

        pools = self._pools()
        RS = ref["scorer"].BayesianBM25Scorer
        a = RS._base_rate_percentile(RS, pools, 250) \
            if not isinstance(RS.__dict__["_base_rate_percentile"],
                              staticmethod) \
            else RS._base_rate_percentile(pools, 250)
        b = BayesianBM25Scorer._base_rate_percentile(pools, 250)
        assert b == pytest.approx(a, rel=1e-9)

    def test_mixture(self, ref):
        from bayesian_bm25_tpu import BayesianBM25Scorer

        rng = np.random.default_rng(13)
        pools = [np.concatenate([rng.normal(1.0, 0.4, 400),
                                 rng.normal(5.0, 0.6, 60)])]
        RS = ref["scorer"].BayesianBM25Scorer
        a = RS._base_rate_mixture(RS, pools) \
            if not isinstance(RS.__dict__["_base_rate_mixture"],
                              staticmethod) \
            else RS._base_rate_mixture(pools)
        b = BayesianBM25Scorer._base_rate_mixture(pools)
        assert b == pytest.approx(a, rel=1e-6)

    def test_elbow(self, ref):
        from bayesian_bm25_tpu import BayesianBM25Scorer

        pools = self._pools()
        RS = ref["scorer"].BayesianBM25Scorer
        a = RS._base_rate_elbow(RS, pools) \
            if not isinstance(RS.__dict__["_base_rate_elbow"],
                              staticmethod) \
            else RS._base_rate_elbow(pools)
        b = BayesianBM25Scorer._base_rate_elbow(pools)
        assert b == pytest.approx(a, rel=1e-6)

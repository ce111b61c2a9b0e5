"""WAND / block-max safety and tightness tests.

Safety invariants mirror the reference suite (tests/test_wand.py,
tests/test_bmw.py): the upper bound dominates every document, block bounds
dominate their members and are at most the global bound, and pruning never
drops a document above threshold.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianProbabilityTransform, BlockMaxIndex
from bayesian_bm25_tpu.engine import index as eidx


class TestWand:
    def test_bound_dominates_random_docs(self):
        t = BayesianProbabilityTransform(alpha=0.8, beta=4.0, base_rate=0.02)
        rng = np.random.default_rng(0)
        ub_score = 15.0
        bound = t.wand_upper_bound(ub_score)
        scores = rng.uniform(0, ub_score, 500)
        tfs = rng.integers(0, 30, 500).astype(float)
        ratios = rng.uniform(0.05, 4.0, 500)
        probs = t.score_to_probability(scores, tfs, ratios)
        assert np.all(probs <= bound + 1e-12)

    def test_bound_uses_pmax(self):
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.0)
        loose = t.wand_upper_bound(3.0, p_max=0.9)
        tight = t.wand_upper_bound(3.0, p_max=0.5)
        assert tight < loose


class TestBlockMax:
    def _matrix(self, rng, n_terms=7, n_docs=300):
        m = rng.gamma(1.0, 2.0, (n_terms, n_docs))
        m[rng.uniform(size=m.shape) < 0.8] = 0.0  # sparse
        return m

    def test_build_shapes(self):
        rng = np.random.default_rng(1)
        m = self._matrix(rng)
        bmi = BlockMaxIndex(block_size=128)
        bmi.build(m)
        assert bmi.n_blocks == -(-300 // 128)
        assert bmi.block_size == 128

    def test_block_bound_dominates_members(self):
        rng = np.random.default_rng(2)
        m = self._matrix(rng)
        bmi = BlockMaxIndex(block_size=64)
        bmi.build(m)
        for term in range(m.shape[0]):
            for blk in range(bmi.n_blocks):
                lo, hi = blk * 64, min((blk + 1) * 64, 300)
                assert bmi.block_upper_bound(term, blk) >= m[term, lo:hi].max()

    def test_block_bound_at_most_global(self):
        rng = np.random.default_rng(3)
        m = self._matrix(rng)
        bmi = BlockMaxIndex(block_size=64)
        bmi.build(m)
        for term in range(m.shape[0]):
            g = m[term].max()
            for blk in range(bmi.n_blocks):
                assert bmi.block_upper_bound(term, blk) <= g + 1e-12

    def test_bayesian_block_bound_monotone(self):
        rng = np.random.default_rng(4)
        m = self._matrix(rng)
        bmi = BlockMaxIndex(block_size=64)
        bmi.build(m)
        t = BayesianProbabilityTransform(alpha=1.0, beta=1.0)
        for term in range(3):
            bounds = [bmi.block_upper_bound(term, b) for b in range(bmi.n_blocks)]
            bay = [bmi.bayesian_block_upper_bound(term, b, t)
                   for b in range(bmi.n_blocks)]
            order = np.argsort(bounds)
            assert np.all(np.diff(np.asarray(bay)[order]) >= -1e-12)

    def test_invalid_inputs(self):
        with pytest.raises(ValueError):
            BlockMaxIndex(block_size=0)
        bmi = BlockMaxIndex()
        with pytest.raises(ValueError):
            bmi.build(np.zeros(5))
        with pytest.raises(RuntimeError):
            bmi.block_upper_bound(0, 0)


class TestFromEngineIndex:
    CORPUS = [
        "alpha beta gamma".split(),
        "alpha alpha delta".split(),
        "beta epsilon zeta".split(),
        "gamma gamma gamma eta".split(),
        "delta epsilon".split(),
    ]

    def test_block_maxes_match_table(self):
        idx = eidx.build_index(self.CORPUS, doc_pad_multiple=8, pad_multiple=8)
        bmi = BlockMaxIndex.from_bm25_index(idx, block_size=2)
        tids = np.asarray(idx.term_ids)
        w = np.asarray(idx.weights)
        for term in range(idx.n_terms):
            for blk in range(bmi.n_blocks):
                lo, hi = blk * 2, min((blk + 1) * 2, idx.n_docs)
                expected = 0.0
                for d in range(lo, hi):
                    row = w[d][tids[d] == term]
                    if len(row):
                        expected = max(expected, float(row.max()))
                assert bmi.block_upper_bound(term, blk) == pytest.approx(expected)

    def test_pruning_never_drops_above_threshold(self):
        idx = eidx.build_index(self.CORPUS, doc_pad_multiple=8, pad_multiple=8)
        bmi = BlockMaxIndex.from_bm25_index(idx, block_size=2)
        t = BayesianProbabilityTransform(alpha=1.0, beta=0.5)

        from bayesian_bm25_tpu.engine import scoring
        query = ["alpha", "gamma"]
        qids, qcnt = eidx.encode_queries([query], idx.vocab)
        probs, scores, tfs = scoring.probabilities_all(
            idx.term_ids, idx.weights, idx.doc_lengths, idx.avgdl,
            qids, qcnt, t.alpha, t.beta, n_docs=idx.n_docs,
        )
        probs = np.asarray(probs)[0]

        terms = [idx.vocab[tok] for tok in query]
        for threshold in (0.3, 0.5, 0.7, 0.9):
            keep = bmi.prune_mask(terms, t, threshold)
            for d in range(idx.n_docs):
                if probs[d] >= threshold:
                    assert keep[d // 2], (
                        f"doc {d} with prob {probs[d]} pruned at {threshold}"
                    )

"""BayesianBM25Scorer integration tests on a tiny corpus.

Mirrors the reference suite's structure (tests/test_scorer.py): index /
retrieve / get_probabilities / add_documents, OOV and empty queries,
auto-estimation, base-rate methods, explain traces equal returned
probabilities.
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.models.scorer import RetrievalResult


@pytest.fixture(scope="module")
def small_corpus():
    return [
        "machine learning models require training data".split(),
        "deep learning uses neural networks with many layers".split(),
        "the cat sat on the warm mat".split(),
        "neural networks learn representations from data".split(),
        "cats and dogs are common household pets".split(),
        "training deep models needs a lot of compute".split(),
    ]


@pytest.fixture(scope="module")
def scorer(small_corpus):
    s = BayesianBM25Scorer()
    s.index(small_corpus, show_progress=False)
    return s


class TestIndexing:
    def test_num_docs(self, scorer, small_corpus):
        assert scorer.num_docs == len(small_corpus)

    def test_doc_lengths_and_avgdl(self, scorer, small_corpus):
        np.testing.assert_array_equal(
            scorer.doc_lengths, [len(d) for d in small_corpus]
        )
        assert scorer.avgdl == pytest.approx(
            np.mean([len(d) for d in small_corpus])
        )

    def test_auto_estimated_parameters(self, scorer):
        t = scorer.transform
        assert t is not None
        assert t.alpha > 0
        assert np.isfinite(t.beta)

    def test_user_override_parameters(self, small_corpus):
        s = BayesianBM25Scorer(alpha=2.5, beta=1.5)
        s.index(small_corpus, show_progress=False)
        assert s.transform.alpha == 2.5
        assert s.transform.beta == 1.5

    def test_requires_index(self):
        s = BayesianBM25Scorer()
        with pytest.raises(RuntimeError):
            s.retrieve([["x"]])
        with pytest.raises(RuntimeError):
            s.get_probabilities(["x"])
        with pytest.raises(RuntimeError):
            s.add_documents([["x"]])

    def test_invalid_base_rate_method(self):
        with pytest.raises(ValueError):
            BayesianBM25Scorer(base_rate_method="quantile")


class TestRetrieve:
    def test_shapes_and_ranges(self, scorer):
        ids, probs = scorer.retrieve(
            ["neural networks".split(), "cat mat".split()], k=3
        )
        assert ids.shape == (2, 3)
        assert probs.shape == (2, 3)
        assert np.all((probs >= 0) & (probs < 1))

    def test_relevant_doc_ranked_first(self, scorer):
        ids, probs = scorer.retrieve(["cat sat mat".split()], k=3)
        assert ids[0, 0] == 2
        # probabilities sorted along with scores (descending by score)
        assert probs[0, 0] >= probs[0, 1] - 1e-12

    def test_oov_query_zero_probs(self, scorer):
        ids, probs = scorer.retrieve([["qqqzzz"]], k=3)
        np.testing.assert_array_equal(probs, 0.0)

    def test_empty_query(self, scorer):
        ids, probs = scorer.retrieve([[]], k=3)
        np.testing.assert_array_equal(probs, 0.0)

    def test_k_larger_than_corpus(self, scorer, small_corpus):
        ids, probs = scorer.retrieve([["data"]], k=100)
        assert ids.shape == (1, len(small_corpus))

    def test_explain_traces_match_probabilities(self, scorer):
        res = scorer.retrieve(["neural networks data".split()], k=4,
                              explain=True)
        assert isinstance(res, RetrievalResult)
        for r in range(res.doc_ids.shape[1]):
            trace = res.explanations[0][r]
            p = res.probabilities[0, r]
            if p > 0:
                assert trace is not None
                assert trace.posterior == pytest.approx(p, rel=1e-5)
            else:
                assert trace is None

    def test_single_doc_corpus(self):
        s = BayesianBM25Scorer()
        s.index(["only one document here".split()], show_progress=False)
        ids, probs = s.retrieve([["document"]], k=1)
        assert ids.shape == (1, 1)
        # A term present in every doc has idf <= 0 (floored to 0), so the
        # score is 0 and the probability masks to 0 — parity with the
        # reference's score>0 masking (scorer.py:624).
        assert probs[0, 0] == 0.0
        # atire keeps ln(N/df) = 0 too; lucene gives a positive idf.
        s2 = BayesianBM25Scorer(method="lucene")
        s2.index(["only one document here".split()], show_progress=False)
        _, probs2 = s2.retrieve([["document"]], k=1)
        assert probs2[0, 0] > 0


class TestGetProbabilities:
    def test_dense_shape(self, scorer, small_corpus):
        probs = scorer.get_probabilities("neural networks".split())
        assert probs.shape == (len(small_corpus),)

    def test_zero_where_no_match(self, scorer, small_corpus):
        probs = scorer.get_probabilities(["cat"])
        scores = scorer.get_scores(["cat"])
        np.testing.assert_array_equal(probs == 0, scores == 0)
        assert np.all(probs[scores > 0] > 0)

    def test_matches_retrieve(self, scorer, small_corpus):
        q = "learning data".split()
        dense = scorer.get_probabilities(q)
        ids, probs = scorer.retrieve([q], k=len(small_corpus))
        for i, d in enumerate(ids[0]):
            assert dense[d] == pytest.approx(probs[0, i], rel=1e-5)

    def test_batched(self, scorer, small_corpus):
        qs = ["cat".split(), "neural data".split()]
        batched = scorer.get_probabilities_batch(qs)
        assert batched.shape == (2, len(small_corpus))
        np.testing.assert_allclose(
            batched[0], scorer.get_probabilities(qs[0]), rtol=1e-6
        )


class TestAddDocuments:
    def test_extends_and_reestimates(self, small_corpus):
        s = BayesianBM25Scorer()
        s.index(small_corpus, show_progress=False)
        s.add_documents(["new document about machine intelligence".split()])
        assert s.num_docs == len(small_corpus) + 1
        ids, probs = s.retrieve([["intelligence"]], k=1)
        assert ids[0, 0] == len(small_corpus)


class TestBaseRate:
    def test_none_by_default(self, scorer):
        assert scorer.base_rate is None

    def test_explicit(self, small_corpus):
        s = BayesianBM25Scorer(base_rate=0.01)
        s.index(small_corpus, show_progress=False)
        assert s.base_rate == 0.01

    @pytest.mark.parametrize("method", ["percentile", "mixture", "elbow"])
    def test_auto_methods_in_range(self, small_corpus, method):
        s = BayesianBM25Scorer(base_rate="auto", base_rate_method=method)
        s.index(small_corpus, show_progress=False)
        assert 1e-6 <= s.base_rate <= 0.5

    def test_base_rate_shrinks_probabilities(self, small_corpus):
        plain = BayesianBM25Scorer()
        plain.index(small_corpus, show_progress=False)
        low = BayesianBM25Scorer(base_rate=0.001)
        low.index(small_corpus, show_progress=False)
        q = "neural networks".split()
        p_plain = plain.get_probabilities(q)
        p_low = low.get_probabilities(q)
        mask = p_plain > 0
        assert np.all(p_low[mask] < p_plain[mask])

    def test_ranking_is_base_rate_invariant(self, small_corpus):
        plain = BayesianBM25Scorer()
        plain.index(small_corpus, show_progress=False)
        low = BayesianBM25Scorer(base_rate=0.001)
        low.index(small_corpus, show_progress=False)
        q = "learning models data".split()
        np.testing.assert_array_equal(
            np.argsort(-plain.get_probabilities(q)),
            np.argsort(-low.get_probabilities(q)),
        )

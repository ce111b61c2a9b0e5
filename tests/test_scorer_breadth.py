"""Scorer breadth: reference test classes not covered elsewhere
(ref tests/test_scorer.py — base-rate estimators, tf semantics,
add_documents surface, pre-index errors)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer


@pytest.fixture(scope="module")
def small_corpus():
    return [
        ["the", "quick", "brown", "fox", "jumps"],
        ["the", "lazy", "dog", "sleeps"],
        ["quick", "brown", "dogs", "run", "fast"],
        ["foxes", "and", "dogs", "are", "animals"],
        ["the", "fox", "hunts", "at", "night"],
        ["dogs", "bark", "at", "the", "moon"],
    ]


@pytest.fixture(scope="module")
def scorer(small_corpus):
    s = BayesianBM25Scorer()
    s.index(small_corpus, show_progress=False)
    return s


class TestEstimateBaseRate:
    def test_empty_scores_returns_minimum(self, scorer):
        assert scorer._estimate_base_rate([], n_docs=100) == pytest.approx(
            1e-6)

    def test_known_distribution(self, scorer, small_corpus):
        scores = np.concatenate([np.ones(95), np.ones(5) * 10.0])
        out = scorer._estimate_base_rate([scores], len(small_corpus))
        assert 0.0 < out <= 0.5

    def test_clamp_upper(self, scorer):
        out = scorer._estimate_base_rate([np.ones(100) * 5.0], n_docs=1)
        assert out <= 0.5

    def test_clamp_lower(self, scorer):
        scores = np.concatenate([np.zeros(999), np.array([100.0])])
        out = scorer._estimate_base_rate([scores], n_docs=1_000_000)
        assert out >= 1e-6


class TestBaseRateMethods:
    def test_mixture_bimodal_distribution(self):
        rng = np.random.default_rng(42)
        scores = np.concatenate([rng.normal(1.0, 0.5, 900),
                                 rng.normal(5.0, 0.5, 100)])
        scores = scores[scores > 0]
        out = BayesianBM25Scorer._base_rate_mixture([scores])
        assert 0.01 < out < 0.5

    def test_elbow_clear_knee(self):
        scores = np.concatenate([np.ones(10) * 10.0,
                                 np.linspace(2.0, 0.1, 90)])
        out = BayesianBM25Scorer._base_rate_elbow([scores])
        assert 0.01 < out < 0.5

    def test_mixture_too_few_returns_minimum(self):
        assert BayesianBM25Scorer._base_rate_mixture(
            [np.array([1.0])]) == pytest.approx(1e-6)

    def test_elbow_too_few_returns_minimum(self):
        assert BayesianBM25Scorer._base_rate_elbow(
            [np.array([1.0, 2.0])]) == pytest.approx(1e-6)

    def test_method_only_used_when_auto(self, small_corpus):
        s = BayesianBM25Scorer(base_rate=0.01, base_rate_method="mixture")
        s.index(small_corpus, show_progress=False)
        assert s.base_rate == pytest.approx(0.01)

    @pytest.mark.parametrize("method", ["percentile", "mixture", "elbow"])
    def test_all_methods_bounded(self, method):
        rng = np.random.default_rng(7)
        samples = [rng.gamma(2.0, 1.0, 200) + 0.01 for _ in range(5)]
        s = BayesianBM25Scorer(base_rate="auto", base_rate_method=method)
        out = s._estimate_base_rate(samples, n_docs=200)
        assert 1e-6 <= out <= 0.5


class TestPreIndexErrors:
    def test_doc_lengths_before_index(self):
        with pytest.raises(RuntimeError):
            BayesianBM25Scorer().doc_lengths

    def test_avgdl_before_index(self):
        with pytest.raises(RuntimeError):
            BayesianBM25Scorer().avgdl

    def test_num_docs_before_index(self):
        with pytest.raises(RuntimeError):
            BayesianBM25Scorer().num_docs

    def test_add_documents_before_index(self):
        with pytest.raises(RuntimeError):
            BayesianBM25Scorer().add_documents([["new", "doc"]])

    def test_thresholded_before_index(self):
        with pytest.raises(RuntimeError):
            BayesianBM25Scorer().retrieve_thresholded([["q"]], 0.5)


class TestAddDocumentsSurface:
    def test_preserves_search_for_old_docs(self, small_corpus):
        s = BayesianBM25Scorer()
        s.index(small_corpus, show_progress=False)
        ids_before, _ = s.retrieve([["fox", "hunts"]], k=1)
        s.add_documents([["totally", "new", "topic", "words"]],
                        show_progress=False)
        ids_after, _ = s.retrieve([["fox", "hunts"]], k=1)
        assert ids_before[0, 0] == ids_after[0, 0]

    def test_finds_new_docs(self, small_corpus):
        s = BayesianBM25Scorer()
        s.index(small_corpus, show_progress=False)
        s.add_documents([["zebra", "stripes", "pattern"]],
                        show_progress=False)
        ids, probs = s.retrieve([["zebra", "stripes"]], k=1)
        assert ids[0, 0] == len(small_corpus)
        assert probs[0, 0] > 0

    def test_increases_count(self, small_corpus):
        s = BayesianBM25Scorer()
        s.index(small_corpus, show_progress=False)
        s.add_documents([["a", "b"], ["c", "d"]], show_progress=False)
        assert s.num_docs == len(small_corpus) + 2


class TestTFSemantics:
    """The 'tf' fed to the prior is unique query-term overlap, not true
    term frequency (ref scorer.py:592-601)."""

    def _tf_of(self, scorer, query, doc_rank=0):
        res = scorer.retrieve([query], k=scorer.num_docs, explain=True)
        return res, [
            (int(res.doc_ids[0, r]),
             None if res.explanations[0][r] is None
             else res.explanations[0][r].tf)
            for r in range(res.doc_ids.shape[1])
        ]

    def test_known_counts(self, scorer):
        """Doc 0 has 3 of the query's unique terms."""
        _, tfs = self._tf_of(scorer, ["quick", "brown", "fox", "xyz"])
        by_doc = dict(tfs)
        assert by_doc[0] == pytest.approx(3.0)

    def test_duplicate_query_terms_not_double_counted(self, scorer):
        _, tfs_dup = self._tf_of(scorer, ["fox", "fox", "fox"])
        _, tfs_one = self._tf_of(scorer, ["fox"])
        assert dict(tfs_dup)[0] == dict(tfs_one)[0]

    def test_no_overlap_gives_no_trace(self, scorer):
        res = scorer.retrieve([["xylophone"]], k=3, explain=True)
        assert all(e is None for e in res.explanations[0])


class TestMonotonicityFixedPrior:
    def test_probability_monotone_in_score_at_fixed_tf_dlr(self, scorer):
        """With tf and doc-length fixed, probability is monotone in raw
        score (the likelihood is monotone and the prior is constant)."""
        t = scorer.transform
        scores = np.linspace(0.1, 8.0, 20)
        probs = np.asarray(t.score_to_probability(
            scores, np.full(20, 2.0), np.ones(20)))
        assert np.all(np.diff(probs) > 0)


class TestGetProbabilitiesSurface:
    def test_nonzero_for_matching_docs(self, scorer):
        p = scorer.get_probabilities(["fox"])
        assert p[0] > 0 and p[4] > 0  # docs containing "fox"

    def test_zero_for_nonmatching_docs(self, scorer):
        p = scorer.get_probabilities(["fox"])
        assert p[1] == 0.0  # doc 1 has no query term

    def test_single_doc_auto_estimate(self):
        """Auto-estimation must not crash on a 1-doc corpus. With the
        robertson default, df == N makes IDF 0 -> probability 0 (same as
        the reference's bm25s backend)."""
        s = BayesianBM25Scorer(base_rate="auto")
        s.index([["only", "one", "document", "here"]], show_progress=False)
        ids, probs = s.retrieve([["document"]], k=1)
        assert ids.shape == (1, 1) and 0 <= probs[0, 0] <= 1
        assert np.isfinite(s.transform.alpha) and np.isfinite(
            s.transform.beta)
        s2 = BayesianBM25Scorer(method="lucene", base_rate="auto")
        s2.index([["only", "one", "document", "here"]], show_progress=False)
        _, probs2 = s2.retrieve([["document"]], k=1)
        assert probs2[0, 0] > 0  # lucene IDF stays positive at df == N

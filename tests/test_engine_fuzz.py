"""Randomized engine fuzzing: the full scoring stack (compare path, split
path, scorer pipeline) vs the brute-force oracle across random corpus
shapes, vocabularies, variants, and query mixes."""

import numpy as np
import pytest

from bayesian_bm25_tpu.engine import index as eidx, scoring
from bayesian_bm25_tpu.engine import split_index as sidx
from tests.test_engine import brute_force_bm25


def random_corpus(rng, n_docs, vocab, max_len):
    corpus = []
    for _ in range(n_docs):
        length = int(rng.integers(1, max_len))
        corpus.append([f"w{t}" for t in rng.integers(0, vocab, length)])
    return corpus


def random_queries(rng, corpus, vocab, n_queries):
    queries = []
    for _ in range(n_queries):
        kind = rng.integers(0, 4)
        if kind == 0:  # sampled from a doc (guaranteed hits)
            doc = corpus[int(rng.integers(0, len(corpus)))]
            queries.append(list(rng.choice(doc, size=min(4, len(doc)))))
        elif kind == 1:  # random vocab incl. possible OOV
            queries.append([f"w{t}" for t in rng.integers(0, vocab * 2, 5)])
        elif kind == 2:  # duplicates
            tok = f"w{int(rng.integers(0, vocab))}"
            queries.append([tok, tok, f"w{int(rng.integers(0, vocab))}"])
        else:  # empty
            queries.append([])
    return queries


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_scoring_stack(seed):
    rng = np.random.default_rng(100 + seed)
    n_docs = int(rng.integers(3, 120))
    vocab = int(rng.integers(10, 400))
    max_len = int(rng.integers(3, 60))
    method = ["robertson", "lucene", "atire"][seed % 3]
    k1 = float(rng.uniform(0.8, 2.0))
    b = float(rng.uniform(0.0, 1.0))

    corpus = random_corpus(rng, n_docs, vocab, max_len)
    queries = random_queries(rng, corpus, vocab, 8)

    idx = eidx.build_index(corpus, k1=k1, b=b, method=method,
                           doc_pad_multiple=8, pad_multiple=8)
    qids, qcnt = eidx.encode_queries(queries, idx.vocab)
    s_cmp, t_cmp = scoring.score_all_xla(idx.term_ids, idx.weights,
                                         qids, qcnt)
    s_cmp = np.asarray(s_cmp)[:, :n_docs]
    t_cmp = np.asarray(t_cmp)[:, :n_docs]

    # oracle parity
    for i, q in enumerate(queries):
        expected = brute_force_bm25(corpus, q, k1=k1, b=b, method=method)
        np.testing.assert_allclose(s_cmp[i], expected, rtol=1e-4, atol=1e-5)
        qset = set(q)
        tf_expected = [len(qset & set(d)) for d in corpus]
        np.testing.assert_array_equal(t_cmp[i], tf_expected)

    # split parity (random K)
    K = int(rng.choice([128, 256]))
    split = sidx.build_split_index(idx, n_frequent=K)
    enc = sidx.encode_queries_split(queries, split)
    s_spl, t_spl = sidx.score_all_split(split, *enc)
    np.testing.assert_allclose(
        np.asarray(s_spl)[:, :n_docs], s_cmp, rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t_spl)[:, :n_docs], t_cmp)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_scorer_pipeline(seed):
    """End-to-end scorer: probabilities valid, ranking matches raw scores,
    dense and top-k paths agree."""
    from bayesian_bm25_tpu import BayesianBM25Scorer

    rng = np.random.default_rng(200 + seed)
    corpus = random_corpus(rng, int(rng.integers(20, 150)), 300, 40)
    queries = random_queries(rng, corpus, 300, 5)

    s = BayesianBM25Scorer(
        base_rate=["auto", None, 0.01][seed % 3],
        base_rate_method=["percentile", "mixture", "elbow"][seed % 3],
    )
    s.index(corpus, show_progress=False)
    k = min(5, s.num_docs)
    ids, probs = s.retrieve(queries, k=k)
    assert np.all((probs >= 0) & (probs < 1))
    scores = s.get_scores_batch(queries)
    dense = s.get_probabilities_batch(queries)
    for i in range(len(queries)):
        # top-k ids are the score argmax prefix (up to ties)
        top_scores = scores[i][ids[i]]
        kth = np.sort(scores[i])[::-1][k - 1]
        assert np.all(top_scores >= kth - 1e-6)
        # dense probabilities agree with top-k probabilities
        for rank, d in enumerate(ids[i]):
            assert dense[i, d] == pytest.approx(probs[i, rank], rel=2e-4,
                                                abs=1e-9)
        # zero score <-> zero probability
        np.testing.assert_array_equal(dense[i] == 0, scores[i] <= 0)


@pytest.mark.parametrize("seed", range(2))
def test_add_documents_equals_full_reindex(seed):
    """index(A); add_documents(B) must equal index(A+B) exactly (the
    reference's rebuild semantics, scorer.py:469-492)."""
    from bayesian_bm25_tpu import BayesianBM25Scorer

    rng = np.random.default_rng(300 + seed)
    a = random_corpus(rng, 40, 200, 30)
    b = random_corpus(rng, 15, 200, 30)

    s1 = BayesianBM25Scorer(base_rate="auto")
    s1.index(a, show_progress=False)
    s1.add_documents(b, show_progress=False)

    s2 = BayesianBM25Scorer(base_rate="auto")
    s2.index(a + b, show_progress=False)

    assert s1.num_docs == s2.num_docs
    # The incremental append promises BIT-IDENTICAL index state vs rebuild
    assert s1._index.vocab == s2._index.vocab
    np.testing.assert_array_equal(np.asarray(s1._index.term_ids),
                                  np.asarray(s2._index.term_ids))
    np.testing.assert_array_equal(np.asarray(s1._index.weights),
                                  np.asarray(s2._index.weights))
    np.testing.assert_array_equal(s1._index.doc_frequencies,
                                  s2._index.doc_frequencies)
    assert s1._index.avgdl == s2._index.avgdl
    assert s1.transform.alpha == s2.transform.alpha
    assert s1.transform.beta == s2.transform.beta
    assert s1.base_rate == s2.base_rate
    queries = random_queries(rng, a + b, 200, 4)
    np.testing.assert_allclose(
        s1.get_probabilities_batch(queries),
        s2.get_probabilities_batch(queries), rtol=1e-6)

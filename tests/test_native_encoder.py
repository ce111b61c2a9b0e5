"""Native batch query encoder (engine/native.py:VocabEncoder).

The C++ pair encoder must be bit-identical to the Python dict-loop +
np.unique path in engine/index.py:query_term_pairs, including edge
cases, and must fall back (return None) for inputs its NUL-joined blob
layout cannot represent."""

import pickle

import numpy as np
import pytest

from bayesian_bm25_tpu.engine import index as eidx

pytestmark = pytest.mark.skipif(
    eidx.get_native_encoder.__module__ is None, reason="never")


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(3)
    corpus = [[f"t{t}" for t in rng.zipf(1.4, size=30) % 2000]
              for _ in range(1500)]
    idx = eidx.build_index(corpus)
    enc = eidx.get_native_encoder(idx)
    if enc is None:
        pytest.skip("native toolchain unavailable")
    return idx, enc


def assert_pairs_equal(a, b):
    if a is None or b is None:
        assert a is None and b is None
        return
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestTokenPairParity:
    def test_random_batch(self, built):
        idx, enc = built
        rng = np.random.default_rng(7)
        queries = [[f"t{t}" for t in rng.zipf(1.4, size=rng.integers(1, 12))
                    % 2000] for _ in range(256)]
        assert_pairs_equal(
            eidx.query_term_pairs(queries, idx.vocab, enc),
            eidx.query_term_pairs(queries, idx.vocab, None))

    @pytest.mark.parametrize("queries", [
        [[]],                                  # empty query
        [["zzz-oov", "yyy-oov"]],              # all OOV
        [["t1", "t1", "t1"]],                  # multiplicity
        [["t1"], [], ["t2", "t1"], []],        # mixed with empties
        [[]] * 5,                              # all empty
        [["t0"]],                              # single token batch
    ])
    def test_edges(self, built, queries):
        idx, enc = built
        assert_pairs_equal(
            eidx.query_term_pairs(queries, idx.vocab, enc),
            eidx.query_term_pairs(queries, idx.vocab, None))

    def test_encode_queries_padded_parity(self, built):
        idx, enc = built
        rng = np.random.default_rng(11)
        queries = [[f"t{t}" for t in rng.zipf(1.4, size=6) % 2000]
                   for _ in range(64)]
        a1, a2 = eidx.encode_queries(queries, idx.vocab)
        b1, b2 = eidx.encode_queries(queries, idx.vocab, native_encoder=enc)
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)


class TestFallbacks:
    def test_non_ascii_returns_none(self, built):
        _, enc = built
        assert enc.encode_tokens([["café", "t1"]]) is None

    def test_nul_token_returns_none(self, built):
        _, enc = built
        assert enc.encode_tokens([["a\x00b", "t1"]]) is None

    def test_query_term_pairs_falls_back(self, built):
        idx, enc = built
        queries = [["café"], ["t1", "t2"]]
        assert_pairs_equal(
            eidx.query_term_pairs(queries, idx.vocab, enc),
            eidx.query_term_pairs(queries, idx.vocab, None))

    def test_surrogate_token(self, built):
        idx, enc = built
        # Unpaired surrogate: utf-8 encode raises -> fallback, and the
        # Python path drops it as OOV.
        queries = [["\ud800bad", "t1"]]
        assert enc.encode_tokens(queries) is None
        assert_pairs_equal(
            eidx.query_term_pairs(queries, idx.vocab, enc),
            eidx.query_term_pairs(queries, idx.vocab, None))


class TestTextEncode:
    def test_matches_tokenize_then_pairs(self, built):
        idx, enc = built
        texts = ["t1 t17 t17 running quickly", "zzz unknown", ""]
        from bayesian_bm25_tpu.engine.tokenize import tokenize_texts

        expected = eidx.query_term_pairs(tokenize_texts(texts), idx.vocab,
                                         None)
        got = enc.encode_texts(texts)
        pq, pt, pc = got
        if expected is None:
            assert len(pq) == 0
        else:
            assert_pairs_equal(
                expected, (pq.astype(np.int64), pt.astype(np.int64), pc))

    def test_tokenizer_options_respected(self, built):
        idx, enc = built
        # stopword "the" survives with remove_stopwords=False; both paths
        # must agree for each option set.
        from bayesian_bm25_tpu.engine.tokenize import tokenize_texts

        texts = ["The T1 Running"]
        for opts in (dict(lowercase=True, remove_stopwords=False, stem=False),
                     dict(lowercase=False, remove_stopwords=True, stem=True)):
            expected = eidx.query_term_pairs(
                tokenize_texts(texts, **opts), idx.vocab, None)
            pq, pt, pc = enc.encode_texts(texts, **opts)
            if expected is None:
                assert len(pq) == 0
            else:
                assert_pairs_equal(
                    expected,
                    (pq.astype(np.int64), pt.astype(np.int64), pc))


class TestCache:
    def test_cache_reused_and_invalidated(self, built):
        idx, enc = built
        assert eidx.get_native_encoder(idx) is enc
        idx.vocab["__new_term__"] = len(idx.vocab)
        enc2 = eidx.get_native_encoder(idx)
        assert enc2 is not enc
        pq, pt, pc = enc2.encode_tokens([["__new_term__"]])
        assert list(pt) == [len(idx.vocab) - 1]
        del idx.vocab["__new_term__"]
        eidx.get_native_encoder(idx)  # rebuild back

    def test_index_pickles_with_cache(self, built):
        idx, enc = built
        blob = pickle.dumps(idx)
        idx2 = pickle.loads(blob)
        assert "_native_encoder_cache" not in idx2.__dict__
        enc2 = eidx.get_native_encoder(idx2)
        queries = [["t1", "t2", "t1"]]
        assert_pairs_equal(
            eidx.query_term_pairs(queries, idx2.vocab, enc2),
            eidx.query_term_pairs(queries, idx.vocab, enc))


class TestNativeCorpusBuilder:
    """build_corpus_tokens_native must be bit-compatible with the Python
    _corpus_to_csr (vocab id assignment + per-doc term order)."""

    def test_csr_parity_with_edge_docs(self):
        from bayesian_bm25_tpu.engine.native import (
            build_corpus_tokens_native,
        )

        rng = np.random.default_rng(21)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=25) % 900]
                  for _ in range(400)]
        corpus[3] = []                      # empty doc
        corpus[5] = ["dup", "dup", "dup"]   # single repeated term
        vocab_py: dict = {}
        py = eidx._corpus_to_csr(corpus, vocab_py)
        out = build_corpus_tokens_native(corpus)
        if out is None:
            pytest.skip("native toolchain unavailable")
        vocab_nat, indptr, tids, counts, dlens = out
        assert vocab_nat == vocab_py
        for a, b in zip((indptr, tids, counts, dlens), py):
            np.testing.assert_array_equal(a, b)

    def test_fallback_on_unrepresentable_tokens(self):
        from bayesian_bm25_tpu.engine.native import (
            build_corpus_tokens_native,
        )

        assert build_corpus_tokens_native([["café"]]) is None
        assert build_corpus_tokens_native([["a\x00b"]]) is None

    def test_build_index_native_equals_python(self):
        rng = np.random.default_rng(22)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=20) % 500]
                  for _ in range(300)]
        i1 = eidx.build_index(corpus)           # native fast path
        vocab2: dict = {}
        csr2 = eidx._corpus_to_csr(corpus, vocab2)
        i2 = eidx.build_index(corpus, vocab=vocab2, csr=csr2)
        assert i1.vocab == i2.vocab
        np.testing.assert_array_equal(np.asarray(i1.term_ids),
                                      np.asarray(i2.term_ids))
        np.testing.assert_array_equal(np.asarray(i1.weights),
                                      np.asarray(i2.weights))
        np.testing.assert_array_equal(np.asarray(i1.doc_lengths),
                                      np.asarray(i2.doc_lengths))


class TestSplitEncodeNative:
    """encode_tokens_split must be bit-identical to the numpy group-by
    in engine/split_index.py:encode_queries_split (shapes, dtypes,
    padding, row order) and fall back for unrepresentable tokens."""

    @pytest.fixture(scope="class")
    def split_built(self, built):
        from bayesian_bm25_tpu.engine import split_index as sidx
        idx, enc = built
        split = sidx.build_split_index(idx, n_frequent=256)
        return split, enc

    def _numpy_path(self, queries, split):
        from bayesian_bm25_tpu.engine import split_index as sidx
        orig = eidx.get_native_encoder
        eidx.get_native_encoder = lambda base: None
        try:
            return sidx.encode_queries_split(queries, split)
        finally:
            eidx.get_native_encoder = orig

    @pytest.mark.parametrize("seed", [0, 1])
    def test_batch_parity(self, split_built, seed):
        from bayesian_bm25_tpu.engine import split_index as sidx
        split, _ = split_built
        rng = np.random.default_rng(seed)
        queries = [[f"t{t}" for t in rng.zipf(1.4, size=6) % 2500]
                   for _ in range(97)]
        fast = sidx.encode_queries_split(queries, split)
        slow = self._numpy_path(queries, split)
        for name, a, b in zip("fslots fcnt trows qids qcnt".split(),
                              fast, slow):
            assert a.dtype == b.dtype, name
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    def test_edge_batches(self, split_built):
        from bayesian_bm25_tpu.engine import split_index as sidx
        split, _ = split_built
        for queries in (
            [[], ["zzz-oov"], ["t1"], ["t1", "t1", "t5", "zzz"]],
            [["zzz"], ["yyy"]],          # all OOV
            [["t1", "t2", "t3"]],        # single query
            [[]] * 4,                     # all empty
        ):
            fast = sidx.encode_queries_split(queries, split)
            slow = self._numpy_path(queries, split)
            for name, a, b in zip("fslots fcnt trows qids qcnt".split(),
                                  fast, slow):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name)

    def test_non_ascii_falls_back(self, split_built):
        from bayesian_bm25_tpu.engine import split_index as sidx
        split, enc = split_built
        slot = np.ascontiguousarray(split.freq_slot_of_term, np.int32)
        assert enc.encode_tokens_split(
            [["café"]], slot, split.n_frequent, -2, 8, 4, 16) is None
        # the public entry still works via the fallback path
        out = sidx.encode_queries_split([["café", "t1"]], split)
        slow = self._numpy_path([["café", "t1"]], split)
        for a, b in zip(out, slow):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Tokenizer + Porter stemmer tests, and C++/Python parity."""

import numpy as np
import pytest

from bayesian_bm25_tpu.engine.tokenize import (
    STOPWORDS,
    porter_stem,
    tokenize_py,
)


class TestPorterStemmer:
    # Canonical examples from the Porter paper / standard vocabularies.
    CASES = {
        "caresses": "caress",
        "ponies": "poni",
        "ties": "ti",
        "caress": "caress",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "bled": "bled",
        "motoring": "motor",
        "sing": "sing",
        "conflated": "conflat",
        "troubled": "troubl",
        "sized": "size",
        "hopping": "hop",
        "tanned": "tan",
        "falling": "fall",
        "hissing": "hiss",
        "fizzed": "fizz",
        "failing": "fail",
        "filing": "file",
        "happy": "happi",
        "sky": "sky",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "valenci": "valenc",
        "hesitanci": "hesit",
        "digitizer": "digit",
        "conformabli": "conform",
        "radicalli": "radic",
        "differentli": "differ",
        "vileli": "vile",
        "analogousli": "analog",
        "vietnamization": "vietnam",
        "predication": "predic",
        "operator": "oper",
        "feudalism": "feudal",
        "decisiveness": "decis",
        "hopefulness": "hope",
        "callousness": "callous",
        "formaliti": "formal",
        "sensitiviti": "sensit",
        "sensibiliti": "sensibl",
        "triplicate": "triplic",
        "formative": "form",
        "formalize": "formal",
        "electriciti": "electr",
        "electrical": "electr",
        "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "airliner": "airlin",
        "gyroscopic": "gyroscop",
        "adjustable": "adjust",
        "defensible": "defens",
        "irritant": "irrit",
        "replacement": "replac",
        "adjustment": "adjust",
        "dependent": "depend",
        "adoption": "adopt",
        "homologou": "homolog",
        "communism": "commun",
        "activate": "activ",
        "angulariti": "angular",
        "homologous": "homolog",
        "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat",
        "rate": "rate",
        "cease": "ceas",
        "controll": "control",
        "roll": "roll",
    }

    @pytest.mark.parametrize("word,expected", sorted(CASES.items()))
    def test_canonical(self, word, expected):
        assert porter_stem(word) == expected

    def test_short_words_unchanged(self):
        for w in ("a", "is", "be", "go"):
            assert porter_stem(w) == w


class TestTokenize:
    def test_basic(self):
        toks = tokenize_py("The Quick brown FOX!", stem=False)
        assert toks == ["quick", "brown", "fox"]  # "the" is a stopword

    def test_numbers_kept(self):
        assert tokenize_py("version 2 release 10", stem=False) == [
            "version", "2", "release", "10"
        ]

    def test_punctuation_splits(self):
        assert tokenize_py("state-of-the-art", stem=False) == [
            "state", "art"
        ]  # "of" and "the" are stopwords

    def test_stemming_applied(self):
        assert tokenize_py("running dogs") == ["run", "dog"]

    def test_no_options(self):
        toks = tokenize_py("The Running", lowercase=False,
                           remove_stopwords=False, stem=False)
        assert toks == ["he", "unning"]  # uppercase chars excluded by regex

    def test_empty(self):
        assert tokenize_py("") == []
        assert tokenize_py("!!! ...") == []

    def test_stopwords_frozen(self):
        assert "the" in STOPWORDS and "with" in STOPWORDS


class TestNativeParity:
    @pytest.fixture(scope="class")
    def native_available(self):
        try:
            from bayesian_bm25_tpu.engine.native import tokenize_texts_native

            tokenize_texts_native(["probe"])
            return True
        except (ImportError, OSError):
            pytest.skip("native toolchain unavailable")

    def test_tokenize_parity(self, native_available):
        from bayesian_bm25_tpu.engine.native import tokenize_texts_native

        rng = np.random.default_rng(0)
        words = ["running", "the", "CATS", "state-of-the-art", "foo123",
                 "relational", "hopping", "agreement", "", "généralisation",
                 "x", "controlled", "analogously", "predication!!!"]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(0, 12)))
            for _ in range(50)
        ]
        texts += ["", "   ", "ALL CAPS TEXT", "123 456"]
        expected = [tokenize_py(t) for t in texts]
        got = tokenize_texts_native(texts)
        assert got == expected

    def test_corpus_build_parity(self, native_available):
        from bayesian_bm25_tpu.engine.native import build_corpus_native

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "a fast auburn foxes leaped over sleepy canines",
            "running runs runner ran",
            "",
        ]
        vocab, indptr, tids, counts, dlens = build_corpus_native(texts)
        # Rebuild expectations from the Python tokenizer
        py_tokens = [tokenize_py(t) for t in texts]
        assert list(dlens) == [len(t) for t in py_tokens]
        for d, toks in enumerate(py_tokens):
            got = {}
            for i in range(indptr[d], indptr[d + 1]):
                inv = {v: k for k, v in vocab.items()}
                got[inv[tids[i]]] = counts[i]
            expected = {}
            for t in toks:
                expected[t] = expected.get(t, 0) + 1
            assert got == expected

    def test_index_from_texts_matches_python_path(self, native_available):
        from bayesian_bm25_tpu.engine.index import build_index_from_texts

        texts = [
            "machine learning models require training data",
            "deep learning uses neural networks with many layers",
            "the cat sat on the warm mat",
        ]
        idx_n, toks_n = build_index_from_texts(texts, use_native=True)
        idx_p, toks_p = build_index_from_texts(texts, use_native=False)
        assert toks_n == toks_p
        assert idx_n.n_terms == idx_p.n_terms
        assert idx_n.avgdl == pytest.approx(idx_p.avgdl)
        # same scoring behavior regardless of path
        from bayesian_bm25_tpu.engine import index as eidx, scoring

        qids_n, qcnt_n = eidx.encode_queries([toks_n[0][:3]], idx_n.vocab)
        qids_p, qcnt_p = eidx.encode_queries([toks_p[0][:3]], idx_p.vocab)
        s_n, _ = scoring.score_all_xla(idx_n.term_ids, idx_n.weights, qids_n, qcnt_n)
        s_p, _ = scoring.score_all_xla(idx_p.term_ids, idx_p.weights, qids_p, qcnt_p)
        np.testing.assert_allclose(
            np.asarray(s_n)[:, :3], np.asarray(s_p)[:, :3], rtol=1e-6
        )


class TestNativeFallback:
    def test_auto_falls_back_without_native(self, monkeypatch):
        """use_native='auto' silently falls back to Python when the native
        import fails; use_native=True propagates the error."""
        import builtins

        from bayesian_bm25_tpu.engine import tokenize as tk

        real_import = builtins.__import__

        def blocked(name, *args, **kwargs):
            if "engine.native" in name or name.endswith(".native"):
                raise ImportError("blocked for test")
            return real_import(name, *args, **kwargs)

        monkeypatch.setattr(builtins, "__import__", blocked)
        out = tk.tokenize_texts(["Running dogs"], use_native="auto")
        assert out == [["run", "dog"]]
        import pytest as _pytest

        with _pytest.raises(ImportError):
            tk.tokenize_texts(["x"], use_native=True)


class TestNativeRobustness:
    @pytest.fixture(scope="class")
    def native(self):
        try:
            from bayesian_bm25_tpu.engine import native

            native.tokenize_texts_native(["probe"])
            return native
        except (ImportError, OSError):
            pytest.skip("native toolchain unavailable")

    def test_unicode_and_binary_safe(self, native):
        texts = [
            "naïve café résumé 北京 🚀 emoji",
            "mixed ASCII and ünïcödé words",
            "\x00\x01 control chars", "",
            "a" * 10000,  # very long token
            ("word " * 5000).strip(),  # very long doc
        ]
        got = native.tokenize_texts_native(texts)
        expected = [tokenize_py(t) for t in texts]
        assert got == expected

    def test_corpus_build_empty_and_oov_docs(self, native):
        texts = ["", "the of and", "unique terms here", ""]
        vocab, indptr, tids, counts, dlens = native.build_corpus_native(texts)
        # stopword-only and empty docs have zero tokens
        assert dlens[0] == 0 and dlens[1] == 0 and dlens[3] == 0
        assert indptr[1] == indptr[0] and indptr[2] == indptr[1]
        assert len(vocab) == 3  # uniqu/term/here stems

    def test_large_vocab_stress(self, native):
        import numpy as np

        rng = np.random.default_rng(0)
        texts = [" ".join(f"tok{t}" for t in rng.integers(0, 50000, 60))
                 for _ in range(2000)]
        vocab, indptr, tids, counts, dlens = native.build_corpus_native(
            texts, stem=False)
        assert len(vocab) <= 50000
        assert indptr[-1] == len(tids)
        assert (counts > 0).all()
        # spot-check one doc against the python pipeline
        toks = tokenize_py(texts[17], stem=False)
        got = {}
        inv = {v: k for k, v in vocab.items()}
        for i in range(indptr[17], indptr[18]):
            got[inv[tids[i]]] = counts[i]
        expected = {}
        for t in toks:
            expected[t] = expected.get(t, 0) + 1
        assert got == expected


class TestSnowballStemmer:
    """Porter2 (Snowball English): the stemmer the reference's BEIR
    harness uses (reference benchmarks/hybrid_beir.py:288-296)."""

    CANONICAL = [
        ("running", "run"), ("generously", "generous"), ("flies", "fli"),
        ("dogs", "dog"), ("agreed", "agre"), ("fairly", "fair"),
        ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
        ("dying", "die"), ("lying", "lie"), ("news", "news"),
        ("proceed", "proceed"), ("exceeding", "exceed"),
        ("communism", "communism"), ("generate", "generat"),
        ("organization", "organ"), ("realization", "realiz"),
        ("civilization", "civil"), ("hopefulness", "hope"),
        ("decisiveness", "decis"), ("knitting", "knit"),
        ("hopping", "hop"), ("hoping", "hope"), ("ties", "tie"),
        ("cries", "cri"), ("congratulations", "congratul"),
    ]

    def test_canonical_forms(self):
        from bayesian_bm25_tpu.engine.snowball import snowball_stem
        try:
            from nltk.stem.snowball import SnowballStemmer
            oracle = SnowballStemmer("english").stem
        except ImportError:
            oracle = None
        for word, expected in self.CANONICAL:
            got = snowball_stem(word)
            if oracle is not None:
                assert got == oracle(word), (word, got, oracle(word))
            else:
                assert got == expected, (word, got, expected)

    def test_fuzz_against_nltk(self):
        """Exact agreement with NLTK's SnowballStemmer('english') over an
        adversarial random vocabulary exercising every suffix family."""
        nltk = pytest.importorskip("nltk.stem.snowball")
        import random

        from bayesian_bm25_tpu.engine.snowball import snowball_stem
        oracle = nltk.SnowballStemmer("english")
        sufs = ["", "s", "es", "ies", "ed", "ing", "ingly", "edly", "eed",
                "eedly", "ation", "ational", "iveness", "fulness",
                "ousness", "ization", "izer", "ator", "alism", "aliti",
                "ality", "ive", "ly", "li", "ful", "ness", "ment",
                "ement", "ence", "ance", "able", "ible", "ant", "ent",
                "ism", "ate", "iti", "ous", "ize", "ion", "tion", "sion",
                "al", "er", "ic", "ical", "icate", "ative", "alize",
                "iciti", "ogi", "bli", "abli", "enci", "anci", "lessli",
                "fulli", "ousli", "entli", "biliti", "iviti", "alli",
                "e", "l", "ll", "y", "ey", "sses", "ied", "us", "ss"]
        rng = random.Random(42)
        for _ in range(8000):
            n = rng.randint(1, 8)
            stem = "".join(rng.choice("abcdefghilmnoprstuvwyy")
                           for _ in range(n))
            w = stem + rng.choice(sufs) + rng.choice(["", rng.choice(sufs)])
            assert snowball_stem(w) == oracle.stem(w), w

    def test_porter_vs_snowball_documented_divergence(self):
        """Porter != Porter2 on a real vocabulary — the reason 'snowball'
        exists as an option (BEIR numbers shift silently otherwise)."""
        from bayesian_bm25_tpu.engine.snowball import snowball_stem
        from bayesian_bm25_tpu.engine.tokenize import porter_stem
        diverging = {
            "generously": ("gener", "generous"),
            "dying": ("dy", "die"),
            "early": ("earli", "earli"),
            "tying": ("ty", "tie"),
        }
        for w, (p, s) in diverging.items():
            assert porter_stem(w) == p
            assert snowball_stem(w) == s
        assert porter_stem("generously") != snowball_stem("generously")

    def test_stem_mode_mapping(self):
        from bayesian_bm25_tpu.engine.tokenize import stem_mode
        assert stem_mode(False) == 0
        assert stem_mode(True) == 1
        assert stem_mode("none") == 0
        assert stem_mode("porter") == 1
        assert stem_mode("snowball") == 2
        with pytest.raises(ValueError):
            stem_mode("lancaster")
        with pytest.raises(ValueError):
            stem_mode(2)

    def test_tokenize_with_snowball(self):
        got = tokenize_py("The dogs were running generously",
                          stem="snowball")
        assert got == ["dog", "were", "run", "generous"]


class TestSnowballNativeParity:
    """The C++ Snowball mirror must agree with the Python one exactly."""

    @pytest.fixture(scope="class")
    def native_available(self):
        try:
            from bayesian_bm25_tpu.engine.native import tokenize_texts_native

            tokenize_texts_native(["probe"])
            return True
        except (ImportError, OSError):
            pytest.skip("native toolchain unavailable")

    def test_tokenize_parity_snowball(self, native_available):
        from bayesian_bm25_tpu.engine.native import tokenize_texts_native
        import random
        rng = random.Random(3)
        sufs = ["", "s", "ies", "ed", "ing", "ization", "ational", "enci",
                "abli", "ogi", "bli", "li", "ical", "ative", "iveness",
                "ion", "ement", "ous", "e", "l", "ly", "y", "eedly"]
        texts = []
        for _ in range(300):
            words = []
            for _ in range(rng.randint(1, 12)):
                stem = "".join(rng.choice("abcdefghilmnoprstuvwy")
                               for _ in range(rng.randint(1, 8)))
                words.append(stem + rng.choice(sufs))
            texts.append(" ".join(words))
        texts += ["The RUNNING dogs, agreed; generously!",
                  "realization of organizational skies 123abc"]
        for rs in (True, False):
            py = [tokenize_py(t, remove_stopwords=rs, stem="snowball")
                  for t in texts]
            nat = tokenize_texts_native(texts, remove_stopwords=rs,
                                        stem="snowball")
            assert py == nat

    def test_corpus_build_parity_snowball(self, native_available):
        from bayesian_bm25_tpu.engine.index import build_index_from_texts
        texts = ["the dogs were running generously tonight",
                 "organizational realization of decisiveness",
                 "flies cried hopefully over communities"] * 3
        idx_nat, _ = build_index_from_texts(texts, stem="snowball",
                                            return_tokens=False)
        toks = [tokenize_py(t, stem="snowball") for t in texts]
        from bayesian_bm25_tpu.engine.index import build_index
        idx_py = build_index(toks)
        assert idx_nat.vocab.keys() == idx_py.vocab.keys()
        assert idx_nat.n_docs == idx_py.n_docs
        np.testing.assert_allclose(
            np.asarray(idx_nat.doc_lengths), np.asarray(idx_py.doc_lengths))

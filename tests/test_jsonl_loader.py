"""Native JSONL data loader (engine/native.py:load_jsonl_native) and the
end-to-end BayesianBM25Scorer.index_jsonl path.

The C++ mini-JSON parser must agree with Python's json module on BEIR
corpus lines, including escape sequences, \\uXXXX (with surrogate
pairs), nested objects containing decoy keys, reordered/missing keys,
and blank lines."""

import json
import os

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer

try:
    from bayesian_bm25_tpu.engine.native import (
        BlobTexts,
        load_jsonl_native,
    )
    _HAVE_NATIVE = True
except (ImportError, OSError):
    _HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not _HAVE_NATIVE,
                                  reason="native toolchain unavailable")


TRICKY_ROWS = [
    {"_id": "d1", "title": "First Doc", "text": "the quick brown fox"},
    {"_id": "d2", "text": "escaped \"quotes\" and \\ backslash\nnl\ttab",
     "title": ""},
    {"_id": "d3", "title": "café man",
     "text": "unicode café emoji \U0001F600 end"},
    {"_id": "d4", "metadata": {"text": "DECOY", "nested": {"_id": "x"}},
     "text": "real text four", "title": "T4"},
    {"_id": "d5", "text": "numbers 123 true null",
     "extra": [1, 2, {"text": "deep"}], "title": "t5"},
    {"text": "no id -> dropped"},
]


@pytest.fixture
def tricky_file(tmp_path):
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for i, row in enumerate(TRICKY_ROWS):
            f.write(json.dumps(row) + "\n")
            if i == 2:
                f.write("\n")  # blank line mid-file
    return str(p)


@needs_native
class TestNativeJsonlParser:
    def test_agrees_with_json_module(self, tricky_file):
        ids, titles, texts = load_jsonl_native(tricky_file)
        kept = [r for r in TRICKY_ROWS if r.get("_id")]
        assert ids == [r["_id"] for r in kept]
        for i, row in enumerate(kept):
            assert titles[i] == (row.get("title") or "")
            assert texts[i] == row.get("text", "")

    def test_missing_file_returns_none(self):
        assert load_jsonl_native("/tmp/definitely/not/here.jsonl") is None

    def test_blob_texts_sequence_protocol(self, tricky_file):
        _, _, texts = load_jsonl_native(tricky_file)
        assert isinstance(texts, BlobTexts)
        assert len(texts) == 5
        assert texts[-1] == texts[4]
        assert list(texts)[0] == texts[0]
        with pytest.raises(IndexError):
            texts[5]


class TestIndexJsonl:
    def _write(self, tmp_path, n=120):
        rows = []
        for i in range(n):
            words = " ".join(
                f"t{t}" for t in np.random.default_rng(i).zipf(1.4, 25)
                % 400)
            rows.append({"_id": f"doc{i}", "title": "", "text": words})
        rows[7]["text"] = "zebra stripes pattern unique"
        p = tmp_path / "corpus.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return str(p), rows

    def test_end_to_end_and_id_mapping(self, tmp_path):
        path, rows = self._write(tmp_path)
        s = BayesianBM25Scorer()
        ids = s.index_jsonl(path)
        assert len(ids) == len(rows) and s.num_docs == len(rows)
        ranked, probs = s.retrieve_texts(["zebra stripes"], k=1)
        assert ids[int(np.asarray(ranked)[0, 0])] == "doc7"

    def test_matches_index_texts(self, tmp_path):
        path, rows = self._write(tmp_path)
        a = BayesianBM25Scorer()
        a.index_jsonl(path)
        b = BayesianBM25Scorer()
        b.index_texts([r["text"] for r in rows])
        qa = a.retrieve_texts(["zebra stripes pattern"], k=5)
        qb = b.retrieve_texts(["zebra stripes pattern"], k=5)
        np.testing.assert_array_equal(np.asarray(qa[0]), np.asarray(qb[0]))
        np.testing.assert_allclose(np.asarray(qa[1]), np.asarray(qb[1]),
                                   rtol=1e-6)

    def test_add_documents_after_index_jsonl(self, tmp_path):
        path, rows = self._write(tmp_path, n=60)
        s = BayesianBM25Scorer()
        s.index_jsonl(path)
        s.add_documents([["qqq", "www"]], show_progress=False)
        ranked, _ = s.retrieve([["qqq"]], k=1)
        assert int(np.asarray(ranked)[0, 0]) == 60


class TestBeirLoaderRoundTrip:
    def test_mini_beir_fixture_loads_identically(self):
        """The harness loader must produce the same dataset through the
        native and Python paths."""
        from benchmarks.utils import _read_jsonl, load_beir_dataset

        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "data", "mini_beir")
        if not os.path.isdir(root):
            pytest.skip("mini_beir fixture missing")
        ds = load_beir_dataset(root)
        # python re-parse of the same file
        ids, titles, texts = [], [], []
        with open(os.path.join(root, "corpus.jsonl")) as f:
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                ids.append(str(row["_id"]))
                titles.append(row.get("title", "") or "")
                texts.append(row.get("text", ""))
        assert ds.corpus == dict(zip(ids, texts))
        nat = _read_jsonl(os.path.join(root, "corpus.jsonl"))
        assert nat[0] == ids and nat[1] == titles and nat[2] == texts


@needs_native
class TestParserFuzz:
    """Randomized structures + malformed lines: the C++ parser must
    agree with the json module on well-formed rows and drop (never
    crash on) anything else."""

    def test_random_structures_match_json_module(self, tmp_path):
        import random
        import string

        rng = random.Random(0)
        pool = string.ascii_letters + string.digits + ' \t"\\/\né中\U0001F600'

        def rand_string(n):
            return "".join(rng.choice(pool)
                           for _ in range(rng.randint(0, n)))

        def rand_value(depth=0):
            c = rng.random()
            if depth > 2 or c < 0.4:
                return rand_string(20)
            if c < 0.55:
                return rng.randint(-1000, 1000)
            if c < 0.65:
                return rng.random() * 100
            if c < 0.72:
                return rng.choice([True, False, None])
            if c < 0.86:
                return [rand_value(depth + 1)
                        for _ in range(rng.randint(0, 3))]
            return {rand_string(6) or "k": rand_value(depth + 1)
                    for _ in range(rng.randint(0, 3))}

        for trial in range(10):
            rows = []
            for i in range(rng.randint(1, 30)):
                row = {"_id": f"id{trial}_{i}"}
                if rng.random() < 0.8:
                    row["title"] = rand_string(30)
                if rng.random() < 0.9:
                    row["text"] = rand_string(100)
                for _ in range(rng.randint(0, 4)):
                    k = rng.choice(["metadata", "text", "_id", "title",
                                    rand_string(8) or "k"])
                    if k in row:
                        continue
                    row[k] = rand_value()
                rows.append(row)
            path = tmp_path / f"fuzz_{trial}.jsonl"
            with open(path, "w") as f:
                for r in rows:
                    f.write(json.dumps(
                        r, ensure_ascii=rng.random() < 0.5) + "\n")
            ids, titles, texts = load_jsonl_native(str(path))
            assert ids == [r["_id"] for r in rows]
            for i, r in enumerate(rows):
                et = r.get("title")
                ex = r.get("text")
                assert titles[i] == (et if isinstance(et, str) else "")
                assert texts[i] == (ex if isinstance(ex, str) else "")

    def test_malformed_lines_dropped_not_crashed(self, tmp_path):
        path = tmp_path / "bad.jsonl"
        with open(path, "w") as f:
            f.write('{"_id": "good1", "text": "ok"}\n')
            f.write('{"_id": "trunc", "text": "unterminated\n')
            f.write('not json at all\n')
            f.write('{"_id": 42, "text": "non-string id -> stringified"}\n')
            f.write('{"_id": "good2", "text": "also ok"}\n')
        ids, _, texts = load_jsonl_native(str(path))
        assert ids == ["good1", "42", "good2"]
        assert texts[0] == "ok" and texts[2] == "also ok"


class TestMultiFieldJsonl:
    def _write(self, tmp_path):
        rows = [
            {"_id": "a1", "title": "fox hunting", "text": "the quick brown "
             "fox jumps over the lazy dog in the forest"},
            {"_id": "a2", "title": "dog training", "text": "dogs learn "
             "commands with patience and daily practice sessions"},
            {"_id": "a3", "title": "night sky", "text": "stars shine at "
             "night while foxes hunt in the dark"},
        ]
        p = tmp_path / "corpus.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return str(p), rows

    def test_title_body_end_to_end(self, tmp_path):
        from bayesian_bm25_tpu import MultiFieldScorer

        path, rows = self._write(tmp_path)
        m = MultiFieldScorer(fields=["title", "body"],
                             field_weights={"title": 0.7, "body": 0.3})
        ids = m.index_jsonl(path)
        assert ids == ["a1", "a2", "a3"]
        assert m.num_docs == 3
        top, probs = m.retrieve_texts("dog training", k=1)
        assert ids[int(top[0])] == "a2"
        # title weight dominates: "fox hunting" title should beat the
        # body-only "foxes hunt" mention
        top2, _ = m.retrieve_texts("fox hunting", k=2)
        assert ids[int(top2[0])] == "a1"

    def test_requires_title_body_fields(self, tmp_path):
        from bayesian_bm25_tpu import MultiFieldScorer

        path, _ = self._write(tmp_path)
        with pytest.raises(ValueError, match="title"):
            MultiFieldScorer(fields=["headline", "body"]).index_jsonl(path)


@needs_native
class TestNativeMemoryStability:
    """Repeated native calls must not leak: encoder results and jsonl
    results are freed in finally blocks, vocab handles in __del__."""

    def test_rss_stable_over_repeated_calls(self, tmp_path):
        import resource

        from bayesian_bm25_tpu.engine import index as eidx

        rows = [{"_id": f"d{i}", "text": "alpha beta gamma delta " * 20}
                for i in range(200)]
        p = tmp_path / "c.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        corpus = [["alpha", "beta", f"t{i % 50}"] for i in range(500)]
        idx = eidx.build_index(corpus)
        enc = eidx.get_native_encoder(idx)
        queries = [["alpha", f"t{i % 50}"] for i in range(64)]

        def roundtrip():
            load_jsonl_native(str(p))
            if enc is not None:
                enc.encode_tokens(queries)

        for _ in range(5):
            roundtrip()  # warm allocator
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        for _ in range(300):
            roundtrip()
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # ru_maxrss is KB on Linux; 300 leaked copies of a ~100 KB blob
        # would add ~30 MB. Allow 8 MB of allocator noise.
        assert rss1 - rss0 < 8192, f"RSS grew {rss1 - rss0} KB"


@needs_native
class TestIdEdgeCases:
    """Advisor findings: numeric _id values must be kept (stringified, as
    the Python fallback does), and invalid-UTF-8 ids (lone surrogates)
    must not raise mid-load."""

    def test_numeric_id_kept(self, tmp_path):
        p = tmp_path / "num.jsonl"
        p.write_text('{"_id": 1, "title": "", "text": "int id doc"}\n'
                     '{"_id": "2", "title": "", "text": "str id doc"}\n'
                     '{"_id": 3.5, "title": "", "text": "float id doc"}\n'
                     '{"_id": true, "title": "", "text": "bool id doc"}\n')
        ids, titles, texts = load_jsonl_native(str(p))
        assert ids == ["1", "2", "3.5", "true"]
        assert list(texts) == ["int id doc", "str id doc", "float id doc",
                               "bool id doc"]

    def test_numeric_id_matches_python_fallback(self, tmp_path):
        rows = [{"_id": 7, "text": "native and python must agree"},
                {"_id": "8", "text": "on id-kept document sets"}]
        p = tmp_path / "mix.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        ids, _, texts = load_jsonl_native(str(p))
        py_ids = [str(r["_id"]) for r in rows]
        assert ids == py_ids

    def test_lone_surrogate_id_does_not_raise(self, tmp_path):
        p = tmp_path / "sur.jsonl"
        p.write_text('{"_id": "a\\ud800b", "title": "", "text": "t1"}\n'
                     '{"_id": "ok", "title": "", "text": "t2"}\n')
        ids, _, texts = load_jsonl_native(str(p))
        assert len(ids) == 2
        assert ids[1] == "ok"
        assert list(texts) == ["t1", "t2"]

    def test_object_id_dropped(self, tmp_path):
        """A structured _id has no string form worth inventing: drop it
        (both loaders treat it as missing)."""
        p = tmp_path / "obj.jsonl"
        p.write_text('{"_id": {"x": 1}, "text": "dropped"}\n'
                     '{"_id": "kept", "text": "kept doc"}\n')
        ids, _, texts = load_jsonl_native(str(p))
        assert ids == ["kept"]

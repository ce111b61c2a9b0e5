"""MultiFieldScorer tests: fusion semantics, single-field equivalence."""

import numpy as np
import pytest

from bayesian_bm25_tpu import MultiFieldScorer
from bayesian_bm25_tpu.models.probability import logit, sigmoid


@pytest.fixture(scope="module")
def docs():
    return [
        {"title": "machine learning basics".split(),
         "body": "an introduction to statistical learning methods".split()},
        {"title": "cooking pasta at home".split(),
         "body": "boil water add salt cook the pasta al dente".split()},
        {"title": "deep neural networks".split(),
         "body": "layers of neurons learn hierarchical features".split()},
        {"title": "garden vegetables guide".split(),
         "body": "tomatoes and peppers grow well in warm weather".split()},
    ]


class TestConstruction:
    def test_validation(self):
        with pytest.raises(ValueError):
            MultiFieldScorer([])
        with pytest.raises(ValueError):
            MultiFieldScorer(["a", "a"])
        with pytest.raises(ValueError):
            MultiFieldScorer(["a", "b"], field_weights={"a": 0.9, "b": 0.9})
        with pytest.raises(ValueError):
            MultiFieldScorer(["a", "b"], field_weights={"a": 1.0})

    def test_uniform_default_weights(self):
        mf = MultiFieldScorer(["title", "body"])
        assert mf.field_weights == {"title": 0.5, "body": 0.5}

    def test_missing_field_in_doc(self, docs):
        mf = MultiFieldScorer(["title", "body"])
        bad = docs + [{"title": ["x"]}]
        with pytest.raises(ValueError):
            mf.index(bad, show_progress=False)


class TestSearch:
    def test_fused_probabilities(self, docs):
        mf = MultiFieldScorer(["title", "body"])
        mf.index(docs, show_progress=False)
        probs = mf.get_probabilities("neural networks".split())
        assert probs.shape == (4,)
        assert np.argmax(probs) == 2

    def test_retrieve_sorted(self, docs):
        mf = MultiFieldScorer(["title", "body"])
        mf.index(docs, show_progress=False)
        ids, probs = mf.retrieve("pasta cooking".split(), k=2)
        assert ids[0] == 1
        assert probs[0] >= probs[1]

    def test_fusion_formula(self, docs):
        """Fused output equals weighted log-odds conjunction of field probs."""
        mf = MultiFieldScorer(["title", "body"],
                              field_weights={"title": 0.7, "body": 0.3})
        mf.index(docs, show_progress=False)
        q = "learning".split()
        p_t = mf.scorers["title"].get_probabilities(q)
        p_b = mf.scorers["body"].get_probabilities(q)
        x = np.column_stack([p_t, p_b])
        x = np.clip(x, 1e-10, 1 - 1e-10)
        expected = np.asarray(sigmoid(
            (2 ** 0.5) * (0.7 * np.asarray(logit(x[:, 0]))
                          + 0.3 * np.asarray(logit(x[:, 1])))
        ))
        np.testing.assert_allclose(mf.get_probabilities(q), expected, rtol=1e-6)

    def test_field_weight_bias(self, docs):
        """Up-weighting the title favors title matches."""
        title_heavy = MultiFieldScorer(
            ["title", "body"], field_weights={"title": 0.95, "body": 0.05})
        body_heavy = MultiFieldScorer(
            ["title", "body"], field_weights={"title": 0.05, "body": 0.95})
        title_heavy.index(docs, show_progress=False)
        body_heavy.index(docs, show_progress=False)
        # "warm" appears only in doc 3's body
        q = ["warm"]
        assert body_heavy.get_probabilities(q)[3] > \
            title_heavy.get_probabilities(q)[3]

    def test_add_documents(self, docs):
        mf = MultiFieldScorer(["title", "body"])
        mf.index(docs, show_progress=False)
        mf.add_documents([{"title": "quantum computing".split(),
                           "body": "qubits entanglement superposition".split()}],
                         show_progress=False)
        assert mf.num_docs == 5
        ids, _ = mf.retrieve(["qubits"], k=1)
        assert ids[0] == 4

    def test_requires_index(self):
        mf = MultiFieldScorer(["a"])
        with pytest.raises(RuntimeError):
            mf.get_probabilities(["x"])
        with pytest.raises(RuntimeError):
            mf.add_documents([{"a": ["x"]}])


class TestMultiFieldAtScale:
    def test_split_engaged_per_field_and_consistent(self):
        """Fields with vocab > 256 terms build split indexes; fused output
        matches the per-field dense probabilities composition."""
        import numpy as np

        from bayesian_bm25_tpu.ops.fusion import resolve_alpha

        rng = np.random.default_rng(2)
        docs = [
            {"title": [f"t{t}" for t in rng.zipf(1.4, size=6) % 400],
             "body": [f"b{t}" for t in rng.zipf(1.4, size=40) % 600]}
            for _ in range(250)
        ]
        mf = MultiFieldScorer(["title", "body"])
        mf.index(docs, show_progress=False)
        assert mf.scorers["body"]._split is not None
        q = docs[9]["body"][:4]
        fused = mf.get_probabilities(q)
        p_t = mf.scorers["title"].get_probabilities(q)
        p_b = mf.scorers["body"].get_probabilities(q)
        from bayesian_bm25_tpu import log_odds_conjunction

        expected = np.asarray(log_odds_conjunction(
            np.column_stack([p_t, p_b]),
            alpha=resolve_alpha("auto", 0.5),
            weights=np.array([0.5, 0.5])))
        np.testing.assert_allclose(fused, expected, rtol=1e-6)
        # batched path agrees with the single-query path
        batch = mf.get_probabilities_batch([q, ["b1"]])
        np.testing.assert_allclose(batch[0], fused, rtol=1e-6)

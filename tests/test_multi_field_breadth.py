"""MultiFieldScorer + calibrator breadth (ref tests/test_multi_field.py,
tests/test_calibration.py classes not covered elsewhere)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import (
    BayesianBM25Scorer,
    MultiFieldScorer,
    PlattCalibrator,
    IsotonicCalibrator,
    log_odds_conjunction,
)


@pytest.fixture(scope="module")
def docs():
    return [
        {"title": ["fox", "hunting"], "body": ["the", "quick", "brown",
                                               "fox", "jumps", "high"]},
        {"title": ["dog", "training"], "body": ["dogs", "learn", "commands",
                                                "with", "patience"]},
        {"title": ["animal", "facts"], "body": ["foxes", "and", "dogs",
                                                "are", "animals"]},
        {"title": ["night", "sky"], "body": ["stars", "shine", "at",
                                             "night"]},
    ]


@pytest.fixture(scope="module")
def mf(docs):
    m = MultiFieldScorer(fields=["title", "body"])
    m.index(docs, show_progress=False)
    return m


class TestMultiFieldSurface:
    def test_properties(self, mf, docs):
        assert mf.num_docs == len(docs)
        assert mf.fields == ["title", "body"]
        assert mf.field_weights == {"title": 0.5, "body": 0.5}

    def test_get_probabilities_shape(self, mf, docs):
        p = mf.get_probabilities(["fox"])
        assert p.shape == (len(docs),)
        assert np.all((p >= 0) & (p <= 1))

    def test_custom_field_weights(self, docs):
        m = MultiFieldScorer(fields=["title", "body"],
                             field_weights={"title": 0.9, "body": 0.1})
        m.index(docs, show_progress=False)
        assert m.field_weights["title"] == 0.9

    def test_single_field_fusion_of_one_signal(self, docs):
        """A one-field scorer fuses a single signal: ranking must match
        the plain scorer on that field (ref test_multi_field.py:106)."""
        m = MultiFieldScorer(fields=["body"])
        m.index(docs, show_progress=False)
        plain = BayesianBM25Scorer()
        plain.index([d["body"] for d in docs], show_progress=False)
        q = ["quick", "fox"]
        mf_probs = m.get_probabilities(q)
        plain_probs = plain.get_probabilities(q)
        # same auto-estimation protocol per field -> same ordering
        assert list(np.argsort(-mf_probs)) == list(np.argsort(-plain_probs))

    def test_duplicate_fields_raises(self):
        with pytest.raises(ValueError):
            MultiFieldScorer(fields=["title", "title"])

    def test_empty_fields_raises(self):
        with pytest.raises(ValueError):
            MultiFieldScorer(fields=[])

    def test_weights_missing_key_raises(self):
        with pytest.raises(ValueError):
            MultiFieldScorer(fields=["title", "body"],
                             field_weights={"title": 1.0})

    def test_weights_bad_sum_raises(self):
        with pytest.raises(ValueError):
            MultiFieldScorer(fields=["title", "body"],
                             field_weights={"title": 0.9, "body": 0.9})

    def test_add_documents_before_index_raises(self):
        with pytest.raises(RuntimeError):
            MultiFieldScorer(fields=["title"]).add_documents(
                [{"title": ["x"]}])

    def test_retrieve_finds_title_match(self, mf):
        ids, probs = mf.retrieve(["training"], k=1)
        assert ids[0] == 1


class TestPlattSurface:
    def test_default_parameters_identity_shape(self):
        c = PlattCalibrator()
        # default a=1, b=0 -> calibrate(s) = sigmoid(s)
        assert c.calibrate(0.0) == pytest.approx(0.5, rel=1e-6)

    def test_output_range_extreme(self):
        c = PlattCalibrator()
        out = c.calibrate(np.array([-1e4, 0.0, 1e4]))
        assert np.all((out >= 0) & (out <= 1))
        assert out[0] == pytest.approx(0.0, abs=1e-6)
        assert out[2] == pytest.approx(1.0, abs=1e-6)

    def test_output_feeds_log_odds_conjunction(self):
        rng = np.random.default_rng(0)
        scores = rng.normal(0, 2, 50)
        c = PlattCalibrator()
        labels = (scores > 0).astype(float)
        c.fit(scores, labels)
        p = np.clip(c.calibrate(scores), 1e-6, 1 - 1e-6)
        other = rng.uniform(0.2, 0.8, 50)
        fused = log_odds_conjunction(np.stack([p, other], axis=-1))
        assert fused.shape == (50,)
        assert np.all((fused > 0) & (fused < 1))


class TestIsotonicSurface:
    def test_calibrate_before_fit_raises(self):
        with pytest.raises(RuntimeError):
            IsotonicCalibrator().calibrate(0.5)

    def test_extreme_scores_clamped_to_endpoint_values(self):
        c = IsotonicCalibrator()
        scores = np.linspace(0, 1, 20)
        labels = (scores > 0.5).astype(float)
        c.fit(scores, labels)
        lo = float(np.asarray(c.calibrate(-100.0)))
        hi = float(np.asarray(c.calibrate(100.0)))
        assert lo == pytest.approx(float(np.asarray(c.calibrate(0.0))),
                                   abs=1e-9)
        assert hi == pytest.approx(float(np.asarray(c.calibrate(1.0))),
                                   abs=1e-9)

    def test_callable(self):
        c = IsotonicCalibrator()
        scores = np.linspace(0, 1, 10)
        c.fit(scores, (scores > 0.3).astype(float))
        np.testing.assert_allclose(np.asarray(c(scores)),
                                   np.asarray(c.calibrate(scores)))

    def test_output_feeds_log_odds_conjunction(self):
        rng = np.random.default_rng(1)
        scores = rng.uniform(0, 1, 60)
        labels = (rng.uniform(size=60) < scores).astype(float)
        c = IsotonicCalibrator()
        c.fit(scores, labels)
        p = np.clip(np.asarray(c.calibrate(scores)), 1e-6, 1 - 1e-6)
        fused = log_odds_conjunction(
            np.stack([p, np.full(60, 0.6)], axis=-1))
        assert np.all((fused > 0) & (fused < 1))

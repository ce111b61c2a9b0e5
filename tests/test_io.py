"""save_model / load_model round-trip tests."""

import numpy as np
import pytest

import jax

from bayesian_bm25_tpu import (
    AttentionLogOddsWeights,
    BayesianProbabilityTransform,
    IsotonicCalibrator,
    LearnableLogOddsWeights,
    MultiHeadAttentionLogOddsWeights,
    PlattCalibrator,
    TemporalBayesianTransform,
)
from bayesian_bm25_tpu.utils.io import load_model, save_model


def _path(tmp_path, name):
    return str(tmp_path / f"{name}.npz")


class TestRoundTrips:
    def test_transform(self, tmp_path):
        t = BayesianProbabilityTransform(alpha=1.3, beta=2.1, base_rate=0.02)
        t.update(3.0, 1.0)
        save_model(_path(tmp_path, "t"), t)
        t2 = load_model(_path(tmp_path, "t"))
        assert type(t2) is BayesianProbabilityTransform
        assert t2.alpha == t.alpha and t2.beta == t.beta
        assert t2.base_rate == t.base_rate
        assert t2._n_updates == t._n_updates
        s = np.array([1.0, 4.0])
        np.testing.assert_allclose(
            t2.score_to_probability(s, np.ones(2), np.ones(2)),
            t.score_to_probability(s, np.ones(2), np.ones(2)),
        )
        # online state survives: identical next update
        t.update(2.0, 0.0)
        t2.update(2.0, 0.0)
        assert t2.alpha == pytest.approx(t.alpha, rel=1e-12)

    def test_transform_none_base_rate(self, tmp_path):
        t = BayesianProbabilityTransform()
        save_model(_path(tmp_path, "t"), t)
        assert load_model(_path(tmp_path, "t")).base_rate is None

    def test_temporal(self, tmp_path):
        t = TemporalBayesianTransform(decay_half_life=50.0)
        t.update(1.0, 1.0)
        save_model(_path(tmp_path, "t"), t)
        t2 = load_model(_path(tmp_path, "t"))
        assert type(t2) is TemporalBayesianTransform
        assert t2.decay_half_life == 50.0
        assert t2.timestamp == 1

    def test_learnable(self, tmp_path):
        lw = LearnableLogOddsWeights(3, alpha=0.5, base_rate=0.1)
        lw.update(np.array([0.8, 0.2, 0.5]), 1.0)
        save_model(_path(tmp_path, "lw"), lw)
        lw2 = load_model(_path(tmp_path, "lw"))
        p = np.array([0.6, 0.7, 0.4])
        assert lw2(p) == pytest.approx(lw(p), rel=1e-12)
        np.testing.assert_array_equal(lw2.averaged_weights, lw.averaged_weights)

    def test_attention(self, tmp_path):
        a = AttentionLogOddsWeights(2, 3, seed=5, normalize=True)
        rng = np.random.default_rng(0)
        a.update(rng.uniform(0.1, 0.9, (4, 2)), np.ones(4),
                 rng.normal(0, 1, (4, 3)))
        save_model(_path(tmp_path, "a"), a)
        a2 = load_model(_path(tmp_path, "a"))
        probs = rng.uniform(0.1, 0.9, (5, 2))
        qf = rng.normal(0, 1, (5, 3))
        np.testing.assert_allclose(a2(probs, qf), a(probs, qf), rtol=1e-12)
        np.testing.assert_allclose(
            a2(probs, qf, use_averaged=True), a(probs, qf, use_averaged=True),
            rtol=1e-12,
        )

    def test_multihead(self, tmp_path):
        mh = MultiHeadAttentionLogOddsWeights(3, 2, 3)
        rng = np.random.default_rng(1)
        mh.fit(rng.uniform(0.1, 0.9, (20, 2)),
               rng.integers(0, 2, 20).astype(float),
               rng.normal(0, 1, (20, 3)), max_iterations=10)
        save_model(_path(tmp_path, "mh"), mh)
        mh2 = load_model(_path(tmp_path, "mh"))
        probs = rng.uniform(0.1, 0.9, (4, 2))
        qf = rng.normal(0, 1, (4, 3))
        np.testing.assert_allclose(mh2(probs, qf), mh(probs, qf), rtol=1e-12)

    def test_platt(self, tmp_path):
        c = PlattCalibrator(a=2.0, b=-1.0)
        save_model(_path(tmp_path, "p"), c)
        c2 = load_model(_path(tmp_path, "p"))
        assert c2.a == 2.0 and c2.b == -1.0

    def test_isotonic(self, tmp_path):
        c = IsotonicCalibrator()
        c.fit(np.array([0.0, 1.0, 2.0, 3.0]), np.array([0.0, 0.0, 1.0, 1.0]))
        save_model(_path(tmp_path, "i"), c)
        c2 = load_model(_path(tmp_path, "i"))
        xs = np.linspace(-1, 4, 20)
        np.testing.assert_allclose(c2.calibrate(xs), c.calibrate(xs))

    def test_unfitted_isotonic_raises(self, tmp_path):
        with pytest.raises(ValueError):
            save_model(_path(tmp_path, "i"), IsotonicCalibrator())

    def test_unknown_type_raises(self, tmp_path):
        with pytest.raises(TypeError):
            save_model(_path(tmp_path, "x"), object())


class TestScorerCheckpoint:
    def test_save_load_round_trip(self, tmp_path):
        import numpy as np

        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        rng = np.random.default_rng(0)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=30) % 500]
                  for _ in range(200)]
        s = BayesianBM25Scorer(base_rate=0.02, method="lucene")
        s.index(corpus, show_progress=False)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, s)
        s2 = load_scorer(path)
        assert s2.num_docs == s.num_docs
        assert s2.transform.alpha == pytest.approx(s.transform.alpha)
        assert s2.base_rate == s.base_rate
        q = [corpus[3][:4], ["t1", "t7"]]
        np.testing.assert_allclose(
            s2.retrieve(q, k=5)[1], s.retrieve(q, k=5)[1], rtol=1e-6)
        np.testing.assert_allclose(
            s2.get_probabilities(q[0]), s.get_probabilities(q[0]), rtol=1e-6)

    def test_unfitted_raises(self, tmp_path):
        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import save_scorer

        with pytest.raises(ValueError):
            save_scorer(str(tmp_path / "x.npz"), BayesianBM25Scorer())

    def test_load_populates_host_mirrors(self, tmp_path):
        """load_scorer must set the numpy host mirrors: the split
        accelerator (and any future append) otherwise pulls the full
        device tables back over the interconnect on first use."""
        import numpy as np

        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        rng = np.random.default_rng(1)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=20) % 300]
                  for _ in range(150)]
        s = BayesianBM25Scorer()
        s.index(corpus, show_progress=False)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, s)
        s2 = load_scorer(path)
        idx = s2.bm25_index
        assert isinstance(idx.term_ids_host, np.ndarray)
        assert isinstance(idx.weights_host, np.ndarray)
        assert isinstance(idx.doc_lengths_host, np.ndarray)
        np.testing.assert_array_equal(idx.term_ids_host,
                                      np.asarray(idx.term_ids))


class TestShardedLoad:
    """load_scorer(n_devices=/mesh_shape=) restores a checkpoint into a
    ShardedBayesianBM25Scorer: multi-chip serving from a single-chip
    archive, including doc-axis re-padding for meshes that don't divide
    the archived padding."""

    @pytest.fixture(scope="class")
    def saved(self, tmp_path_factory):
        import numpy as np

        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import save_scorer

        rng = np.random.default_rng(41)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=30) % 600]
                  for _ in range(250)]
        queries = [corpus[i][:5] for i in range(0, 60, 9)] + [[], ["t599"]]
        s = BayesianBM25Scorer(base_rate="auto")
        s.index(corpus, show_progress=False)
        path = str(tmp_path_factory.mktemp("ckpt") / "scorer.npz")
        save_scorer(path, s)
        return path, s, queries

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual devices")
    def test_load_1d_mesh_matches_single(self, saved):
        import numpy as np

        from bayesian_bm25_tpu import ShardedBayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer

        path, single, queries = saved
        sh = load_scorer(path, n_devices=8)
        assert isinstance(sh, ShardedBayesianBM25Scorer)
        assert len(sh._index.term_ids.sharding.device_set) == 8
        ids_a, probs_a = single.retrieve(queries, k=7)
        ids_b, probs_b = sh.retrieve(queries, k=7)
        np.testing.assert_array_equal(np.asarray(ids_a),
                                      np.asarray(ids_b))
        np.testing.assert_allclose(np.asarray(probs_a),
                                   np.asarray(probs_b), rtol=1e-6)

    @pytest.mark.skipif(len(jax.devices()) < 3,
                        reason="needs 3 virtual devices")
    def test_load_repads_non_dividing_mesh(self, saved):
        import numpy as np

        from bayesian_bm25_tpu.parallel.sharded import make_mesh
        from bayesian_bm25_tpu.utils.io import load_scorer

        path, single, queries = saved
        sh = load_scorer(path, mesh=make_mesh(3))
        D_pad = sh._index.term_ids.shape[0]
        assert D_pad % 3 == 0  # re-padded to lcm(2048, 3)
        assert sh.num_docs == single.num_docs
        ids_a, _ = single.retrieve(queries, k=7)
        ids_b, _ = sh.retrieve(queries, k=7)
        np.testing.assert_array_equal(np.asarray(ids_a),
                                      np.asarray(ids_b))

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual devices")
    def test_load_int8_archive_sharded(self, tmp_path):
        import numpy as np

        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        rng = np.random.default_rng(43)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=25) % 500]
                  for _ in range(200)]
        s = BayesianBM25Scorer(base_rate=0.03, impact_storage="int8")
        s.index(corpus, show_progress=False)
        path = str(tmp_path / "i8.npz")
        save_scorer(path, s)
        sh = load_scorer(path, n_devices=8)
        assert sh._split.impact_scale is not None
        queries = [corpus[i][:4] for i in range(0, 40, 7)]
        ids_a, _ = s.retrieve(queries, k=6)
        ids_b, _ = sh.retrieve(queries, k=6)
        np.testing.assert_array_equal(np.asarray(ids_a),
                                      np.asarray(ids_b))


class TestTokOptsRoundTrip:
    """Checkpoint round-trips must preserve index-time tokenizer options:
    retrieve_texts after load must tokenize queries exactly as at index
    time (advisor finding: stem/stopword drift silently changed
    probabilities after save/load)."""

    def test_tok_opts_persist(self, tmp_path):
        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        texts = [
            "the running dogs are quickly jumping over lazy foxes",
            "a runner runs while dogs bark at the running water",
            "information retrieval systems running probabilistic ranking",
            "dogs and foxes running through the misty forest tonight",
        ] * 4
        s = BayesianBM25Scorer()
        s.index_texts(texts, stem=False, remove_stopwords=False)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, s)
        s2 = load_scorer(path)
        assert s2._tok_opts == s._tok_opts
        q = ["the running dogs"]
        np.testing.assert_allclose(
            s2.retrieve_texts(q)[1], s.retrieve_texts(q)[1], rtol=1e-6)

    def test_legacy_archive_defaults(self, tmp_path):
        """Archives without tok_opts (v1/v2) load with default options."""
        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        s = BayesianBM25Scorer()
        s.index_texts(["alpha beta gamma", "beta gamma delta"] * 3)
        path = str(tmp_path / "scorer.npz")
        save_scorer(path, s)
        # Simulate a legacy archive by stripping the tok_opts entry.
        data = dict(np.load(path, allow_pickle=False))
        del data["tok_opts"]
        np.savez(path, **data)
        s2 = load_scorer(path)
        assert s2._tok_opts == dict(lowercase=True, remove_stopwords=True,
                                    stem=True)

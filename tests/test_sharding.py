"""Multi-device sharding tests on the 8-way virtual CPU mesh.

Validates that document-sharded retrieval and training match the
single-device path exactly — the distributed layer must be a pure
performance transform (SURVEY §7.8).
"""

import numpy as np
import pytest

import jax

from bayesian_bm25_tpu.engine import index as eidx, scoring
from bayesian_bm25_tpu.parallel import sharded


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    V, D, L = 500, 64, 30
    corpus = [[f"t{t}" for t in rng.integers(0, V, L)] for _ in range(D)]
    # doc_pad_multiple=8 so the table splits evenly over 8 devices
    idx = eidx.build_index(corpus, doc_pad_multiple=8, pad_multiple=8)
    queries = [[f"t{t}" for t in rng.integers(0, V, 5)] for _ in range(6)]
    qids, qcnt = eidx.encode_queries(queries, idx.vocab)
    return idx, qids, qcnt


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestShardedRetrieve:
    def test_matches_single_device(self, setup):
        idx, qids, qcnt = setup
        mesh = sharded.make_mesh()
        tids, w, dl = sharded.shard_index_arrays(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths
        )
        k = 5
        ids_s, probs_s, scores_s = sharded.sharded_retrieve_topk(
            mesh, tids, w, dl, idx.avgdl, qids, qcnt, k, 1.0, 2.0, 0.05
        )
        ids_1, probs_1, scores_1, _ = scoring.retrieve_topk(
            idx.term_ids, idx.weights, idx.doc_lengths, idx.avgdl,
            qids, qcnt, k, 1.0, 2.0, 0.05,
        )
        np.testing.assert_allclose(
            np.asarray(scores_s), np.asarray(scores_1), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(probs_s), np.asarray(probs_1), rtol=1e-6
        )
        # ids may differ on exact ties; require same score multiset
        np.testing.assert_allclose(
            np.sort(np.asarray(scores_s), axis=1),
            np.sort(np.asarray(scores_1), axis=1), rtol=1e-6,
        )

    def test_two_device_mesh(self, setup):
        idx, qids, qcnt = setup
        mesh = sharded.make_mesh(2)
        tids, w, dl = sharded.shard_index_arrays(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths
        )
        ids_s, probs_s, _ = sharded.sharded_retrieve_topk(
            mesh, tids, w, dl, idx.avgdl, qids, qcnt, 3, 1.0, 2.0
        )
        assert np.asarray(ids_s).shape == (qids.shape[0], 3)


class TestCorpusStats:
    def test_psum_stats_match_host(self, setup):
        idx, _, _ = setup
        mesh = sharded.make_mesh()
        tids, w, dl = sharded.shard_index_arrays(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths
        )
        n, avgdl, df = sharded.corpus_stats_psum(mesh, dl, tids, idx.n_terms)
        # Stats include pad rows (length avgdl, no terms) — compare on the
        # padded table, which is what the device sees.
        D_pad = idx.term_ids.shape[0]
        assert float(n) == D_pad
        expected_avgdl = float(np.mean(np.asarray(idx.doc_lengths)))
        assert float(avgdl) == pytest.approx(expected_avgdl, rel=1e-6)
        np.testing.assert_array_equal(np.asarray(df), idx.doc_frequencies)


class TestShardedTraining:
    def test_step_decreases_loss_and_matches_grads(self, setup):
        idx, qids, qcnt = setup
        rng = np.random.default_rng(0)
        mesh = sharded.make_mesh()
        tids, w, dl = sharded.shard_index_arrays(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths
        )
        D_pad = idx.term_ids.shape[0]
        labels = (rng.uniform(size=(qids.shape[0], D_pad)) < 0.1).astype(np.float32)

        a1, b1, loss1 = sharded.sharded_train_step(
            mesh, tids, w, dl, idx.avgdl, qids, qcnt, labels, 1.0, 2.0,
            learning_rate=0.1,
        )
        a2, b2, loss2 = sharded.sharded_train_step(
            mesh, tids, w, dl, idx.avgdl, qids, qcnt, labels,
            float(a1), float(b1), learning_rate=0.1,
        )
        assert float(loss2) <= float(loss1) + 1e-9

        # Gradient parity vs single-device autodiff
        scores, _ = scoring.score_all_xla(idx.term_ids, idx.weights, qids, qcnt)
        import jax.numpy as jnp
        from bayesian_bm25_tpu.ops.mathx import clamp_probability, sigmoid

        def loss_fn(params):
            a, b = params
            L = clamp_probability(sigmoid(a * (jnp.asarray(scores) - b)))
            y = jnp.asarray(labels)
            return -jnp.mean(y * jnp.log(L) + (1 - y) * jnp.log1p(-L))

        g = jax.grad(loss_fn)((1.0, 2.0))
        expected_a1 = 1.0 - 0.1 * float(g[0])
        expected_b1 = 2.0 - 0.1 * float(g[1])
        assert float(a1) == pytest.approx(expected_a1, rel=1e-5)
        assert float(b1) == pytest.approx(expected_b1, rel=1e-5)


class TestShardedSplit:
    def test_split_sharded_matches_single_device(self, setup):
        from bayesian_bm25_tpu.engine import split_index as sidx

        idx, qids, qcnt = setup
        # rebuild queries from the fixture's encoding is lossy; use raw ids
        split = sidx.build_split_index(idx, n_frequent=128, enable_overflow=False)
        # re-encode from token lists reconstructed from the vocab
        inv = {v: k for k, v in idx.vocab.items()}
        queries = []
        for row, cnts in zip(np.asarray(qids), np.asarray(qcnt)):
            toks = []
            for tid, c in zip(row, cnts):
                if tid >= 0:
                    toks.extend([inv[int(tid)]] * int(c))
            queries.append(toks)
        enc = sidx.encode_queries_split(queries, split)

        single = sidx.retrieve_topk_split(
            split.dense_impact, split.dense_presence, split.tail_term_ids,
            split.tail_weights, idx.doc_lengths, idx.avgdl, *enc, 5,
            1.0, 2.0, 0.05, n_docs=idx.n_docs)

        mesh = sharded.make_mesh()
        imp, pres, tids_s, tw = sharded.shard_split_index_arrays(mesh, split)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        dl = jax.device_put(idx.doc_lengths, NamedSharding(mesh, P("d")))
        ids_s, probs_s, scores_s = sharded.sharded_retrieve_topk_split(
            mesh, imp, pres, tids_s, tw, dl, idx.avgdl, *enc, 5,
            1.0, 2.0, 0.05)
        np.testing.assert_allclose(
            np.asarray(scores_s), np.asarray(single[2]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(probs_s), np.asarray(single[1]), rtol=1e-5)


class TestMesh2D:
    def test_qxd_mesh_matches_single_device(self, setup):
        idx, qids, qcnt = setup
        # 6 queries don't split over 4 'q' shards evenly; use 8 queries
        qids8 = np.concatenate([qids, qids[:2]])
        qcnt8 = np.concatenate([qcnt, qcnt[:2]])
        mesh = sharded.make_mesh_2d(4, 2)
        ids2, probs2, scores2 = sharded.sharded_retrieve_topk_2d(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths, idx.avgdl,
            qids8, qcnt8, 5, 1.0, 2.0, 0.05)
        single = scoring.retrieve_topk(
            idx.term_ids, idx.weights, idx.doc_lengths, idx.avgdl,
            qids8, qcnt8, 5, 1.0, 2.0, 0.05)
        np.testing.assert_allclose(
            np.asarray(scores2), np.asarray(single[2]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(probs2), np.asarray(single[1]), rtol=1e-6)

    def test_too_few_devices_raises(self):
        with pytest.raises(ValueError):
            sharded.make_mesh_2d(4, 4)

    def test_qxd_split_kernel_matches_single_device(self, setup):
        """2-D mesh on the production split kernel: queries shard over
        'q' (tail rows scatter only inside their local slice), split
        tables over 'd'."""
        from bayesian_bm25_tpu.engine import split_index as sidx

        idx, qids, qcnt = setup
        split = sidx.build_split_index(idx, n_frequent=128,
                                       enable_overflow=False)
        inv = {v: k for k, v in idx.vocab.items()}
        queries = []
        for row, cnts in zip(np.asarray(qids), np.asarray(qcnt)):
            toks = []
            for tid, c in zip(row, cnts):
                if tid >= 0:
                    toks.extend([inv[int(tid)]] * int(c))
            queries.append(toks)
        queries = queries + queries[:2]  # 8 queries -> 4-way 'q' split
        enc = sidx.encode_queries_split(queries, split)

        single = sidx.retrieve_topk_split(
            split.dense_impact, split.dense_presence, split.tail_term_ids,
            split.tail_weights, idx.doc_lengths, idx.avgdl, *enc, 5,
            1.0, 2.0, 0.05, n_docs=idx.n_docs)

        mesh = sharded.make_mesh_2d(4, 2)
        ids2, probs2, scores2 = sharded.sharded_retrieve_topk_split_2d(
            mesh, split.dense_impact, split.dense_presence,
            split.tail_term_ids, split.tail_weights, idx.doc_lengths,
            idx.avgdl, *enc, 5, 1.0, 2.0, 0.05, n_docs=idx.n_docs)
        np.testing.assert_allclose(
            np.asarray(scores2), np.asarray(single[2]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(probs2), np.asarray(single[1]), rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(ids2), np.asarray(single[0]))


class TestShardedFit:
    def test_matches_single_device_fit(self):
        from bayesian_bm25_tpu import BayesianProbabilityTransform

        rng = np.random.default_rng(7)
        n = 4096  # divisible by 8 shards
        scores = rng.normal(1.0, 2.0, n).astype(np.float32)
        p = 1 / (1 + np.exp(-1.5 * (scores - 1.0)))
        labels = (rng.uniform(size=n) < p).astype(np.float32)

        mesh = sharded.make_mesh()
        a, b, it = sharded.sharded_fit_transform(
            mesh, scores, labels, alpha0=0.5, beta0=0.0,
            learning_rate=0.1, max_iterations=500)

        t = BayesianProbabilityTransform(alpha=0.5, beta=0.0)
        t.fit(scores.astype(np.float64), labels.astype(np.float64),
              learning_rate=0.1, max_iterations=500)
        assert float(a) == pytest.approx(t.alpha, rel=1e-3)
        assert float(b) == pytest.approx(t.beta, rel=1e-3, abs=1e-3)

    def test_prior_aware_mode(self):
        from bayesian_bm25_tpu.ops.transform import composite_prior

        rng = np.random.default_rng(8)
        n = 2048
        scores = rng.normal(1.0, 2.0, n).astype(np.float32)
        labels = rng.integers(0, 2, n).astype(np.float32)
        tfs = rng.integers(0, 10, n).astype(np.float32)
        dlr = rng.uniform(0.3, 1.5, n).astype(np.float32)
        priors = np.asarray(composite_prior(tfs, dlr), dtype=np.float32)
        mesh = sharded.make_mesh()
        a, b, it = sharded.sharded_fit_transform(
            mesh, scores, labels, prior_aware=True, priors=priors,
            learning_rate=0.05, max_iterations=200)
        assert np.isfinite(float(a)) and np.isfinite(float(b))
        assert int(it) > 0


class TestShardedTrainStepSplit:
    def test_matches_compare_path_step(self, setup):
        """The split-kernel training step must produce the same GD update
        as the doc-major step (their per-shard scores are equal)."""
        from bayesian_bm25_tpu.engine import split_index as sidx

        idx, qids, qcnt = setup
        split = sidx.build_split_index(idx, n_frequent=128,
                                       enable_overflow=False)
        inv = {v: k for k, v in idx.vocab.items()}
        queries = []
        for row, cnts in zip(np.asarray(qids), np.asarray(qcnt)):
            toks = []
            for tid, c in zip(row, cnts):
                if tid >= 0:
                    toks.extend([inv[int(tid)]] * int(c))
            queries.append(toks)
        enc = sidx.encode_queries_split(queries, split)

        rng = np.random.default_rng(0)
        D_pad = idx.term_ids.shape[0]
        labels = (rng.uniform(size=(qids.shape[0], D_pad))
                  < 0.1).astype(np.float32)

        mesh = sharded.make_mesh()
        a1, b1, l1 = sharded.sharded_train_step(
            mesh, idx.term_ids, idx.weights, idx.doc_lengths, idx.avgdl,
            qids, qcnt, labels, 1.0, 2.0, learning_rate=0.05)
        a2, b2, l2 = sharded.sharded_train_step_split(
            mesh, split.dense_impact, split.dense_presence,
            split.tail_term_ids, split.tail_weights, *enc, labels,
            1.0, 2.0, learning_rate=0.05)
        assert float(a2) == pytest.approx(float(a1), rel=1e-5)
        assert float(b2) == pytest.approx(float(b1), rel=1e-5)
        assert float(l2) == pytest.approx(float(l1), rel=1e-5)

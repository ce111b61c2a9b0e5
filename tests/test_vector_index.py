"""IVF index tests: build stats, nearest-cluster search, exact agreement."""

import numpy as np
import pytest

from bayesian_bm25_tpu.engine.ivf import SimpleIVF


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(0)
    centers = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                        [0.577, 0.577, 0.577]])
    emb = []
    for c in centers:
        emb.append(c + rng.normal(0, 0.05, (50, 3)))
    return np.concatenate(emb).astype(np.float32)


class TestBuild:
    def test_stats(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4, seed=42)
        assert ivf.n_docs == 200
        assert ivf.n_cells == 4
        assert ivf.cell_populations.sum() == 200
        assert len(ivf.background_distances) == 200
        assert ivf.default_nprobe == 2

    def test_auto_cells(self, clustered):
        ivf = SimpleIVF.build(clustered)
        assert ivf.n_cells == max(4, round(np.sqrt(200)))

    def test_centroids_normalized(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        np.testing.assert_allclose(
            np.linalg.norm(ivf.centroids, axis=1), 1.0, rtol=1e-5
        )

    def test_clusters_recovered(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        # Points from the same generator cluster should mostly share a cell
        for g in range(4):
            cells = ivf.assignments[g * 50:(g + 1) * 50]
            _, counts = np.unique(cells, return_counts=True)
            assert counts.max() >= 40

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            SimpleIVF.build(np.empty((0, 3), dtype=np.float32))

    def test_invalid_iterations(self, clustered):
        with pytest.raises(ValueError):
            SimpleIVF.build(clustered, max_iterations=0)


class TestSearch:
    def test_nearest_cluster_found(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        q = np.array([1.0, 0.02, 0.0], dtype=np.float32)
        res = ivf.search(q, k=5)
        assert len(res.indices) == 5
        # winners should come from cluster 0 (docs 0..49)
        assert np.all(res.indices < 50)
        assert np.all(np.diff(res.scores) <= 1e-7)  # sorted desc

    def test_exact_agreement_full_probe(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        q = np.random.default_rng(1).normal(0, 1, 3).astype(np.float32)
        res = ivf.search(q, k=10, nprobe=4)  # probe everything
        qn = q / np.linalg.norm(q)
        exact = ivf.embeddings @ qn
        expected = np.argsort(-exact)[:10]
        np.testing.assert_array_equal(np.sort(res.indices), np.sort(expected))
        np.testing.assert_allclose(res.scores, np.sort(exact)[::-1][:10],
                                   rtol=1e-5)

    def test_score_documents_exact(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        q = np.array([0.0, 1.0, 0.0], dtype=np.float32)
        ids = np.array([0, 50, 100])
        s = ivf.score_documents(q, ids)
        expected = ivf.embeddings[ids] @ q
        np.testing.assert_allclose(s, expected, rtol=1e-5)

    def test_result_metadata(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        q = np.array([1.0, 0, 0], dtype=np.float32)
        res = ivf.search(q, k=3, nprobe=2)
        assert len(res.probed_cell_ids) == 2
        assert len(res.centroid_scores) == 4
        assert res.cell_populations.shape == res.indices.shape
        assert set(res.cell_ids) <= set(res.probed_cell_ids)

    def test_batched_matches_single(self, clustered):
        ivf = SimpleIVF.build(clustered, n_cells=4)
        rng = np.random.default_rng(2)
        queries = rng.normal(0, 1, (5, 3)).astype(np.float32)
        ids_b, scores_b = ivf.search_batch(queries, k=4, nprobe=2)
        assert ids_b.shape == (5, 4)
        for i in range(5):
            res = ivf.search(queries[i], k=4, nprobe=2)
            np.testing.assert_allclose(scores_b[i], res.scores, rtol=1e-5)

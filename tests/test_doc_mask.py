"""Masked retrieval (serving-side tenant/metadata filters).

``retrieve(..., doc_mask=)`` must behave as if masked documents were
not in the corpus at selection time: the returned top-k equals the
brute-force ranking restricted to unmasked docs, unfilled slots come
back as id -1 / probability 0, and the sparse-candidate exactness
argument survives masking (leaders are the top unmasked matmul docs)."""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(0)
    corpus = [[f"t{t}" for t in rng.zipf(1.4, size=30) % 800]
              for _ in range(600)]
    queries = [[f"t{t}" for t in rng.zipf(1.4, size=6) % 800]
               for _ in range(16)]
    s = BayesianBM25Scorer(base_rate="auto")
    s.index(corpus, show_progress=False)
    assert s._split is not None  # the sparse path must be engaged
    return s, queries


def brute_force_masked_topk(scorer, queries, mask, k):
    dense = scorer.get_scores_batch(queries)
    dense = np.where(mask[None, :], dense, -np.inf)
    ids = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    scores = np.take_along_axis(dense, ids, axis=1)
    ids = np.where(np.isfinite(scores), ids, -1)
    return ids, scores


class TestMaskedRetrieve:
    def test_matches_brute_force_on_split_path(self, built):
        s, queries = built
        rng = np.random.default_rng(1)
        mask = rng.uniform(size=s.num_docs) < 0.5
        ids, probs = s.retrieve(queries, k=10, doc_mask=mask)
        bf_ids, bf_scores = brute_force_masked_topk(s, queries, mask, 10)
        ids = np.asarray(ids)
        # every returned doc is unmasked
        valid = ids >= 0
        assert np.all(mask[ids[valid]])
        # score-level agreement with the masked brute force (ties may
        # reorder ids; compare the selected score multisets)
        got_scores = np.where(
            valid, np.take_along_axis(
                np.where(mask[None, :], s.get_scores_batch(queries),
                         -np.inf), np.maximum(ids, 0), axis=1), -np.inf)
        np.testing.assert_allclose(
            np.sort(np.where(np.isfinite(got_scores), got_scores, -1e30)),
            np.sort(np.where(np.isfinite(bf_scores), bf_scores, -1e30)),
            rtol=1e-4)

    def test_unfilled_slots_are_sentinel(self, built):
        s, queries = built
        mask = np.zeros(s.num_docs, dtype=bool)
        mask[:3] = True  # only 3 docs retrievable
        ids, probs = s.retrieve(queries, k=10, doc_mask=mask)
        ids = np.asarray(ids)
        probs = np.asarray(probs)
        assert np.all(np.isin(ids[ids >= 0], [0, 1, 2]))
        assert np.all(probs[ids < 0] == 0.0)
        # at most 3 real slots per query
        assert np.max(np.sum(ids >= 0, axis=1)) <= 3

    def test_all_true_mask_equals_unmasked(self, built):
        s, queries = built
        full = np.ones(s.num_docs, dtype=bool)
        a_ids, a_probs = s.retrieve(queries, k=10)
        b_ids, b_probs = s.retrieve(queries, k=10, doc_mask=full)
        np.testing.assert_array_equal(np.asarray(a_ids), np.asarray(b_ids))
        np.testing.assert_allclose(np.asarray(a_probs),
                                   np.asarray(b_probs), rtol=1e-6)

    def test_compare_path_masking(self, built):
        """The non-split (doc-major) kernel honors the mask too."""
        s, queries = built
        rng = np.random.default_rng(2)
        mask = rng.uniform(size=s.num_docs) < 0.4
        split = s._split
        try:
            s._split = None  # force the compare path
            ids, probs = s.retrieve(queries, k=5, doc_mask=mask)
        finally:
            s._split = split
        ids = np.asarray(ids)
        valid = ids >= 0
        assert np.all(mask[ids[valid]])
        ids_sp, _ = s.retrieve(queries, k=5, doc_mask=mask)
        # both engines select the same unmasked documents (modulo ties:
        # compare score sets)
        sc = np.where(mask[None, :], s.get_scores_batch(queries), -np.inf)
        a = np.sort(np.take_along_axis(sc, np.maximum(ids, 0), axis=1)
                    * (ids >= 0))
        b = np.sort(np.take_along_axis(
            sc, np.maximum(np.asarray(ids_sp), 0), axis=1)
            * (np.asarray(ids_sp) >= 0))
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_bad_mask_shape_raises(self, built):
        s, queries = built
        with pytest.raises(ValueError, match="doc_mask"):
            s.retrieve(queries, k=5, doc_mask=np.ones(3, dtype=bool))

    def test_mask_changes_do_not_recompile_wrongly(self, built):
        """Two different masks through the same compiled kernel give
        mask-consistent (different) results."""
        s, queries = built
        m1 = np.zeros(s.num_docs, dtype=bool)
        m1[: s.num_docs // 2] = True
        m2 = ~m1
        i1, _ = s.retrieve(queries, k=5, doc_mask=m1)
        i2, _ = s.retrieve(queries, k=5, doc_mask=m2)
        i1, i2 = np.asarray(i1), np.asarray(i2)
        assert np.all(i1[i1 >= 0] < s.num_docs // 2)
        assert np.all(i2[i2 >= 0] >= s.num_docs // 2)


class TestMaskedThresholded:
    def test_masked_docs_excluded_from_passing(self, built):
        s, queries = built
        i0, p0, n0 = s.retrieve_thresholded(queries[:8], 0.2, k=10)
        mask = np.zeros(s.num_docs, dtype=bool)  # everything filtered
        i1, p1, n1 = s.retrieve_thresholded(queries[:8], 0.2, k=10,
                                            doc_mask=mask)
        assert np.all(n1 == 0) and np.all(np.asarray(i1) == -1)
        full = np.ones(s.num_docs, dtype=bool)
        i2, p2, n2 = s.retrieve_thresholded(queries[:8], 0.2, k=10,
                                            doc_mask=full)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))
        np.testing.assert_array_equal(n0, n2)

    def test_partial_mask_counts(self, built):
        s, queries = built
        rng = np.random.default_rng(3)
        mask = rng.uniform(size=s.num_docs) < 0.5
        i1, p1, n1 = s.retrieve_thresholded(queries[:8], 0.1, k=10,
                                            doc_mask=mask)
        i1 = np.asarray(i1)
        assert np.all(mask[i1[i1 >= 0]])
        # masked counts never exceed unmasked counts
        _, _, n0 = s.retrieve_thresholded(queries[:8], 0.1, k=10)
        assert np.all(n1 <= n0)


class TestThresholdZeroMaskContract:
    """threshold=0.0 must still honor doc_mask and exclude zero-score
    docs (advisor finding: probs >= 0.0 admitted masked/zeroed docs into
    n_passing and the returned set)."""

    def test_threshold_zero_excludes_masked(self, built):
        s, queries = built
        mask = np.ones(s.num_docs, dtype=bool)
        mask[::2] = False
        ids, probs, n_passing = s.retrieve_thresholded(
            queries[:4], 0.0, k=10, doc_mask=mask)
        live = ids[ids >= 0]
        assert np.all(mask[live]), "masked docs leaked through threshold=0"
        # n_passing counts only unmasked, positive-probability docs
        dense = s.get_probabilities_batch(queries[:4])
        expect = ((dense > 0) & mask[None, :]).sum(axis=1)
        np.testing.assert_array_equal(n_passing, expect)

    def test_threshold_zero_excludes_zero_score(self, built):
        s, queries = built
        ids, probs, n_passing = s.retrieve_thresholded(queries[:4], 0.0, k=10)
        dense = s.get_probabilities_batch(queries[:4])
        expect = (dense > 0).sum(axis=1)
        np.testing.assert_array_equal(n_passing, expect)
        assert np.all(probs[ids >= 0] > 0)

"""ShardedBayesianBM25Scorer: the single-chip scorer battery on an 8-way
CPU mesh, asserting agreement with the single-chip scorer: ids/ordering exact
(the candidate merge reproduces the lowest-id tie-break), floats within
a last-ulp tolerance (shard-local matmul tiling differs from the
full-matrix tiling)."""

import numpy as np
import pytest

import jax

from bayesian_bm25_tpu import BayesianBM25Scorer, ShardedBayesianBM25Scorer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def random_corpus(rng, n_docs, vocab, max_len):
    return [
        [f"t{t}" for t in rng.integers(0, vocab, rng.integers(1, max_len))]
        for _ in range(n_docs)
    ]


@pytest.fixture(scope="module")
def pair():
    """(single, sharded) scorers indexed on the same corpus."""
    rng = np.random.default_rng(0)
    corpus = random_corpus(rng, 400, 500, 40)
    single = BayesianBM25Scorer(base_rate="auto")
    single.index(corpus, show_progress=False)
    shard = ShardedBayesianBM25Scorer(base_rate="auto", n_devices=8)
    shard.index(corpus, show_progress=False)
    return single, shard, corpus, rng


class TestIndexParity:
    def test_estimated_parameters_identical(self, pair):
        single, shard, _, _ = pair
        assert shard.transform.alpha == pytest.approx(
            single.transform.alpha, rel=1e-9)
        assert shard.transform.beta == pytest.approx(
            single.transform.beta, rel=1e-9)
        assert shard.base_rate == pytest.approx(single.base_rate, rel=1e-9)
        assert shard.num_docs == single.num_docs
        assert shard.avgdl == single.avgdl

    def test_index_arrays_sharded(self, pair):
        _, shard, _, _ = pair
        sh = shard._index.term_ids.sharding
        assert len(sh.device_set) == 8


class TestQueryParity:
    def test_retrieve_exact(self, pair):
        single, shard, corpus, rng = pair
        queries = [corpus[i][:5] for i in range(0, 60, 7)]
        queries += [["zzz_oov"], [], ["t1", "t1", "t3"]]
        i1, p1 = single.retrieve(queries, k=10)
        i2, p2 = shard.retrieve(queries, k=10)
        np.testing.assert_array_equal(i1, i2)
        # shard-local matmul tiling differs from the full-matrix tiling by
        # at most a last-ulp f32 reassociation; ids/ordering stay exact
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)

    def test_retrieve_large_k_ties(self, pair):
        single, shard, corpus, _ = pair
        # k > matches forces zero-score ties: pad masking + shard-major
        # merge order must reproduce single-chip lowest-id selection
        i1, p1 = single.retrieve([["t3"]], k=50)
        i2, p2 = shard.retrieve([["t3"]], k=50)
        np.testing.assert_array_equal(i1, i2)
        # transform scalars travel as f32 operands on the sharded path
        # (compiled-program caching): last-ulp probability agreement
        np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-9)

    def test_scores_batch_exact(self, pair):
        single, shard, corpus, _ = pair
        queries = [corpus[3][:4], corpus[9][:6]]
        np.testing.assert_allclose(
            single.get_scores_batch(queries), shard.get_scores_batch(queries),
            rtol=1e-6, atol=2e-6)

    def test_probabilities_batch_exact(self, pair):
        single, shard, corpus, _ = pair
        queries = [corpus[3][:4], ["t7", "t8"]]
        np.testing.assert_allclose(
            single.get_probabilities_batch(queries),
            shard.get_probabilities_batch(queries), rtol=1e-5, atol=1e-6)

    def test_thresholded_exact(self, pair):
        single, shard, corpus, _ = pair
        queries = [corpus[5][:5], corpus[11][:5]]
        i1, p1, n1 = single.retrieve_thresholded(queries, 0.5, k=5)
        i2, p2, n2 = shard.retrieve_thresholded(queries, 0.5, k=5)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)

    def test_explain_traces(self, pair):
        _, shard, corpus, _ = pair
        res = shard.retrieve([corpus[2][:4]], k=3, explain=True)
        assert res.explanations is not None
        tr = res.explanations[0][0]
        assert tr is not None
        assert tr.posterior == pytest.approx(res.probabilities[0][0], rel=1e-5)


class TestLifecycleParity:
    def test_add_documents_exact(self, pair):
        single, shard, corpus, rng = pair
        extra = random_corpus(rng, 30, 600, 30)
        s1 = BayesianBM25Scorer(base_rate="auto")
        s1.index(corpus, show_progress=False)
        s1.add_documents(extra)
        s2 = ShardedBayesianBM25Scorer(base_rate="auto", n_devices=8)
        s2.index(corpus, show_progress=False)
        s2.add_documents(extra)
        q = [extra[0][:5], corpus[0][:5]]
        i1, p1 = s1.retrieve(q, k=8)
        i2, p2 = s2.retrieve(q, k=8)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)
        assert s1.transform.alpha == pytest.approx(s2.transform.alpha,
                                                   rel=1e-6)

    def test_no_split_small_vocab(self):
        # vocab <= 256 disables the split; the term-table sharded path runs
        rng = np.random.default_rng(5)
        corpus = [[f"t{t}" for t in rng.integers(0, 50, 12)]
                  for _ in range(100)]
        s1 = BayesianBM25Scorer()
        s1.index(corpus, show_progress=False)
        s2 = ShardedBayesianBM25Scorer(n_devices=8)
        s2.index(corpus, show_progress=False)
        assert s2._split is None
        q = [corpus[4][:4], ["t1"]]
        i1, p1 = s1.retrieve(q, k=7)
        i2, p2 = s2.retrieve(q, k=7)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(p1, p2)

    def test_index_texts(self):
        texts = [f"document number {i} about topic {i % 7}"
                 for i in range(64)]
        s1 = BayesianBM25Scorer()
        s1.index_texts(texts)
        s2 = ShardedBayesianBM25Scorer(n_devices=8)
        s2.index_texts(texts)
        i1, p1 = s1.retrieve_texts(["topic 3"], k=5)
        i2, p2 = s2.retrieve_texts(["topic 3"], k=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-9)

    def test_mesh_validation(self):
        from bayesian_bm25_tpu.parallel.sharded import make_mesh_2d

        # ('q', 'd') meshes are a first-class surface now; only foreign
        # axis names reject.
        sc = ShardedBayesianBM25Scorer(mesh=make_mesh_2d(2, 4))
        assert sc._is_2d and sc._n_shards == 4
        import jax
        from jax.sharding import Mesh
        bad = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("a", "b"))
        with pytest.raises(ValueError, match="mesh must be"):
            ShardedBayesianBM25Scorer(mesh=bad)


class TestShardedDocMask:
    def test_masked_retrieve_matches_single_chip(self):
        from bayesian_bm25_tpu import BayesianBM25Scorer
        from bayesian_bm25_tpu.parallel.sharded_scorer import (
            ShardedBayesianBM25Scorer,
        )

        rng = np.random.default_rng(17)
        corpus = [[f"t{t}" for t in rng.zipf(1.4, size=20) % 600]
                  for _ in range(160)]
        queries = [[f"t{t}" for t in rng.zipf(1.4, size=5) % 600]
                   for _ in range(8)]
        mask = rng.uniform(size=len(corpus)) < 0.5

        single = BayesianBM25Scorer(base_rate="auto",
                                    matmul_precision="highest")
        single.index(corpus, show_progress=False)
        sc = ShardedBayesianBM25Scorer(base_rate="auto",
                                       matmul_precision="highest")
        sc.index(corpus, show_progress=False)

        i1, p1 = single.retrieve(queries, k=5, doc_mask=mask)
        i2, p2 = sc.retrieve(queries, k=5, doc_mask=mask)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-5)
        ids = np.asarray(i2)
        assert np.all(mask[ids[ids >= 0]])

    def test_bad_mask_shape_raises(self):
        from bayesian_bm25_tpu.parallel.sharded_scorer import (
            ShardedBayesianBM25Scorer,
        )

        rng = np.random.default_rng(18)
        corpus = [[f"t{t}" for t in rng.integers(0, 100, 8)]
                  for _ in range(40)]
        sc = ShardedBayesianBM25Scorer()
        sc.index(corpus, show_progress=False)
        with pytest.raises(ValueError, match="doc_mask"):
            sc.retrieve([corpus[0][:3]], k=3,
                        doc_mask=np.ones(7, dtype=bool))


class TestAddDocumentsNonDividingMesh:
    """add_documents must use the mesh-aware pad multiple (advisor
    finding: the inherited default 2048 pad broke device_put on meshes
    whose size doesn't divide 2048, e.g. 3)."""

    def test_add_documents_on_3_device_mesh(self):
        rng = np.random.default_rng(7)
        corpus = random_corpus(rng, 60, 120, 20)
        extra = random_corpus(rng, 15, 120, 20)
        single = BayesianBM25Scorer(base_rate="auto")
        single.index(corpus, show_progress=False)
        single.add_documents(extra)
        shard = ShardedBayesianBM25Scorer(base_rate="auto", n_devices=3)
        shard.index(corpus, show_progress=False)
        shard.add_documents(extra)
        assert shard.num_docs == single.num_docs
        assert shard._index.term_ids.shape[0] % 3 == 0
        q = [corpus[0][:4], extra[0][:4]]
        ids_s, probs_s, *_ = single.retrieve(q, k=5)
        ids_d, probs_d, *_ = shard.retrieve(q, k=5)
        np.testing.assert_array_equal(ids_s, ids_d)
        np.testing.assert_allclose(probs_s, probs_d, rtol=1e-5, atol=1e-7)


class TestShardedSparsePath:
    """The 1-D sharded retrieve now routes through the distributed
    sparse-candidate kernel (doc-sharded rare postings); these pin the
    routing and the approx opt-in."""

    def test_sparse_postings_built(self, pair):
        _, shard, _, _ = pair
        assert shard._post_sh is not None
        pid_sh, pw_sh, df_sh = shard._post_sh
        assert pid_sh.shape[0] == 8
        # per-shard dfs partition the global postings
        total = np.asarray(df_sh).sum(axis=0)
        global_df = np.asarray(shard._split.rare_df)
        np.testing.assert_array_equal(total, global_df)

    def test_approx_flag_runs(self, pair):
        single, shard, corpus, _ = pair
        queries = [corpus[2][:5], corpus[8][:4]]
        ids_a, probs_a = shard.retrieve(queries, k=5, approx=True)
        ids_e, probs_e = shard.retrieve(queries, k=5, approx=False)
        assert ids_a.shape == ids_e.shape == (2, 5)
        # approx recall is high on tiny corpora; top-1 must agree
        np.testing.assert_array_equal(ids_a[:, 0], ids_e[:, 0])

    def test_retrieve_equal_packed_on_off(self, pair, monkeypatch):
        """The rank-packed candidate build must be a pure layout change
        on the sharded path too: retrieval output identical with the
        flag on and off (compaction arrays travel replicated, per-shard
        merges see the same per-doc payload sequences)."""
        from bayesian_bm25_tpu.engine import split_index as sidx
        _, shard, corpus, rng = pair
        queries = [corpus[i][:6] for i in range(0, 90, 11)]
        queries += [[], ["zzz_oov"], corpus[3][:1]]
        monkeypatch.setattr(sidx, "PACKED_BUILD", False)
        ids0, probs0 = shard.retrieve(queries, k=9)
        monkeypatch.setattr(sidx, "PACKED_BUILD", True)
        ids1, probs1 = shard.retrieve(queries, k=9)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_array_equal(np.asarray(probs0),
                                      np.asarray(probs1))

    def test_sharded_postings_round_trip(self, pair):
        from bayesian_bm25_tpu.engine import split_index as sidx
        _, shard, _, _ = pair
        s = shard._split
        pid_sh, pw_sh, _ = (np.asarray(shard._post_sh[0]),
                            np.asarray(shard._post_sh[1]),
                            shard._post_sh[2])
        D_pad = s.dense_impact.shape[0]
        D_local = D_pad // 8
        # reassembling (shard, local) entries reproduces the global
        # postings multiset per rare slot
        got = {}
        for sh in range(8):
            for r in range(pid_sh.shape[1]):
                for c in range(pid_sh.shape[2]):
                    d = int(pid_sh[sh, r, c])
                    if d < D_local:
                        got.setdefault(r, []).append(
                            (sh * D_local + d, float(pw_sh[sh, r, c])))
        want = {}
        gpid = np.asarray(s.post_doc_ids)
        gpw = np.asarray(s.post_weights)
        for r in range(gpid.shape[0]):
            for c in range(gpid.shape[1]):
                d = int(gpid[r, c])
                if d < D_pad:
                    want.setdefault(r, []).append((d, float(gpw[r, c])))
        for r in want:
            assert sorted(got.get(r, [])) == sorted(want[r])


class TestMesh2D:
    """2-D (q x d) mesh exposed through the scorer ctor."""

    def test_retrieve_parity_with_single(self):
        rng = np.random.default_rng(5)
        corpus = random_corpus(rng, 300, 400, 30)
        single = BayesianBM25Scorer(base_rate="auto")
        single.index(corpus, show_progress=False)
        s2d = ShardedBayesianBM25Scorer(base_rate="auto", mesh_shape=(2, 4))
        s2d.index(corpus, show_progress=False)
        queries = [corpus[3][:5], corpus[7][:4], corpus[11][:3]]
        i1, p1 = single.retrieve(queries, k=5)
        i2, p2 = s2d.retrieve(queries, k=5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-7)

    def test_doc_mask_on_2d(self):
        rng = np.random.default_rng(6)
        corpus = random_corpus(rng, 200, 300, 25)
        s2d = ShardedBayesianBM25Scorer(base_rate="auto", mesh_shape=(2, 4))
        s2d.index(corpus, show_progress=False)
        mask = np.ones(s2d.num_docs, bool)
        mask[::2] = False
        ids, probs = s2d.retrieve([corpus[1][:4]], k=5, doc_mask=mask)
        live = ids[ids >= 0]
        assert np.all(mask[live])

    def test_bad_mesh_axes_raise(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:8]).reshape(2, 4)
        bad = Mesh(devs, ("x", "y"))
        with pytest.raises(ValueError, match="mesh must be"):
            ShardedBayesianBM25Scorer(mesh=bad)


class TestLocalK:
    """local_k < k: the large-k merge-bandwidth trade (reference R=1000
    protocols) — per-shard candidates shrink; exact at local_k=k."""

    def test_local_k_equals_k_is_exact(self, pair):
        from bayesian_bm25_tpu.engine import split_index as sidx
        from bayesian_bm25_tpu.parallel import sharded
        single, shard, corpus, _ = pair
        queries = [corpus[1][:5], corpus[6][:4]]
        s = shard._split
        idx = shard._index
        t = shard.transform
        fslots, fcnt, trows, tqids, tqcnt = shard._encode_split(queries)
        tslots = sidx.map_tail_slots(tqids, s)
        pid_sh, pw_sh, df_sh = shard._post_sh
        cap = sidx.sharded_candidate_cap(df_sh, tslots, 25, pid_sh.shape[2])
        out = sharded.sharded_retrieve_topk_split_sparse(
            shard.mesh, s.dense_impact, s.dense_presence, pid_sh, pw_sh,
            idx.doc_lengths, idx.avgdl, fslots, fcnt, trows, tslots,
            tqcnt, 25, cap, t.alpha, t.beta, t.base_rate,
            n_docs=idx.n_docs, impact_lo=s.dense_impact_lo, local_k=25)
        ref_ids, ref_probs = single.retrieve(queries, k=25)
        np.testing.assert_array_equal(np.asarray(out[0])[:2], ref_ids)

    def test_local_k_reduced_high_recall(self, pair):
        from bayesian_bm25_tpu.engine import split_index as sidx
        from bayesian_bm25_tpu.parallel import sharded
        single, shard, corpus, _ = pair
        queries = [corpus[1][:5], corpus[6][:4]]
        s = shard._split
        idx = shard._index
        t = shard.transform
        fslots, fcnt, trows, tqids, tqcnt = shard._encode_split(queries)
        tslots = sidx.map_tail_slots(tqids, s)
        pid_sh, pw_sh, df_sh = shard._post_sh
        k = 32
        cap = sidx.sharded_candidate_cap(df_sh, tslots, k, pid_sh.shape[2])
        out = sharded.sharded_retrieve_topk_split_sparse(
            shard.mesh, s.dense_impact, s.dense_presence, pid_sh, pw_sh,
            idx.doc_lengths, idx.avgdl, fslots, fcnt, trows, tslots,
            tqcnt, k, cap, t.alpha, t.beta, t.base_rate,
            n_docs=idx.n_docs, impact_lo=s.dense_impact_lo, local_k=8)
        got = np.asarray(out[0])[:2]
        ref_ids, _ = single.retrieve(queries, k=k)
        # 8 shards x local_k 8 = 64 candidates for top-32. On this tiny
        # corpus (50 docs/shard) winners concentrate per shard, so
        # recall drops well below exact — the knob is a bandwidth trade
        # whose loss shrinks as shards grow; here we pin only that it
        # runs, returns valid ids, and recovers a nontrivial fraction.
        assert got.shape == (2, k)
        for row in range(2):
            ref_set = set(ref_ids[row][ref_ids[row] >= 0].tolist())
            got_set = set(got[row][got[row] >= 0].tolist())
            if ref_set:
                overlap = len(got_set & ref_set) / len(ref_set)
                assert overlap >= 0.3, overlap
                # every returned doc is at least a real candidate
                assert got_set <= set(range(single.num_docs)) | {-1}

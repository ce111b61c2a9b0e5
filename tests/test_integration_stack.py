"""Kitchen-sink integration: every serving feature stacked at once.

int8 storage x rank-packed candidate build x tombstoned docs x caller
doc_mask x batch bucketing x sharded mesh — features developed
independently must compose; this pins single-chip vs 8-shard equality
and mask/tombstone exclusion with everything enabled."""

import numpy as np
import pytest

import jax

from bayesian_bm25_tpu import (
    BayesianBM25Scorer,
    ShardedBayesianBM25Scorer,
)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 virtual devices")
def test_full_stack_single_vs_sharded():
    rng = np.random.default_rng(77)
    corpus = [[f"t{t}" for t in rng.zipf(1.35,
                                         size=rng.integers(4, 45)) % 900]
              for _ in range(500)]
    queries = [corpus[i][:6] for i in range(0, 120, 11)]
    queries += [[], ["zzz_oov"], ["t7"] * 200, corpus[2][:1]]

    single = BayesianBM25Scorer(base_rate="auto", impact_storage="int8")
    single.index(corpus, show_progress=False)
    sh = ShardedBayesianBM25Scorer(base_rate="auto",
                                   impact_storage="int8", n_devices=8)
    sh.index(corpus, show_progress=False)

    # tombstones + a caller mask on top
    dead = [0, 13, 77, 401, 499]
    mask = np.ones(single.num_docs, bool)
    mask[5::7] = False
    for sc in (single, sh):
        sc.delete_documents(dead)

    ids_a, probs_a = single.retrieve(queries, k=9, doc_mask=mask)
    ids_b, probs_b = sh.retrieve(queries, k=9, doc_mask=mask)
    ids_a, ids_b = np.asarray(ids_a), np.asarray(ids_b)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(np.asarray(probs_a),
                               np.asarray(probs_b), rtol=5e-7)

    returned = set(ids_a.ravel().tolist()) - {-1}
    assert not (returned & set(dead))
    assert not (returned & set(np.flatnonzero(~mask).tolist()))

    # pipelined entry points see the same state
    outs = single.retrieve_many([queries[:5], queries[5:9]], k=9)
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(single.retrieve(
                                      queries[:5], k=9)[0]))
    stream = list(single.retrieve_stream(iter([queries[:3]]), k=9))
    np.testing.assert_array_equal(
        np.asarray(stream[0][0]),
        np.asarray(single.retrieve(queries[:3], k=9)[0]))

    # checkpoint the full stack into a fresh sharded scorer
    import tempfile
    import os

    from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "stack.npz")
        save_scorer(p, single)
        s2 = load_scorer(p, n_devices=8)
        assert s2._impact_storage == "int8"
        np.testing.assert_array_equal(s2.deleted_mask,
                                      single.deleted_mask)
        ids_c, _ = s2.retrieve(queries, k=9, doc_mask=mask)
        np.testing.assert_array_equal(ids_a, np.asarray(ids_c))

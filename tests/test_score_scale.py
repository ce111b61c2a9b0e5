"""Score-scale flag: "classic" (textbook Robertson/ATIRE (k1+1) scaling)
vs "bm25s" (score-level equality with the bm25s package the reference
delegates scoring to, ref scorer.py:213,525-529).

bm25s semantics (bm25s/scoring.py; not installable in this no-egress
environment, so frozen here as hand-derived literals): its robertson tf
component is ``tf / (tf + K)`` — the Pomona lecture formulation WITHOUT
the (k1+1) factor — while only its atire variant multiplies by (k1+1);
lucene likewise omits it. IDFs are identical to ours in both scales.
Consequences pinned below:

  * robertson: bm25s scores == classic scores / (k1+1), exactly;
  * lucene / atire: bit-identical between the two scales;
  * rankings identical everywhere (a per-corpus constant factor).
"""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import index as eidx

CORPUS = [
    ["cat", "dog", "cat", "fish"],
    ["dog", "bird"],
    ["cat", "cat", "cat", "bird", "bird", "rare"],
    ["fish", "fish", "fish"],
]
QUERY = ["cat", "rare", "unicorn", "fish"]  # unicorn is OOV

# Hand-derived bm25s-exact goldens (k1=1.2, b=0.75, dl=[4,2,6,3],
# avgdl=3.75, df: cat/dog/fish/bird=2, rare=1). Derived once with plain
# Python floats, no engine code:
#   robertson = classic golden / 2.2 (only the df=1 'rare' term scores;
#   doc2: idf=ln(3.5/1.5)=0.8472978603872037, K=1.2*(1-.75+.75*6/3.75)
#   =1.74, sat=1/2.74=0.3649635036 -> idf*sat=0.309232795762)
GOLDEN_BM25S = {
    "robertson": [0.0, 0.0, 0.309232795762, 0.0],
    "lucene": [0.731945961338, 0.0, 0.878106880156, 0.517274015343],
    "atire": [1.610281114944, 0.0, 2.078224707491, 1.138002833755],
}


class TestBm25sScaleGoldens:
    @pytest.mark.parametrize("method", ["robertson", "lucene", "atire"])
    def test_engine_matches_bm25s_goldens(self, method):
        s = BayesianBM25Scorer(method=method, score_scale="bm25s")
        s.index(CORPUS, show_progress=False)
        scores = s.get_scores(QUERY)
        np.testing.assert_allclose(scores, GOLDEN_BM25S[method], rtol=1e-6,
                                   atol=1e-9)

    def test_robertson_exact_k1p1_ratio(self):
        """Classic robertson == bm25s robertson * (k1+1), bit-level in
        f64 weight space (same build path, one extra multiply)."""
        a = BayesianBM25Scorer(method="robertson")
        b = BayesianBM25Scorer(method="robertson", score_scale="bm25s")
        a.index(CORPUS, show_progress=False)
        b.index(CORPUS, show_progress=False)
        sa = a.get_scores(QUERY)
        sb = b.get_scores(QUERY)
        np.testing.assert_allclose(sa, np.asarray(sb) * 2.2, rtol=1e-6)

    @pytest.mark.parametrize("method", ["lucene", "atire"])
    def test_unscaled_methods_identical(self, method):
        a = BayesianBM25Scorer(method=method)
        b = BayesianBM25Scorer(method=method, score_scale="bm25s")
        a.index(CORPUS, show_progress=False)
        b.index(CORPUS, show_progress=False)
        np.testing.assert_array_equal(
            np.asarray(a.get_scores(QUERY)), np.asarray(b.get_scores(QUERY)))


class TestScaleMechanics:
    def test_tf_scale_factor(self):
        assert eidx.tf_scale_factor("robertson", 1.2, "classic") == 2.2
        assert eidx.tf_scale_factor("robertson", 1.2, "bm25s") == 1.0
        assert eidx.tf_scale_factor("lucene", 1.2, "classic") == 1.0
        assert eidx.tf_scale_factor("lucene", 1.2, "bm25s") == 1.0
        assert eidx.tf_scale_factor("atire", 1.2, "classic") == 2.2
        assert eidx.tf_scale_factor("atire", 1.2, "bm25s") == 2.2

    def test_invalid_scale_rejected(self):
        with pytest.raises(ValueError, match="score_scale"):
            BayesianBM25Scorer(score_scale="nope")
        with pytest.raises(ValueError, match="score_scale"):
            eidx.build_index(CORPUS, score_scale="nope")
        with pytest.raises(ValueError, match="score_scale"):
            eidx.tf_scale_factor("robertson", 1.2, "nope")

    def test_rank_parity_fuzz(self):
        rng = np.random.default_rng(11)
        corpus = [[f"t{t}" for t in rng.integers(0, 50, rng.integers(3, 20))]
                  for _ in range(60)]
        queries = [[f"t{t}" for t in rng.integers(0, 50, 4)]
                   for _ in range(10)]
        for method in ("robertson", "lucene", "atire"):
            a = BayesianBM25Scorer(method=method, base_rate=0.05)
            b = BayesianBM25Scorer(method=method, base_rate=0.05,
                                   score_scale="bm25s")
            a.index(corpus, show_progress=False)
            b.index(corpus, show_progress=False)
            for q in queries:
                ids_a, _ = a.retrieve(q, k=5)
                ids_b, _ = b.retrieve(q, k=5)
                np.testing.assert_array_equal(ids_a, ids_b)

    def test_probabilities_scale_invariant_after_fit(self):
        """alpha/beta are fitted from score statistics, so calibrated
        probabilities agree across scales up to fit precision."""
        rng = np.random.default_rng(3)
        corpus = [[f"t{t}" for t in rng.integers(0, 40, 12)]
                  for _ in range(80)]
        a = BayesianBM25Scorer(method="robertson", base_rate=0.05)
        b = BayesianBM25Scorer(method="robertson", base_rate=0.05,
                               score_scale="bm25s")
        a.index(corpus, show_progress=False)
        b.index(corpus, show_progress=False)
        q = [f"t{t}" for t in rng.integers(0, 40, 5)]
        _, pa = a.retrieve(q, k=5)
        _, pb = b.retrieve(q, k=5)
        # beta = median score and alpha = 1/std both scale with the
        # score, so alpha*(s-beta) is exactly scale-free.
        np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-6)

    def test_append_preserves_scale(self):
        s = BayesianBM25Scorer(method="robertson", score_scale="bm25s",
                               base_rate=0.05)
        s.index(CORPUS, show_progress=False)
        s.add_documents([["rare", "cat"], ["unicorn", "unicorn"]])
        full = BayesianBM25Scorer(method="robertson", score_scale="bm25s",
                                  base_rate=0.05)
        full.index(CORPUS + [["rare", "cat"], ["unicorn", "unicorn"]],
                   show_progress=False)
        np.testing.assert_array_equal(
            np.asarray(s.get_scores(QUERY)),
            np.asarray(full.get_scores(QUERY)))

    def test_checkpoint_roundtrip_preserves_scale(self, tmp_path):
        from bayesian_bm25_tpu.utils.io import load_scorer, save_scorer

        s = BayesianBM25Scorer(method="robertson", score_scale="bm25s",
                               base_rate=0.05)
        s.index(CORPUS, show_progress=False)
        p = str(tmp_path / "ck.npz")
        save_scorer(p, s)
        r = load_scorer(p)
        assert r._score_scale == "bm25s"
        assert r.bm25_index.score_scale == "bm25s"
        np.testing.assert_array_equal(
            np.asarray(s.get_scores(QUERY)), np.asarray(r.get_scores(QUERY)))

    def test_multi_field_passthrough(self):
        from bayesian_bm25_tpu.models.multi_field import MultiFieldScorer

        mf = MultiFieldScorer(["title", "body"], base_rate=0.05,
                              method="robertson", score_scale="bm25s")
        docs = [{"title": ["cat"], "body": ["cat", "dog", "fish"]},
                {"title": ["bird"], "body": ["bird", "rare"]}]
        mf.index(docs, show_progress=False)
        for sc in mf.scorers.values():
            assert sc._score_scale == "bm25s"
            assert sc.bm25_index.score_scale == "bm25s"

"""Score-level golden parity for the BM25 variants.

The reference delegates scoring entirely to the external ``bm25s``
package (ref scorer.py:213, 262, 525-529), which is not installable in
this no-egress environment — so the goldens below were derived ONCE by
an independent hand calculation (plain Python floats, no engine code) of
the textbook formulas (the default score_scale="classic"):

    K   = k1 * (1 - b + b * dl / avgdl)
    sat = tf / (tf + K)               [* (k1+1) for robertson/atire]
    idf_robertson = max(ln((N - df + .5) / (df + .5)), 0)
    idf_lucene    = ln(1 + (N - df + .5) / (df + .5))
    idf_atire     = ln(N / df)

and frozen as literals. bm25s itself drops the (k1+1) factor for
robertson too (its tfc uses the Pomona formulation; only atire keeps
k1+1) — score-level equality with bm25s is score_scale="bm25s", pinned
by tests/test_score_scale.py. The engine must reproduce these literals
to float precision; any deliberate divergence must update BOTH the
literals and PARITY.md with a quantified delta.

Fixture corpus exercises: repeated terms (tf>1), df=1 vs df=N/2 terms,
the robertson idf floor (df=2 of N=4 -> idf exactly 0), OOV query terms,
and a zero-scoring document."""

import numpy as np
import pytest

from bayesian_bm25_tpu import BayesianBM25Scorer

CORPUS = [
    ["cat", "dog", "cat", "fish"],
    ["dog", "bird"],
    ["cat", "cat", "cat", "bird", "bird", "rare"],
    ["fish", "fish", "fish"],
]
QUERY = ["cat", "rare", "unicorn", "fish"]  # unicorn is OOV

# Hand-derived goldens (k1=1.2, b=0.75, dl=[4,2,6,3], avgdl=3.75,
# df: cat/dog/fish/bird=2, rare=1).
GOLDEN = {
    "robertson": [0.0, 0.0, 0.680312150676, 0.0],
    "lucene": [0.731945961338, 0.0, 0.878106880156, 0.517274015343],
    "atire": [1.610281114944, 0.0, 2.078224707491, 1.138002833755],
}


class TestGoldenScores:
    @pytest.mark.parametrize("method", ["robertson", "lucene", "atire"])
    def test_engine_matches_goldens(self, method):
        s = BayesianBM25Scorer(method=method)
        s.index(CORPUS, show_progress=False)
        scores = s.get_scores(QUERY)
        np.testing.assert_allclose(scores, GOLDEN[method], rtol=1e-6,
                                   atol=1e-9)

    def test_robertson_floor_engages(self):
        """df=2 of N=4 gives (N-df+.5)/(df+.5) = 1 -> ln = 0 exactly;
        only the df=1 'rare' term scores under robertson."""
        s = BayesianBM25Scorer(method="robertson")
        s.index(CORPUS, show_progress=False)
        scores = s.get_scores(["cat", "fish"])  # both idf-floored
        np.testing.assert_allclose(scores, 0.0, atol=1e-12)

    def test_query_term_multiplicity(self):
        """bm25s sums per query TOKEN: a term repeated in the query
        contributes its weight once per occurrence."""
        s = BayesianBM25Scorer(method="lucene")
        s.index(CORPUS, show_progress=False)
        once = s.get_scores(["cat"])
        twice = s.get_scores(["cat", "cat"])
        np.testing.assert_allclose(twice, 2.0 * once, rtol=1e-7)

    @pytest.mark.parametrize("method", ["robertson", "lucene", "atire"])
    def test_goldens_via_split_and_compare_paths(self, method):
        """Both engine paths (frequency-split kernel when the vocab is
        large enough, doc-major compare otherwise) must hit the goldens:
        replicate the fixture inside a larger vocabulary so the split
        engages, and check the fixture docs' scores are unchanged."""
        filler = [[f"pad{i}", f"pad{i+1}", f"pad{i+2}"] for i in
                  range(0, 900, 3)]
        s = BayesianBM25Scorer(method=method)
        s.index(CORPUS + filler, show_progress=False)
        assert s._split is not None
        scores = s.get_scores(QUERY)[:4]
        # df/N change with the filler docs; recompute expected from the
        # same closed formulas, independently of the engine
        import math

        N = 4 + len(filler)
        dl = [4, 2, 6, 3]
        avgdl = (15 + 3 * len(filler)) / N
        df = {"cat": 2, "fish": 2, "rare": 1}
        tf = [{"cat": 2, "fish": 1}, {}, {"cat": 3, "rare": 1},
              {"fish": 3}]

        def idf(d):
            if method == "robertson":
                return max(math.log((N - d + 0.5) / (d + 0.5)), 0.0)
            if method == "lucene":
                return math.log(1 + (N - d + 0.5) / (d + 0.5))
            return math.log(N / d)

        expected = []
        for doc in range(4):
            total = 0.0
            for t in ("cat", "rare", "fish"):
                if t in tf[doc]:
                    K = 1.2 * (1 - 0.75 + 0.75 * dl[doc] / avgdl)
                    sat = tf[doc][t] / (tf[doc][t] + K)
                    if method in ("robertson", "atire"):
                        sat *= 2.2
                    total += idf(df[t]) * sat
            expected.append(total)
        np.testing.assert_allclose(scores, expected, rtol=1e-5, atol=1e-7)

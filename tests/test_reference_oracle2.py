"""Live-oracle parity, part 2: FusionDebugger traces, search
diagnostics, and benchmark IR metrics against the actual reference
implementation (see test_reference_oracle.py for the loader pattern and
tolerance rationale)."""

import os

import numpy as np
import pytest

from tests.test_reference_oracle import _load_ref, REF

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "bayesian_bm25")),
    reason="reference tree not available")

ATOL = 3e-6


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


@pytest.fixture(scope="module")
def ref_debug(ref):
    import importlib.util
    import sys

    name = "bayesian_bm25.debug"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, "bayesian_bm25", "debug.py"))
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref_bench():
    """Reference benchmark-local modules (search_diagnostics, metrics).

    The reference's search_diagnostics does ``from benchmarks.simple_ivf
    import ...``; our own benchmarks package owns that name but has no
    simple_ivf submodule, so registering the reference module under it is
    safe and lets the import resolve.
    """
    import importlib.util
    import sys

    mods = {}
    for name, modname in (("simple_ivf", "benchmarks.simple_ivf"),
                          ("search_diagnostics", "ref_bench_diag"),
                          ("metrics", "ref_bench_metrics")):
        if modname in sys.modules:
            mods[name] = sys.modules[modname]
            continue
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(REF, "benchmarks", f"{name}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[modname] = m
        spec.loader.exec_module(m)
        mods[name] = m
    return mods


def _pair(ref, ref_debug, base_rate=None):
    from bayesian_bm25_tpu import BayesianProbabilityTransform
    from bayesian_bm25_tpu.utils.debug import FusionDebugger

    rt = ref["probability"].BayesianProbabilityTransform(
        alpha=1.1, beta=2.3, base_rate=base_rate)
    ot = BayesianProbabilityTransform(alpha=1.1, beta=2.3,
                                      base_rate=base_rate)
    return ref_debug.FusionDebugger(rt), FusionDebugger(ot)


class TestDebuggerOracle:
    @pytest.mark.parametrize("base_rate", [None, 0.03])
    def test_trace_bm25_all_fields(self, ref, ref_debug, base_rate):
        rd, od = _pair(ref, ref_debug, base_rate)
        rng = np.random.default_rng(0)
        for _ in range(10):
            s = float(rng.gamma(2.0, 2.0))
            tf = float(rng.integers(0, 12))
            dlr = float(rng.uniform(0.3, 2.0))
            a = rd.trace_bm25(s, tf, dlr)
            b = od.trace_bm25(s, tf, dlr)
            for f in ("raw_score", "tf", "doc_len_ratio", "likelihood",
                      "tf_prior", "norm_prior", "composite_prior",
                      "logit_likelihood", "logit_prior", "posterior",
                      "alpha", "beta"):
                assert getattr(b, f) == pytest.approx(
                    getattr(a, f), abs=ATOL, rel=1e-5), f
            if base_rate is None:
                assert b.logit_base_rate is None and a.logit_base_rate is None
            else:
                assert b.logit_base_rate == pytest.approx(
                    a.logit_base_rate, rel=1e-5)

    def test_trace_vector_and_not(self, ref, ref_debug):
        rd, od = _pair(ref, ref_debug)
        for c in (-0.9, -0.2, 0.0, 0.4, 0.95):
            a, b = rd.trace_vector(c), od.trace_vector(c)
            assert b.probability == pytest.approx(a.probability, abs=ATOL)
            assert b.logit_probability == pytest.approx(
                a.logit_probability, rel=1e-5, abs=ATOL)
        for p in (0.01, 0.4, 0.5, 0.93):
            a, b = rd.trace_not(p, name="x"), od.trace_not(p, name="x")
            assert b.complement == pytest.approx(a.complement, abs=ATOL)
            assert b.logit_input == pytest.approx(a.logit_input, rel=1e-5)
            assert b.logit_complement == pytest.approx(
                a.logit_complement, rel=1e-5)
            assert b.input_name == a.input_name

    @pytest.mark.parametrize("kwargs", [
        dict(method="log_odds"),
        dict(method="log_odds", alpha=0.25),
        dict(method="log_odds", weights=[0.6, 0.3, 0.1]),
        dict(method="log_odds", weights=[0.5, 0.25, 0.25], alpha=0.5),
        dict(method="log_odds", gating="relu"),
        dict(method="log_odds", gating="gelu"),
        dict(method="log_odds", gating="swish", gating_beta=2.0),
        dict(method="log_odds", gating="softplus", gating_beta=1.5),
        dict(method="prob_and"),
        dict(method="prob_or"),
        dict(method="prob_not"),
    ])
    def test_trace_fusion_intermediates(self, ref, ref_debug, kwargs):
        rd, od = _pair(ref, ref_debug)
        probs = [0.82, 0.33, 0.57]
        a = rd.trace_fusion(probs, **kwargs)
        b = od.trace_fusion(probs, **kwargs)
        assert b.method == a.method
        assert b.fused_probability == pytest.approx(
            a.fused_probability, abs=ATOL)
        for f in ("logits", "mean_logit", "alpha", "n_alpha_scale",
                  "scaled_logit", "weights", "log_probs", "log_prob_sum",
                  "complements", "log_complements", "log_complement_sum"):
            av, bv = getattr(a, f), getattr(b, f)
            if av is None:
                assert bv is None, f
            else:
                np.testing.assert_allclose(np.asarray(bv), np.asarray(av),
                                           atol=1e-5, err_msg=f)
        assert b.signal_names == a.signal_names

    def test_trace_document_and_compare(self, ref, ref_debug):
        rd, od = _pair(ref, ref_debug, base_rate=0.05)
        kw_a = dict(bm25_score=4.2, tf=3.0, doc_len_ratio=1.1,
                    cosine_score=0.8, doc_id="A")
        kw_b = dict(bm25_score=3.1, tf=1.0, doc_len_ratio=0.7,
                    cosine_score=0.1, doc_id="B")
        ra, rb = rd.trace_document(**kw_a), rd.trace_document(**kw_b)
        oa, ob = od.trace_document(**kw_a), od.trace_document(**kw_b)
        assert oa.final_probability == pytest.approx(
            ra.final_probability, abs=ATOL)
        assert ob.final_probability == pytest.approx(
            rb.final_probability, abs=ATOL)
        rc = rd.compare(ra, rb)
        oc = od.compare(oa, ob)
        assert set(oc.signal_deltas) == set(rc.signal_deltas)
        for name, d in rc.signal_deltas.items():
            assert oc.signal_deltas[name] == pytest.approx(d, abs=1e-5)
        assert oc.dominant_signal == rc.dominant_signal
        assert oc.crossover_stage == rc.crossover_stage


class TestSearchDiagnosticsOracle:
    def test_exact_diagnostics_and_gate(self, ref_bench):
        from bayesian_bm25_tpu.utils import diagnostics as D

        rm = ref_bench["search_diagnostics"]
        rng = np.random.default_rng(1)
        for _ in range(5):
            scores = np.sort(rng.uniform(-0.2, 1.0, 30))[::-1]
            a = rm.build_exact_search_diagnostics(scores, local_k=10,
                                                  shell_k=10)
            b = D.build_exact_search_diagnostics(scores, local_k=10,
                                                 shell_k=10)
            np.testing.assert_allclose(b.accepted_distances,
                                       a.accepted_distances, atol=1e-12)
            np.testing.assert_allclose(b.contrast_distances,
                                       a.contrast_distances, atol=1e-12)
            assert b.purity == a.purity and b.coverage == a.coverage
            assert b.cohesion == pytest.approx(a.cohesion, abs=1e-12)
            assert b.separation == pytest.approx(a.separation, abs=1e-12)
            assert b.reliability == pytest.approx(a.reliability, abs=1e-12)
            assert D.separability_gate(b) == pytest.approx(
                rm.separability_gate(a), abs=1e-12)

    def test_gate_edges(self, ref_bench):
        from bayesian_bm25_tpu.utils import diagnostics as D

        rm = ref_bench["search_diagnostics"]
        empty_r = rm.build_exact_search_diagnostics(np.array([]))
        empty_o = D.build_exact_search_diagnostics(np.array([]))
        assert rm.separability_gate(empty_r) == D.separability_gate(empty_o)


class TestIRMetricsOracle:
    def test_dcg_ndcg_precision(self, ref_bench):
        from benchmarks import metrics as M

        rm = ref_bench["metrics"]
        rng = np.random.default_rng(2)
        for _ in range(10):
            rel = rng.integers(0, 3, rng.integers(1, 15)).astype(float)
            for k in (1, 3, 10, 20):
                assert M.dcg_at_k(rel, k) == pytest.approx(
                    rm.dcg_at_k(rel, k), abs=1e-12)
                # ref normalizes against the ideal ordering of the SAME
                # list; ours takes the judged pool explicitly.
                assert M.ndcg_at_k(rel, rel, k) == pytest.approx(
                    rm.ndcg_at_k(rel, k), abs=1e-12)
                assert M.precision_at_k(rel, k) == pytest.approx(
                    rm.precision_at_k(rel, k), abs=1e-12)

    def test_average_precision_equivalence(self, ref_bench):
        """ref average_precision(rel) == ours with n_relevant = number of
        relevant docs retrieved and k = full list length."""
        from benchmarks import metrics as M

        rm = ref_bench["metrics"]
        rng = np.random.default_rng(3)
        for _ in range(10):
            rel = (rng.uniform(size=rng.integers(1, 20)) < 0.4).astype(float)
            n_rel = int(np.sum(rel > 0))
            a = rm.average_precision(rel)
            b = M.average_precision_at_k(rel, n_rel, len(rel))
            assert b == pytest.approx(a, abs=1e-12)


class TestBlockMaxOracle:
    """BlockMaxIndex against the reference's (scorer.py:33-142) — the
    build is deterministic from a score matrix, so bounds compare
    directly. The reference class needs a transform for the Bayesian
    bound; both sides get identically-parameterized transforms."""

    def test_block_maxima_and_bounds(self, ref):
        from bayesian_bm25_tpu import BayesianProbabilityTransform
        from bayesian_bm25_tpu.engine.block_max import BlockMaxIndex

        rng = np.random.default_rng(4)
        score_matrix = rng.gamma(1.5, 1.0, (7, 300)) * (
            rng.uniform(size=(7, 300)) < 0.3)
        ra = ref["scorer"].BlockMaxIndex(block_size=64)
        ra.build(score_matrix)
        ob = BlockMaxIndex(block_size=64)
        ob.build(score_matrix)
        n_blocks = int(np.ceil(300 / 64))
        for t in range(7):
            for blk in range(n_blocks):
                assert ob.block_upper_bound(t, blk) == pytest.approx(
                    ra.block_upper_bound(t, blk), abs=1e-12)
        rt = ref["probability"].BayesianProbabilityTransform(
            alpha=1.0, beta=2.0, base_rate=0.05)
        ot = BayesianProbabilityTransform(alpha=1.0, beta=2.0,
                                          base_rate=0.05)
        for t in range(7):
            for blk in range(n_blocks):
                assert ob.bayesian_block_upper_bound(
                    t, blk, ot) == pytest.approx(
                    ra.bayesian_block_upper_bound(t, blk, rt), abs=ATOL)

    def test_invalid_block_size(self, ref):
        from bayesian_bm25_tpu.engine.block_max import BlockMaxIndex

        with pytest.raises(ValueError):
            ref["scorer"].BlockMaxIndex(block_size=0)
        with pytest.raises(ValueError):
            BlockMaxIndex(block_size=0)

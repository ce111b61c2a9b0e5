"""Search diagnostics + separability gate tests."""

import numpy as np
import pytest

from bayesian_bm25_tpu.engine.ivf import SimpleIVF
from bayesian_bm25_tpu.utils.diagnostics import (
    SearchDiagnostics,
    build_exact_search_diagnostics,
    build_ivf_search_diagnostics,
    separability_gate,
)


class TestDiagnostics:
    def test_properties(self):
        d = SearchDiagnostics(
            accepted_distances=[0.1, 0.2],
            contrast_distances=[0.6, 0.8],
            purity=0.9, coverage=0.8,
        )
        assert d.cohesion == pytest.approx(0.15)
        assert d.separation == pytest.approx(0.7)
        assert d.reliability == pytest.approx(0.72)

    def test_empty_defaults(self):
        d = SearchDiagnostics([], [])
        assert d.cohesion == 1.0
        assert d.separation == d.cohesion

    def test_clipping(self):
        d = SearchDiagnostics([0.1], [0.2], purity=1.5, coverage=-0.5)
        assert d.purity == 1.0
        assert d.coverage == 0.0


class TestExactBuilder:
    def test_shells(self):
        scores = np.linspace(0.9, 0.1, 30)
        d = build_exact_search_diagnostics(scores, local_k=10, shell_k=10)
        assert len(d.accepted_distances) == 10
        assert len(d.contrast_distances) == 10
        assert d.separation > d.cohesion

    def test_empty(self):
        d = build_exact_search_diagnostics(np.array([]))
        assert d.purity == 0.0 and d.coverage == 0.0

    def test_short_list_no_shell(self):
        d = build_exact_search_diagnostics(np.array([0.9, 0.8]), local_k=5)
        assert len(d.contrast_distances) == 0


class TestGate:
    def test_well_separated_opens_gate(self):
        d = SearchDiagnostics([0.05, 0.1], [0.8, 0.9])
        assert separability_gate(d) > 0.8

    def test_no_separation_closes_gate(self):
        d = SearchDiagnostics([0.5, 0.5], [0.5, 0.5])
        assert separability_gate(d) == pytest.approx(0.02)

    def test_reliability_penalty(self):
        good = SearchDiagnostics([0.1], [0.9], purity=1.0)
        impure = SearchDiagnostics([0.1], [0.9], purity=0.3)
        assert separability_gate(impure) < separability_gate(good)

    def test_empty_returns_min(self):
        assert separability_gate(SearchDiagnostics([], [])) == 0.02

    def test_bounds(self):
        d = SearchDiagnostics([0.0], [2.0])
        assert separability_gate(d) <= 0.98


class TestIVFBuilder:
    def test_from_ivf_search(self):
        rng = np.random.default_rng(0)
        centers = np.eye(3, dtype=np.float32)
        emb = np.concatenate(
            [c + rng.normal(0, 0.05, (40, 3)) for c in centers]
        ).astype(np.float32)
        ivf = SimpleIVF.build(emb, n_cells=3)
        q = np.array([1.0, 0.05, 0.0], dtype=np.float32)
        res = ivf.search(q, k=10, nprobe=2)
        d = build_ivf_search_diagnostics(
            res.scores, res.cell_ids, res, ivf, local_k=10
        )
        assert 0 < d.purity <= 1.0
        assert len(d.accepted_distances) > 0
        gate = separability_gate(d)
        assert 0.02 <= gate <= 0.98

    def test_single_cell_fallback_contrast(self):
        rng = np.random.default_rng(1)
        emb = (np.array([1.0, 0, 0]) + rng.normal(0, 0.01, (30, 3))).astype(
            np.float32
        )
        ivf = SimpleIVF.build(emb, n_cells=2)
        q = np.array([1.0, 0, 0], dtype=np.float32)
        res = ivf.search(q, k=5, nprobe=1)
        d = build_ivf_search_diagnostics(
            res.scores, res.cell_ids, res, ivf, local_k=5
        )
        # All candidates share the primary cell -> centroid+residual fallback
        assert len(d.contrast_distances) >= 0  # no crash; gate is bounded
        assert 0.02 <= separability_gate(d) <= 0.98

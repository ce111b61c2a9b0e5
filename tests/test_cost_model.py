"""Pins the analytic sharded-retrieval cost model (parallel/cost_model.py)
against the round-3 single-chip TPU ablation it was calibrated on, and
its scaling-shape properties.

Measured reference point (BENCHMARK_RESULTS.md "Kernel-level", 50k docs
-> D_pad 51200, nq 8192, K 2048, hilo 2-pass): matmul 22.7 ms, leader
selection 14.8 ms, rare-postings merge 15.8 ms, winner-tf/transform
3.6 ms, 57 ms end-to-end. matmul + selection are first-principles
(FLOPs at 77% of v5e bf16 peak; HBM passes at the measured Pallas/XLA
rates) — agreement there is a real check. merge/tf use rate constants
calibrated AT this point, so their rows only pin that the calibration
stays wired correctly.
"""

import pytest

from bayesian_bm25_tpu.parallel import cost_model as cm

REF = dict(n_docs=51200, nq=8192, K=2048, k=10, matmul_passes=2)


class TestSingleChipCalibration:
    def test_matmul_first_principles(self):
        c = cm.retrieval_cost(**REF)
        assert c.matmul == pytest.approx(22.7e-3, rel=0.05)

    def test_selection_two_hbm_passes(self):
        c = cm.retrieval_cost(**REF)
        assert c.selection == pytest.approx(14.8e-3, rel=0.05)

    def test_merge_and_tf_calibration_wiring(self):
        c = cm.retrieval_cost(**REF)
        assert c.merge == pytest.approx(15.8e-3, rel=0.01)
        assert c.tf_transform == pytest.approx(3.6e-3, rel=0.01)

    def test_end_to_end_matches_measured_kernel(self):
        c = cm.retrieval_cost(**REF)
        assert c.total == pytest.approx(57e-3, rel=0.05)
        assert c.all_gather == 0.0
        assert c.ici_bytes == 0

    def test_throughput_is_kernel_ceiling(self):
        c = cm.retrieval_cost(**REF)
        # 8192 / 57 ms = ~144k q/s — the documented kernel ceiling.
        assert c.throughput(8192) == pytest.approx(144_000, rel=0.05)


class TestShardedPredictions:
    def test_merge_traffic_accounting(self):
        # BENCHMARK_RESULTS merge-cost model: k x n_shards x 16 B/query.
        for s in (2, 4, 8):
            c = cm.retrieval_cost(**REF, n_shards=s)
            assert c.ici_bytes == 8192 * 10 * 16 * s
            assert c.breakdown()["ici_bytes_per_query"] == 10 * 16 * s

    def test_local_k_trades_bandwidth(self):
        exact = cm.retrieval_cost(**REF, n_shards=8)
        lean = cm.retrieval_cost(**REF, n_shards=8, local_k=5)
        assert lean.ici_bytes == exact.ici_bytes // 2
        assert lean.all_gather == pytest.approx(exact.all_gather / 2)

    def test_speedup_monotone_then_saturates(self):
        rows = cm.scaling_table(51200, shards=(1, 2, 4, 8), **{
            k: v for k, v in REF.items() if k != "n_docs"})
        sp = [r["predicted_speedup"] for r in rows]
        assert sp[0] == pytest.approx(1.0)
        assert sp[1] > 1.0  # sharding 50k docs 2 ways still wins...
        for r in rows:
            assert r["efficiency"] <= 1.0 + 1e-9  # ...but never superlinear

    def test_efficiency_improves_with_corpus_size(self):
        # Fixed costs amortize: a 1M-doc corpus shards better than 50k.
        kw = {k: v for k, v in REF.items() if k != "n_docs"}
        eff_small = cm.scaling_table(51200, shards=(8,), **kw)[0]["efficiency"]
        eff_big = cm.scaling_table(1 << 20, shards=(8,), **kw)[0]["efficiency"]
        assert eff_big > eff_small

    def test_crossover_grows_with_corpus(self):
        kw = {k: v for k, v in REF.items() if k != "n_docs"}
        assert (cm.crossover_shards(1 << 20, **kw)
                >= cm.crossover_shards(51200, **kw))

    def test_guards(self):
        with pytest.raises(ValueError):
            cm.retrieval_cost(51200, n_shards=0)
        with pytest.raises(ValueError):
            # 64 shards of 640 docs cannot each return 1000 candidates
            cm.retrieval_cost(51200, n_shards=64, local_k=1000)


class TestExtraMergePasses:
    """Tier-2 / heavy merge-pass rows (round-5): the model's
    sbase-gather term must reproduce the measured 1M-doc stage times
    (BENCHMARK_RESULTS.md round-5 ablation) and shrink ~1/S on a
    doc-sharded mesh like the primary merge cap."""

    def test_tier2_pass_matches_measurement(self):
        # calibration point: 256 rows x cap 8202 = 56.9 ms
        t = cm.merge_pass_cost(256, 8202)
        assert abs(t - 56.9e-3) / 56.9e-3 < 0.01

    def test_heavy_pass_order_of_magnitude(self):
        # measured 12.3 ms at 256 x 2058; the pure-gather term
        # underestimates narrow passes (fixed sort/dispatch) — within 2x
        t = cm.merge_pass_cost(256, 2058)
        assert 6e-3 < t < 16e-3, t

    def test_sharding_shrinks_extra_passes(self):
        c1 = cm.retrieval_cost(
            1_000_000, nq=1024, K=1024, cand_cap=138,
            extra_passes=((256, 2058), (256, 8202)))
        c8 = cm.retrieval_cost(
            1_000_000, nq=1024, K=1024, cand_cap=138, n_shards=8,
            extra_passes=((256, 2058), (256, 8202)))
        assert c1.merge > c8.merge * 4  # caps shrink ~1/S
        assert c1.total > c8.total

    def test_1m_serving_total_in_band(self):
        """The modeled 1M single-chip chunk time lands in the measured
        ~115-155 ms band (BENCHMARK_RESULTS round-5: ~122 ms/chunk)."""
        c = cm.retrieval_cost(
            1_000_000, nq=1024, K=1024, cand_cap=138,
            extra_passes=((256, 2058), (256, 8202)))
        assert 0.08 < c.total < 0.18, c.total

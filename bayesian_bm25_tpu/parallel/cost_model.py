"""Analytic per-stage cost model for sharded sparse retrieval.

Why a model: this environment has ONE physical TPU chip, so multi-chip
scaling cannot be measured — only simulated on a serialized virtual CPU
mesh (benchmarks/sharded_scaling.py), where ratios are dominated by
cache artifacts. This module derives the per-stage costs of
``parallel/sharded.py:sharded_retrieve_topk_split_sparse`` analytically
from first principles (FLOPs / HBM bytes / ICI bytes) plus stage-rate
constants calibrated ONCE against the round-3 single-chip TPU ablation
(BENCHMARK_RESULTS.md "Kernel-level": matmul 22.7 ms at 77% of v5e bf16
peak, Pallas stripe block-max at 350 GB/s, extraction at the ~165 GB/s
XLA loop rate, merge 15.8 ms / tf+transform 3.6 ms at the 50k-doc
reference point). ``tests/test_cost_model.py`` pins the model against
those measured stage times and its scaling properties.

The model answers: given a corpus sharded D/S ways over an ICI mesh,
what does one retrieval batch cost per stage, and where does the
all_gather merge stop paying? Predictions carry the label the VERDICT
asked for: a MODEL, not a measurement — real-ICI numbers must replace
them the day a multi-chip pod is available.

Hardware constants (TPU v5e, public spec / scaling-book values):
  bf16 MXU peak      197 TFLOP/s per chip (int8: 394 TOP/s)
  HBM bandwidth      819 GB/s per chip
  ICI bandwidth      ~90 GB/s bidirectional per link pair (1-D ring)
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- hardware constants (v5e) ------------------------------------------------
PEAK_BF16_FLOPS = 197e12
PEAK_INT8_OPS = 394e12
HBM_BW = 819e9
ICI_BW = 90e9  # bidirectional ring bandwidth per direction pair, bytes/s

# --- calibrated stage rates (round-3 single-chip ablation, 50k docs) ---------
# Measured matmul efficiency: 22.7 ms for 2 exact bf16 passes of
# (8192, 2048) @ (2048, 51200) -> 2*8192*2048*51200*2 / 22.7e-3 = 151.5
# TFLOP/s = 77% of peak.
MATMUL_EFF = 0.77
# Pallas stripe block-max streams the (nq, D) score matrix at 350 GB/s
# (measured 4.8 ms over 8192 x 51200 f32).
BMAX_BW = 350e9
# Candidate extraction + tile top_k runs at the XLA elementwise-loop
# rate (~165 GB/s effective over one more full-matrix pass: 10 ms
# residual of the 14.8 ms selection stage).
EXTRACT_BW = 165e9
# Rare-postings merge: 15.8 ms at the 50k reference point (4096 tail
# rows, cap 266 candidates of 16 payload bytes across sort/gather/
# segment-sum passes) -> an effective ~28 merge-passes-equivalent
# bandwidth constant; scales with tail_rows * cand_cap.
MERGE_REF_S = 15.8e-3
MERGE_REF_CELLS = 4096 * 266
# winner-tf + transform: 3.6 ms at nq=8192, k=10 (gather + elementwise).
TF_REF_S = 3.6e-3
TF_REF_CELLS = 8192 * 10

# Per-candidate merge payload over ICI: score f32 + id i32 + tail-tf f32
# + doc-length f32 (parallel/sharded.py all_gather operands).
MERGE_BYTES_PER_CAND = 16

# Wide merge passes (light/heavy heavy pass, tier-2 pass) are dominated
# by the sbase row-gather from the (nq, D) score matrix. Calibrated at
# the round-5 1M-doc stage ablation (BENCHMARK_RESULTS.md: tier-2 merge
# 56.9 ms at ntB=256 x cap2=8202 -> 27.1 ns/element; the heavy pass at
# 256 x 2058 measured 12.3 ms, within ~2x of the pure-gather term —
# fixed sort/dispatch costs dominate as caps narrow).
SBASE_GATHER_S_PER_ELEM = 56.9e-3 / (256 * 8202)


def merge_pass_cost(n_rows: int, cand_cap: int,
                    n_shards: int = 1, k: int = 10) -> float:
    """Seconds for one extra sparse-merge pass (heavy or tier-2) over
    ``n_rows`` tail rows at candidate width ``cand_cap``; per-shard
    postings df (and so the cap beyond the k leaders) shrinks ~1/S on
    a doc-sharded mesh, mirroring sharded_candidate_cap."""
    local_cap = k + max((cand_cap - k) // max(n_shards, 1), 1)
    return n_rows * local_cap * SBASE_GATHER_S_PER_ELEM


@dataclass
class StageCosts:
    """Per-batch stage times (seconds) and merge traffic (bytes)."""

    matmul: float
    selection: float
    merge: float
    tf_transform: float
    all_gather: float
    ici_bytes: int
    n_shards: int
    nq: int = 8192

    @property
    def total(self) -> float:
        return (self.matmul + self.selection + self.merge +
                self.tf_transform + self.all_gather)

    def throughput(self, nq: int) -> float:
        return nq / self.total

    def breakdown(self) -> dict:
        return {
            "matmul_ms": self.matmul * 1e3,
            "selection_ms": self.selection * 1e3,
            "merge_ms": self.merge * 1e3,
            "tf_transform_ms": self.tf_transform * 1e3,
            "all_gather_ms": self.all_gather * 1e3,
            "total_ms": self.total * 1e3,
            "ici_bytes_per_query": self.ici_bytes // max(self.nq, 1),
        }


def retrieval_cost(
    n_docs: int,
    nq: int = 8192,
    K: int = 2048,
    k: int = 10,
    n_shards: int = 1,
    local_k: int | None = None,
    matmul_passes: int = 2,
    tail_row_frac: float = 0.5,
    cand_cap: int = 266,
    peak_flops: float = PEAK_BF16_FLOPS,
    extra_passes: tuple = (),
) -> StageCosts:
    """Model one sparse-retrieval batch on an S-shard 1-D ('d',) mesh.

    Stages mirror sharded_retrieve_topk_split_sparse: each shard scores
    its D/S doc slice (matmul), selects local_k leaders (selection),
    merges its rare postings (merge, postings df shrink ~1/S per shard),
    computes winner tf + transform, then all_gathers local_k candidates
    x 16 B/query for the global top-k re-select. ``local_k`` defaults to
    k (exact merge; completeness holds because every shard contributes
    its full local top-k).

    tail_row_frac: fraction of queries with >= 1 rare term (measured
    ~0.5 on the Zipf serving corpus); cand_cap: host-computed candidate
    cap at the 50k reference workload.

    ``extra_passes``: ((n_rows, cand_cap), ...) — the light/heavy HEAVY
    pass and the width-capped TIER-2 pass, costed by
    :func:`merge_pass_cost` (sbase-gather-bound; per-shard caps shrink
    ~1/S like the primary merge). E.g. the measured 1M-doc serving
    config is extra_passes=((256, 2058), (256, 8202)) per 1024-query
    chunk.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if local_k is None:
        local_k = k
    if local_k > n_docs // max(n_shards, 1):
        raise ValueError("local_k cannot exceed the per-shard doc count")

    d_local = (n_docs + n_shards - 1) // n_shards

    t_matmul = (2.0 * nq * K * d_local * matmul_passes
                / (peak_flops * MATMUL_EFF))
    # Selection reads the (nq, d_local) f32 score matrix twice: once
    # through the Pallas stripe block-max, once for tile extraction.
    score_bytes = 4.0 * nq * d_local
    t_select = score_bytes / BMAX_BW + score_bytes / EXTRACT_BW
    # Merge work scales with tail rows x candidate width; per-shard
    # postings df (and so the cap beyond the k leaders) shrinks ~1/S.
    local_cap = k + max((cand_cap - k) // n_shards, 1)
    merge_cells = (nq * tail_row_frac) * local_cap
    t_merge = MERGE_REF_S * merge_cells / MERGE_REF_CELLS
    for rows, cap_x in extra_passes:
        t_merge += merge_pass_cost(rows, cap_x, n_shards, k)
    t_tf = TF_REF_S * (nq * local_k) / TF_REF_CELLS

    if n_shards == 1:
        return StageCosts(t_matmul, t_select, t_merge, t_tf, 0.0, 0,
                          n_shards, nq)

    # Ring all_gather of V bytes per shard across S shards moves
    # V * (S-1) bytes through each link pair (scaling-book recipe).
    v_bytes = nq * local_k * MERGE_BYTES_PER_CAND
    t_ag = v_bytes * (n_shards - 1) / ICI_BW
    # Global re-select over (nq, S * local_k) gathered candidates —
    # tiny next to the big matrices; modeled at the extract rate.
    t_reselect = 4.0 * nq * n_shards * local_k / EXTRACT_BW
    return StageCosts(t_matmul, t_select, t_merge, t_tf + t_reselect,
                      t_ag, v_bytes * n_shards, n_shards, nq)


def scaling_table(n_docs: int, shards=(1, 2, 4, 8), **kw) -> list[dict]:
    """Predicted per-shard-count throughput, normalized to 1 shard."""
    base = retrieval_cost(n_docs, n_shards=1, **kw)
    rows = []
    for s in shards:
        c = retrieval_cost(n_docs, n_shards=s, **kw)
        rows.append({
            "n_shards": s,
            "predicted_speedup": base.total / c.total,
            "efficiency": base.total / c.total / s,
            **c.breakdown(),
        })
    return rows


def crossover_shards(n_docs: int, max_shards: int = 64, **kw) -> int:
    """Largest shard count that still improves batch latency — past it
    the all_gather + fixed per-shard costs outgrow the D/S savings."""
    best_s, best_t = 1, retrieval_cost(n_docs, n_shards=1, **kw).total
    s = 2
    while s <= max_shards:
        t = retrieval_cost(n_docs, n_shards=s, **kw).total
        if t < best_t:
            best_s, best_t = s, t
        s *= 2
    return best_s

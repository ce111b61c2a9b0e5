"""Pallas TPU kernel for batched BM25 scoring over the doc-major term table.

Grid: (query_blocks, doc_blocks, term_blocks). Each program scores a block
of QUERY_BLOCK queries against a (BD, BT) tile of the term table held in
VMEM:

    for r in range(QUERY_BLOCK):            # static
        for j in 0..Q:                       # fori_loop, scalars from SMEM
            m        = (ids_tile == qids[r, j])   # VPU compare
            score_r += qcnt[r, j] * sum(w_tile * m, 1)
            tf_r    += sum(m, 1)

Query ids/counts are scalar-prefetched into SMEM. The innermost grid
dimension walks term blocks and accumulates into the same (QUERY_BLOCK, BD)
output tile (initialized at t == 0), so arbitrarily wide documents stream
through VMEM without blowing the ~16 MB budget; the query block amortizes
each HBM->VMEM tile transfer across 8 queries. No gathers, no scatters, no
dynamic shapes — the doc-major layout was chosen at index-build time so the
hot loop is pure compare-multiply-reduce at VPU rate.

Semantically identical to engine/scoring.py:score_all_xla (the CPU/parity
path); tests assert equality in interpret mode and on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_BLOCK = 8
DOC_BLOCK = 2048
TERM_BLOCK = 512


def _bm25_kernel(qids_ref, qcnt_ref, ids_ref, w_ref, score_ref, tf_ref):
    """One (query-block, doc-block, term-block) step; accumulates over the
    term-block grid dimension."""
    qb = pl.program_id(0)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        score_ref[...] = jnp.zeros_like(score_ref)
        tf_ref[...] = jnp.zeros_like(tf_ref)

    ids = ids_ref[...]
    w = w_ref[...]
    Q = qids_ref.shape[1]

    for r in range(QUERY_BLOCK):  # static unroll over the query block
        # Accumulate masked weights elementwise over the (BD, BT) tile for
        # all Q terms, then reduce across lanes ONCE per query — cross-lane
        # reductions are the expensive VPU op, so they are hoisted out of
        # the term loop.
        def body(j, carry):
            acc2d, tf2d = carry
            qid = qids_ref[qb * QUERY_BLOCK + r, j]  # SMEM scalar read
            cnt = qcnt_ref[qb * QUERY_BLOCK + r, j]
            m = (ids == qid).astype(jnp.float32)
            return acc2d + (cnt * m) * w, tf2d + m

        acc2d, tf2d = jax.lax.fori_loop(
            0, Q, body, (jnp.zeros_like(w), jnp.zeros_like(w))
        )
        score_ref[r, :] += jnp.sum(acc2d, axis=1)
        tf_ref[r, :] += jnp.sum(tf2d, axis=1)


# SMEM holds the scalar-prefetched query arrays padded to 128 lanes
# (rows x 128 x 4 B each, 1 MB total budget) -> cap rows per kernel launch.
QUERY_CHUNK = 512


def score_all_pallas(term_ids, weights, qids, qcnt, *, interpret: bool = False):
    """(nq, D) scores and tf counts for arbitrarily large query batches.

    Batches beyond QUERY_CHUNK are split into fixed-shape chunks (bounded
    SMEM for the prefetched query scalars, and at most two compiled shapes).
    """
    nq = qids.shape[0]
    if nq <= QUERY_CHUNK:
        return _score_chunk_pallas(term_ids, weights, qids, qcnt,
                                   interpret=interpret)
    outs_s, outs_t = [], []
    for lo in range(0, nq, QUERY_CHUNK):
        hi = min(lo + QUERY_CHUNK, nq)
        pad = QUERY_CHUNK - (hi - lo)
        qi = jnp.pad(qids[lo:hi], ((0, pad), (0, 0)), constant_values=-2)
        qc = jnp.pad(qcnt[lo:hi], ((0, pad), (0, 0)))
        s, t = _score_chunk_pallas(term_ids, weights, qi, qc,
                                   interpret=interpret)
        outs_s.append(s[: hi - lo])
        outs_t.append(t[: hi - lo])
    return jnp.concatenate(outs_s), jnp.concatenate(outs_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _score_chunk_pallas(term_ids, weights, qids, qcnt, *, interpret: bool = False):
    """Single kernel launch for a chunk of <= QUERY_CHUNK queries."""
    D, T = term_ids.shape
    nq, Q = qids.shape
    bd = min(DOC_BLOCK, D)
    while D % bd:  # index built with a smaller doc_pad_multiple
        bd //= 2
    bt = min(TERM_BLOCK, T)
    if D % bd or T % bt:
        raise ValueError(
            f"term table ({D}, {T}) must be padded to multiples of "
            f"({bd}, {bt}); rebuild the index with matching pad multiples"
        )

    pad = (-nq) % QUERY_BLOCK
    qids_p = jnp.pad(qids, ((0, pad), (0, 0)), constant_values=-2)
    qcnt_p = jnp.pad(qcnt, ((0, pad), (0, 0)))
    nq_p = nq + pad

    grid = (nq_p // QUERY_BLOCK, D // bd, T // bt)

    kernel = pl.pallas_call(
        _bm25_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bd, bt), lambda i, j, t, qids, qcnt: (j, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bd, bt), lambda i, j, t, qids, qcnt: (j, t),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (QUERY_BLOCK, bd), lambda i, j, t, qids, qcnt: (i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (QUERY_BLOCK, bd), lambda i, j, t, qids, qcnt: (i, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nq_p, D), jnp.float32),
            jax.ShapeDtypeStruct((nq_p, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * nq_p * D * T * Q,
            bytes_accessed=(nq_p // QUERY_BLOCK) * (D * T * 8) + 2 * nq_p * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    scores, tfs = kernel(qids_p, qcnt_p, term_ids, weights)
    return scores[:nq], tfs[:nq]

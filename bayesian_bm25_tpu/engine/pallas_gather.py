"""Pallas TPU kernel: exact row-wise gather via one-hot MXU matmuls.

The sparse-candidate merge (engine/split_index.py:_sparse_merge) needs
``sbase[i, c] = scores[tail_rows[i], sid[i, c]]`` — (nt, cap) elements
scattered across an (nq, D_pad) matrix. XLA lowers that fancy gather to
scalar loads at ~25 ns/element (16-28 ms per 8192-query batch at 50k
docs); this kernel instead streams each needed row into VMEM once
(grid (nt,), one (G, 128) tile per row) and performs the gather as
one-hot matrix multiplies on the MXU:

    row (G, 128) f32  --exact 3-way bf16 split-->  r1 + r2 + r3
    cand = onehot_blk (cap, G) @ r_i     three bf16 MXU passes; one-hot
                                         rows select single addends, so
                                         each pass is EXACT and the f32
                                         value reassembles bit-for-bit
    sbase[c] = sum(cand[c] * (lane == sid[c] % 128))      # VPU select

Exactness: a bf16 mantissa holds 8 of f32's 24 bits, so the 3-way
rounding split (r1 = bf16(x), r2 = bf16(x - r1), r3 = x - r1 - r2)
is lossless, and a dot product whose left operand is one-hot performs
no additions of nonzero pairs — each output is a single product
1.0 * r_i[j], exact in any precision. Domain: zero or finite x with
|x| in roughly [2**-110, 3.38e38] — above that bf16 rounding
overflows to inf (NaN cascade), below it the residual parts flush to
zero. BM25 scores are non-negative sums of O(1) impacts, far inside
the domain. Measured on v5e: 7.5 ms vs 16.8 ms for the XLA gather
(nt=4096, cap=266, D_pad=51200), bit-identical output.

Caveats (enforced by ``eligible()``):
- ``scores`` must be finite: -inf rows (doc_mask paths) would produce
  0 * inf = NaN inside the matmul.
- The whole row plus its bf16 splits must fit VMEM — D_pad <= 2**18.

Out-of-range ids (the merge's D_pad sentinel for invalid candidate
slots) match no one-hot column and gather literal 0.0; callers mask
those slots downstream, exactly as they do for the XLA gather's
clamped-index garbage.

Reference context: this accelerates the candidate-scoring stage that the
reference delegates to bm25s' scipy postings traversal
(/root/reference/bayesian_bm25/scorer.py:525-529).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# One f32 row (4 B/elem) + three bf16 splits (6 B/elem) + the (cap, G)
# one-hot must fit comfortably in ~16 MB of VMEM.
MAX_DPAD = 1 << 18


def eligible(d_pad: int, nt: int, *, masked: bool = False) -> bool:
    """True when the one-hot MXU gather is usable and worth dispatching."""
    if masked:
        return False  # -inf scores poison the matmul (0 * inf = NaN)
    if d_pad % _LANES != 0 or d_pad > MAX_DPAD:
        return False
    return nt >= 64  # grid overhead beats scalar loads only in bulk


def _row_gather_kernel(trows_ref, sid_ref, row_ref, out_ref):
    blocks = row_ref[0]                                      # (G, 128) f32
    G = blocks.shape[0]

    # Exact 3-way bf16 truncation split of the f32 row.
    r1 = blocks.astype(jnp.bfloat16)
    d1 = blocks - r1.astype(jnp.float32)
    r2 = d1.astype(jnp.bfloat16)
    r3 = (d1 - r2.astype(jnp.float32)).astype(jnp.bfloat16)

    sid = sid_ref[0, 0, :]                                   # (cap,)
    cap = sid.shape[0]
    blk = (sid // _LANES).reshape(cap, 1)
    off = (sid % _LANES).reshape(cap, 1)

    gio = jax.lax.broadcasted_iota(jnp.int32, (cap, G), 1)
    oh = (gio == blk).astype(jnp.bfloat16)                   # (cap, G)

    cand = (
        jnp.dot(oh, r1, preferred_element_type=jnp.float32)
        + jnp.dot(oh, r2, preferred_element_type=jnp.float32)
        + jnp.dot(oh, r3, preferred_element_type=jnp.float32)
    )                                                        # (cap, 128)

    lio = jax.lax.broadcasted_iota(jnp.int32, (cap, _LANES), 1)
    out_ref[0, 0, :] = jnp.sum(jnp.where(lio == off, cand, 0.0), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_gather_call(scores, sid, trows, *, interpret: bool):
    nq, d_pad = scores.shape
    nt, cap = sid.shape
    G = d_pad // _LANES
    out = pl.pallas_call(
        _row_gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, 1, cap), lambda i, trows: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, _LANES), lambda i, trows: (trows[i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cap), lambda i, trows: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nt, 1, cap), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * cap * G * _LANES * 3,
            bytes_accessed=nt * d_pad * 4 + nt * cap * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(trows, sid.reshape(nt, 1, cap), scores.reshape(nq, G, _LANES))
    return out.reshape(nt, cap)


def row_gather(scores, sid, trows):
    """``scores[trows[:, None], sid]`` with out-of-range sid -> 0.0.

    ``scores``: (nq, D_pad) finite f32; ``sid``: (nt, cap) int32 in
    [0, D_pad] (D_pad = sentinel); ``trows``: (nt,) int32 in [0, nq).
    Runs the Pallas kernel on TPU, interpret mode elsewhere (so CPU test
    runs exercise the identical kernel code path).
    """
    interpret = jax.default_backend() != "tpu"
    return _row_gather_call(scores.astype(jnp.float32),
                            sid.astype(jnp.int32),
                            trows.astype(jnp.int32), interpret=interpret)

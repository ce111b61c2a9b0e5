"""Pallas TPU kernel: per-block column maxima of a score matrix.

``exact_topk_blockwise`` (engine/split_index.py) prefilters top-k
selection with per-256-column block maxima. XLA lowers the natural
``scores.reshape(nq, G, B).max(axis=2)`` to a ~160 GB/s loop on v5e —
far under HBM speed — and refuses to fuse the reduce into the scoring
matmul while the score matrix itself is also an output (measured:
22.7 ms matmul alone, 33.2 ms with the reduce as a second output).
This kernel streams row stripes ``(RQ, D)`` through VMEM once and
reduces in-register: 4.8 ms vs 10.4 ms for (8192, 51200) f32 on v5e
(350 GB/s vs 160 GB/s), bit-identical maxima.

The kernel emits RAW maxima over the full padded width; validity
masking (documents beyond ``n_docs``) is applied by the caller on the
small (nq, G) result — one partial block is recomputed from a (nq, B)
slice, blocks entirely past the boundary drop to -inf. That keeps the
hot kernel mask-free and handles any ``valid_upto``.

The output pads G up to a lane multiple (Gp = ceil(G/128)*128, -inf
fill) to satisfy the TPU (8, 128) block-shape divisibility rule.

Reference context: accelerates the top-k selection stage the reference
performs with numpy argpartition over bm25s scores
(/root/reference/bayesian_bm25/scorer.py:520-558).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
# Input stripe (RQ, D) f32, double-buffered, must fit ~16 MB VMEM with
# headroom for the output block.
_VMEM_STRIPE_BYTES = 8 * 1024 * 1024


def _stripe_rows(nq: int, d: int) -> int:
    """Largest supported stripe height for this shape, 0 if none."""
    for rq in (16, 8):
        if nq % rq == 0 and rq * d * 4 <= _VMEM_STRIPE_BYTES:
            return rq
    return 0


# Column-chunk width of the 2-D grid variant (large D): one (128, _CD)
# f32 block is 1 MB — fits VMEM at any corpus size.
_CD = 2048


def _grid2d_ok(nq: int, d: int, block: int) -> bool:
    """The 2-D (row-block, column-chunk) variant with transposed output:
    blocks (128, _CD) in, (_CD//block, 128) out — both satisfy the
    (8, 128) divisibility rule for any block in {128, 256}."""
    return (nq % 128 == 0 and d % _CD == 0 and _CD % block == 0
            and (_CD // block) % 8 == 0)


def eligible(nq: int, d: int, block: int) -> bool:
    """True when a Pallas reduce variant is usable for this shape."""
    if block % _LANES != 0 or d % block != 0:
        return False
    return _stripe_rows(nq, d) > 0 or _grid2d_ok(nq, d, block)


def _bmax_kernel(x_ref, o_ref, *, block: int, valid_upto: int | None):
    x = x_ref[...]                                    # (RQ, D) f32
    rq, d = x.shape
    g = d // block
    if valid_upto is not None and valid_upto < d:
        col = jax.lax.broadcasted_iota(jnp.int32, (rq, d), 1)
        x = jnp.where(col < valid_upto, x, -jnp.inf)
    m = x.reshape(rq, g, block).max(axis=2)           # (RQ, G)
    gp = o_ref.shape[1]
    if gp > g:
        m = jnp.concatenate(
            [m, jnp.full((rq, gp - g), -jnp.inf, jnp.float32)], axis=1)
    o_ref[...] = m


def _bmax2d_kernel(x_ref, o_ref, *, block: int, valid_upto: int | None):
    x = x_ref[...]                                    # (128, _CD) f32
    rq, cd = x.shape
    if valid_upto is not None:
        j = pl.program_id(1)
        col = (j * cd
               + jax.lax.broadcasted_iota(jnp.int32, (rq, cd), 1))
        x = jnp.where(col < valid_upto, x, -jnp.inf)
    m = x.reshape(rq, cd // block, block).max(axis=2)  # (128, CDG)
    o_ref[...] = m.T                                   # (CDG, 128)


@functools.partial(jax.jit,
                   static_argnames=("block", "valid_upto", "interpret"))
def _block_max_call(scores, *, block: int, valid_upto, interpret: bool):
    nq, d = scores.shape
    g = d // block
    rq = _stripe_rows(nq, d)
    if rq:
        gp = -(-g // _LANES) * _LANES
        out = pl.pallas_call(
            functools.partial(_bmax_kernel, block=block,
                              valid_upto=valid_upto),
            grid=(nq // rq,),
            in_specs=[pl.BlockSpec((rq, d), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rq, gp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nq, gp), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=nq * d, bytes_accessed=nq * d * 4 + nq * gp * 4,
                transcendentals=0),
            interpret=interpret,
        )(scores)
        return out[:, :g]
    # Large D: 2-D grid over (row blocks, column chunks), transposed
    # (G, nq) output so both block shapes satisfy the (8, 128) rule;
    # the final (small) transpose is XLA's.
    cdg = _CD // block
    out = pl.pallas_call(
        functools.partial(_bmax2d_kernel, block=block,
                          valid_upto=valid_upto),
        grid=(nq // 128, d // _CD),
        in_specs=[pl.BlockSpec((128, _CD), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((cdg, 128), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((g, nq), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nq * d, bytes_accessed=nq * d * 4 + nq * g * 4,
            transcendentals=0),
        interpret=interpret,
    )(scores)
    return out.T


def block_max(scores, block: int, valid_upto: int | None = None):
    """Per-row maxima over contiguous ``block``-wide column groups.

    ``scores``: (nq, D) f32 with D % block == 0; returns (nq, D//block)
    f32, bit-identical to ``scores.reshape(nq, G, block).max(axis=2)``
    with columns >= ``valid_upto`` (if given) treated as -inf — the
    masking runs in-register inside the kernel, so a padded matrix
    never needs a masked copy or a separate partial-block fixup.
    -inf entries are legal (doc_mask paths). Runs the Pallas kernel on
    TPU, interpret mode elsewhere so CPU tests drive the same code.
    """
    interpret = jax.default_backend() != "tpu"
    return _block_max_call(scores.astype(jnp.float32), block=block,
                           valid_upto=valid_upto, interpret=interpret)

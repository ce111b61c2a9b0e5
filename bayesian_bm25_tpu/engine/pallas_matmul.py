"""Pallas TPU kernel: impact matmul with the leader-selection block-max
fused into the epilogue.

The sparse-candidate retrieve pays one full HBM read of the (nq, D)
score matrix just to reduce it to per-256-column block maxima
(engine/pallas_reduce.py, ~4.8 ms at (8192, 51200) on v5e) because XLA
will not fuse a reduce into a matmul whose product is also an output
(measured: 22.7 ms matmul alone vs 33.2 ms fused as a second output).
This kernel computes the maxima while the score tile is still in
registers: the matmul writes scores AND (G, nq) block maxima in one
pass, so the separate reduce pass disappears.

Storage modes (matching ``_impact_matmul``, split_index.py):
  * hilo — two exact-operand bf16 dot passes accumulated in f32;
  * int8 — two int8xint8->int32 dots + the per-doc scale epilogue
    (scores = s0*hidot + s1*lodot), still inside the kernel;
  * bf16 — one bf16 pass.
f32 storage (multi-pass HIGHEST emulation) is NOT supported — the
caller keeps the unfused path there.

Bit-parity: each per-tile ``dot_general`` contracts the full K axis
with f32/int32 accumulation — the same contraction the XLA path runs —
and the maxima reduce the identical f32 tile values, so hilo/bf16
outputs match the unfused path bit-for-bit. int8 is last-ulp class
ONLY: the scale epilogue (s0*hidot + s1*lodot) may round through an
fma on one compiler and mul+add on the other; the integer dots are
exact on both.

Layout: grid (nq/RQ, D/CB) with RQ=CB=256; the bmax output is
TRANSPOSED (G, nq) in (8, RQ) blocks revisited over 8 consecutive
column steps (dynamic sublane store), satisfying the (8, 128)
block-shape rule — same trick as pallas_reduce's 2-D-grid variant.
Validity masking (docs >= n_docs) happens in-register for the maxima;
score outputs stay raw, candidates re-mask at gather time.

Reference context: the reference scores and selects in two numpy
passes (/root/reference/bayesian_bm25/scorer.py:509-558); on TPU both
land in one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_RQ = 256   # query rows per tile
_CB = 256   # doc columns per tile == selection block size
_GROUP = 8  # bmax rows written per (8, RQ) output block
_DN = (((1,), (1,)), ((), ()))  # contract K with K


def eligible(nq: int, K: int, D: int, block: int) -> bool:
    """Shapes the fused kernel supports: full-K operand tiles in VMEM,
    grid-aligned batch/doc axes, bmax groups of 8 column tiles."""
    return (block == _CB and nq % _RQ == 0 and D % (_CB * _GROUP) == 0
            and K % 128 == 0 and K * (_RQ + 2 * _CB) * 2 <= 6 * 2**20)


def _store_bmax(m_ref, acc, n_docs: int):
    j = pl.program_id(1)
    col = j * _CB + jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    m = jnp.where(col < n_docs, acc, -jnp.inf).max(axis=1)
    m_ref[pl.dslice(j % _GROUP, 1), :] = m[None, :]


def _kernel_pair(q_ref, h_ref, l_ref, o_ref, m_ref, *, n_docs: int):
    q = q_ref[...]                        # (RQ, K) bf16
    acc = (jax.lax.dot_general(q, h_ref[...], _DN,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(q, l_ref[...], _DN,
                                 preferred_element_type=jnp.float32))
    o_ref[...] = acc
    _store_bmax(m_ref, acc, n_docs)


def _kernel_int8(q_ref, h_ref, l_ref, s_ref, o_ref, m_ref, *,
                 n_docs: int):
    q = q_ref[...]                        # (RQ, K) int8
    hd = jax.lax.dot_general(q, h_ref[...], _DN,
                             preferred_element_type=jnp.int32)
    ld = jax.lax.dot_general(q, l_ref[...], _DN,
                             preferred_element_type=jnp.int32)
    s = s_ref[...]                        # (8, CB) f32; rows 0/1 real
    acc = (hd.astype(jnp.float32) * s[0][None, :]
           + ld.astype(jnp.float32) * s[1][None, :])
    o_ref[...] = acc
    _store_bmax(m_ref, acc, n_docs)


def _kernel_single(q_ref, h_ref, o_ref, m_ref, *, n_docs: int):
    acc = jax.lax.dot_general(q_ref[...], h_ref[...], _DN,
                              preferred_element_type=jnp.float32)
    o_ref[...] = acc
    _store_bmax(m_ref, acc, n_docs)


@functools.partial(jax.jit, static_argnames=("n_docs", "mode",
                                             "interpret"))
def _call(q, hi, lo, scale, *, n_docs: int, mode: str, interpret: bool):
    nq, K = q.shape
    D = hi.shape[0]
    G = D // _CB
    qspec = pl.BlockSpec((_RQ, K), lambda i, j: (i, 0))
    bspec = pl.BlockSpec((_CB, K), lambda i, j: (j, 0))
    if mode == "int8":
        # scale rows padded to the (8, 128) sublane rule; rows 2..7 junk
        s_op = jnp.zeros((8, D), jnp.float32).at[:2].set(scale)
        kernel = _kernel_int8
        in_specs = [qspec, bspec, bspec,
                    pl.BlockSpec((8, _CB), lambda i, j: (0, j))]
        ops = (q, hi, lo, s_op)
        passes = 2
    elif mode == "pair":
        kernel = _kernel_pair
        in_specs = [qspec, bspec, bspec]
        ops = (q, hi, lo)
        passes = 2
    else:
        kernel = _kernel_single
        in_specs = [qspec, bspec]
        ops = (q, hi)
        passes = 1
    scores, bmax_t = pl.pallas_call(
        functools.partial(kernel, n_docs=n_docs),
        grid=(nq // _RQ, D // _CB),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((_RQ, _CB), lambda i, j: (i, j)),
            pl.BlockSpec((_GROUP, _RQ), lambda i, j: (j // _GROUP, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, D), jnp.float32),
            jax.ShapeDtypeStruct((G, nq), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * D * K * passes,
            bytes_accessed=(q.size * q.dtype.itemsize
                            + hi.size * hi.dtype.itemsize * passes
                            + nq * D * 4 + G * nq * 4),
            transcendentals=0),
        interpret=interpret,
    )(*ops)
    return scores, bmax_t.T


def impact_matmul_bmax(qvec, impact, impact_lo, impact_scale,
                       n_docs: int):
    """Fused scoring matmul + per-256-block column maxima.

    ``qvec``: (nq, K) f32 integer counts (exact in bf16/int8);
    ``impact``/``impact_lo``: (D, K) hilo bf16 pair, int8 pair (with
    ``impact_scale`` (2, D)), or a single bf16 matrix (impact_lo
    None/zero-width). Returns (scores (nq, D) f32, bmax (nq, D//256)
    f32) with docs >= n_docs treated as -inf in the maxima only.
    Bit-identical to ``_impact_matmul`` + ``pallas_reduce.block_max``.
    Callers must keep f32 storage (multi-pass precision emulation) on
    the unfused path.
    """
    interpret = jax.default_backend() != "tpu"
    if impact_scale is not None:
        return _call(qvec.astype(jnp.int8), impact, impact_lo,
                     impact_scale, n_docs=n_docs, mode="int8",
                     interpret=interpret)
    if impact_lo is not None and impact_lo.shape[1]:
        return _call(qvec.astype(impact.dtype), impact, impact_lo,
                     None, n_docs=n_docs, mode="pair",
                     interpret=interpret)
    if impact.dtype != jnp.bfloat16:
        raise ValueError(
            "fused matmul+bmax supports hilo/int8/bf16 storage only "
            f"(got single {impact.dtype}); use the unfused path")
    return _call(qvec.astype(impact.dtype), impact, None, None,
                 n_docs=n_docs, mode="single", interpret=interpret)

"""Pallas TPU kernel: exact top-k over a narrow candidate matrix.

The selection tail of ``exact_topk_blockwise`` (engine/split_index.py)
finishes with ``lax.top_k`` over the gathered candidate matrix
(nq, k*block) — a few thousand columns. XLA lowers that to a sorting
network whose cost dwarfs the data movement: the candidates are one
~84 MB pass at the bench regime, yet the stage measures ~10 ms of the
57 ms kernel. For small k an iterative max-extract is far cheaper:
k unrolled rounds of (masked max, first-occurrence argmin, mask) over a
VMEM-resident (RQ, C) stripe — pure VPU work on in-register data, one
HBM read of the candidates total.

Tie parity: ``lax.top_k`` emits equal values in ascending-index order;
the first-occurrence extraction (argmin of index over the maximal,
not-yet-taken entries) reproduces that exactly, so the kernel is
bit-identical to ``lax.top_k`` in both values and positions — including
rows with fewer than k finite entries, where the explicit taken-mask
(not value masking) steps through -inf entries in index order just like
the sort does.

Reference context: this replaces the numpy argpartition selection the
reference performs on host (/root/reference/bayesian_bm25/scorer.py:
520-558) as the last stage of the TPU-resident retrieval kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
# (RQ, C) f32 input stripe + bool mask + accumulators, double-buffered.
_VMEM_STRIPE_BYTES = 6 * 1024 * 1024
_MAX_K = 64


def _stripe_rows(nq: int, c: int) -> int:
    for rq in (256, 128, 64, 32, 16, 8):
        if nq % rq == 0 and rq * c * 4 <= _VMEM_STRIPE_BYTES:
            return rq
    return 0


def eligible(nq: int, c: int, k: int) -> bool:
    """True when the iterative kernel is usable for this shape: lane-
    aligned width, small k, and a stripe height that divides nq."""
    return (c % _LANES == 0 and 0 < k <= _MAX_K
            and _stripe_rows(nq, c) > 0)


def _topk_kernel(x_ref, v_ref, p_ref, *, k: int):
    x = x_ref[...]                                     # (RQ, C) f32
    rq, c = x.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (rq, c), 1)
    taken = jnp.zeros((rq, c), jnp.bool_)
    vs, ps = [], []
    for _ in range(k):
        live = jnp.where(taken, -jnp.inf, x)
        m = live.max(axis=1)                           # (RQ,)
        ism = (live == m[:, None]) & ~taken
        pos = jnp.where(ism, idx, c).min(axis=1)       # first occurrence
        taken = taken | (idx == pos[:, None])
        vs.append(m)
        ps.append(pos)
    kp = v_ref.shape[1]
    pad = [jnp.full((rq,), -jnp.inf, jnp.float32)] * (kp - k)
    v_ref[...] = jnp.stack(vs + pad, axis=1)
    pad_i = [jnp.zeros((rq,), jnp.int32)] * (kp - k)
    p_ref[...] = jnp.stack(ps + pad_i, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _topk_call(x, *, k: int, interpret: bool):
    nq, c = x.shape
    rq = _stripe_rows(nq, c)
    kp = _LANES                                        # lane-padded k
    v, p = pl.pallas_call(
        functools.partial(_topk_kernel, k=k),
        grid=(nq // rq,),
        in_specs=[pl.BlockSpec((rq, c), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((rq, kp), lambda i: (i, 0)),
                   pl.BlockSpec((rq, kp), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((nq, kp), jnp.float32),
                   jax.ShapeDtypeStruct((nq, kp), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * k * nq * c,
            bytes_accessed=nq * c * 4 + 2 * nq * kp * 4,
            transcendentals=0),
        interpret=interpret,
    )(x)
    return v[:, :k], p[:, :k]


def topk(x, k: int):
    """Exact ``lax.top_k(x, k)`` (values, positions), bit-identical
    including tie order, via k rounds of in-VMEM max-extraction.

    ``x``: (nq, C) f32, C % 128 == 0, k <= 64. Runs the Pallas kernel
    on TPU, interpret mode elsewhere so CPU tests drive the same code.
    Callers gate on :func:`eligible`.
    """
    interpret = jax.default_backend() != "tpu"
    return _topk_call(x.astype(jnp.float32), k=k, interpret=interpret)

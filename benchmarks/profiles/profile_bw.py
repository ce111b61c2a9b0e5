"""Raw-bandwidth + layout diagnosis for the (8192, 51200) score matrix.

Every consumer of the matmul output (top_k, block max, gather) runs at
~50-60 GB/s — 15x below v5e HBM. Hypotheses:
  (a) the device just is that slow for vector ops (measure: elementwise
      copy, row reduce on a FRESH array);
  (b) the matmul output layout is transposed, so row-major consumers
      read strided (measure: same ops on matmul output vs fresh array);
  (c) lax.top_k is compute-bound regardless (measure vs raw reduce).

Run on the real TPU:  python _profile_bw.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


from timed import timed  # noqa: E402


def main():
    nq, D, K = 8192, 51200, 2048
    key = jax.random.PRNGKey(0)
    fresh = jax.random.normal(key, (nq, D), jnp.float32)
    qv = jax.random.normal(key, (nq, K), jnp.bfloat16)
    W = jax.random.normal(key, (D, K), jnp.bfloat16)
    GB = nq * D * 4 / 1e9

    @jax.jit
    def mm(qv, W):
        return jnp.dot(qv, W.T, preferred_element_type=jnp.float32)

    ms, mm_out = timed(mm, qv, W)
    print(f"matmul (nq,K)@(K,D)                {ms:7.2f} ms "
          f"(write {GB:.2f} GB -> {GB/ms*1e3:6.1f} GB/s out)", flush=True)

    cases = {
        "fresh": fresh,
        "mmout": mm_out,
    }
    for name, arr in cases.items():
        @jax.jit
        def red(a):
            return a.max(axis=1)

        ms, _ = timed(red, arr)
        print(f"{name} row max (1 read pass)        {ms:7.2f} ms "
              f"({GB/ms*1e3:6.1f} GB/s)", flush=True)

        @jax.jit
        def ew(a):
            return a * 1.0001

        ms, _ = timed(ew, arr)
        print(f"{name} elementwise (read+write)     {ms:7.2f} ms "
              f"({2*GB/ms*1e3:6.1f} GB/s)", flush=True)

        @jax.jit
        def tk(a):
            return jax.lax.top_k(a, 10)

        ms, _ = timed(tk, arr)
        print(f"{name} lax.top_k k=10               {ms:7.2f} ms "
              f"({GB/ms*1e3:6.1f} GB/s)", flush=True)

        @partial(jax.jit, static_argnames=("block",))
        def bmax(a, block):
            G = D // block
            return a.reshape(nq, G, block).max(axis=2)

        ms, _ = timed(bmax, arr, block=512)
        print(f"{name} block max (reshape ax2)      {ms:7.2f} ms "
              f"({GB/ms*1e3:6.1f} GB/s)", flush=True)

        @jax.jit
        def bmax_stride(a):
            # strided partition: reduce over the SUBLANE axis
            return a.reshape(nq, D // 512, 512).max(axis=1)

        ms, _ = timed(bmax_stride, arr)
        print(f"{name} block max (reshape ax1)      {ms:7.2f} ms "
              f"({GB/ms*1e3:6.1f} GB/s)", flush=True)

    # copy mm_out then top_k: does a relayout copy fix consumers?
    @jax.jit
    def copy_then_topk(a):
        b = jax.lax.optimization_barrier(a + 0.0)
        return jax.lax.top_k(b, 10)

    ms, _ = timed(copy_then_topk, mm_out)
    print(f"mmout copy + top_k                 {ms:7.2f} ms", flush=True)

    # fused matmul -> block max in ONE jit (never materialize scores?)
    @jax.jit
    def mm_bmax(qv, W):
        s = jnp.dot(qv, W.T, preferred_element_type=jnp.float32)
        return s.reshape(nq, D // 512, 512).max(axis=2)

    ms, _ = timed(mm_bmax, qv, W)
    print(f"fused matmul + block max           {ms:7.2f} ms", flush=True)

    # bf16 scores: halve the traffic for selection passes
    @jax.jit
    def tk_bf16(a):
        return jax.lax.top_k(a.astype(jnp.bfloat16), 10)

    ms, _ = timed(tk_bf16, fresh)
    print(f"fresh bf16-cast + top_k            {ms:7.2f} ms", flush=True)

    @jax.jit
    def red_bf16(a):
        return a.astype(jnp.bfloat16).max(axis=1)

    ms, _ = timed(red_bf16, fresh)
    print(f"fresh bf16-cast + row max          {ms:7.2f} ms", flush=True)

    b16 = jax.block_until_ready(fresh.astype(jnp.bfloat16))

    @jax.jit
    def tk_on_bf16(a):
        return jax.lax.top_k(a, 10)

    ms, _ = timed(tk_on_bf16, b16)
    print(f"resident bf16 top_k                {ms:7.2f} ms "
          f"({GB/2/ms*1e3:6.1f} GB/s)", flush=True)

    @jax.jit
    def red_on_bf16(a):
        return a.max(axis=1)

    ms, _ = timed(red_on_bf16, b16)
    print(f"resident bf16 row max              {ms:7.2f} ms "
          f"({GB/2/ms*1e3:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()

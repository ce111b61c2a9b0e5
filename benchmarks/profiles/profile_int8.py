"""int8 impact storage A/B on the real TPU.

Two questions gate whether int8 becomes the shipped default anywhere:
1. raw matmul: does XLA lower int8xint8->int32 dots to native int8 MXU
   ops on v5e (~2x the bf16 rate), or upcast (parity with bf16)?
2. full kernel: end-to-end retrieve_topk_split_sparse under int8 vs
   hilo vs bf16 storage on the bench regime (50k docs, 8192 queries).

Decision table (see BENCHMARK_RESULTS.md once measured):
- int8 raw ~2x bf16  -> int8 replaces bf16 as the >=256k-doc default
  (same bytes, ~20x lower error, faster) and becomes a serving option
  vs hilo (2x matmul speed for ~2e-4 worst-case score error).
- int8 raw ~1x bf16  -> keep as accuracy upgrade over bf16 only.
Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import split_index as sidx
from timed import timed


def raw_matmul_ab():
    nq, K, D = 4096, 2048, 51200
    rng = np.random.default_rng(0)
    q = rng.integers(0, 3, (nq, K)).astype(np.float32)
    w = rng.gamma(2, 2, (D, K)).astype(np.float32)
    qb, wb = jnp.asarray(q, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)
    qi = jnp.asarray(q.astype(np.int8))
    wi = jnp.asarray((w / np.abs(w).max(1, keepdims=True) * 127)
                     .round().astype(np.int8))
    s = jnp.asarray((np.abs(w).max(1) / 127).astype(np.float32))

    @jax.jit
    def one_bf16(qb, wb):
        return jnp.dot(qb, wb.T, preferred_element_type=jnp.float32)

    @jax.jit
    def one_int8(qi, wi):
        return jnp.dot(qi, wi.T, preferred_element_type=jnp.int32)

    @jax.jit
    def two_int8_epi(qi, wi, s):
        a = jnp.dot(qi, wi.T, preferred_element_type=jnp.int32)
        b = jnp.dot(qi, wi.T, preferred_element_type=jnp.int32)
        return (a.astype(jnp.float32) * s[None, :]
                + b.astype(jnp.float32) * (s * 0.01)[None, :])

    for name, f, args in (
            ("1x bf16", one_bf16, (qb, wb)),
            ("1x int8->int32", one_int8, (qi, wi)),
            ("2x int8 + scale epi", two_int8_epi, (qi, wi, s))):
        ms, _ = timed(f, *args)
        print(f"raw {name:22s} {ms:7.2f} ms", flush=True)


def full_kernel_ab():
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    base = BayesianBM25Scorer(base_rate=0.01)
    base.index(corpus, show_progress=False)
    idx, k = base._index, 10
    t = base._transform

    ref_out = None
    for storage in ("hilo", "int8", "bf16", "hilo2", "int82"):
        st = storage.rstrip("2")
        s = sidx.build_split_index(idx, n_frequent=2048, storage=st)
        if s.post_doc_ids is None:
            print("no sparse path at this scale"); return
        enc = sidx.encode_queries_split(queries, s)
        fslots, fcnt, trows, tqids, tqcnt = enc
        tslots = sidx.map_tail_slots(tqids, s)
        cap = sidx.candidate_cap(s, tslots, k)
        packed, r_max = sidx.compact_tail_postings(
            tslots, np.asarray(tqcnt), s.post_doc_ids.shape[0] - 1)
        kw = dict(n_docs=idx.n_docs, impact_lo=s.dense_impact_lo,
                  tf_from_sign=s.post_w_positive,
                  impact_scale=s.impact_scale,
                  q_int8_ok=sidx._q_int8_ok(s, fcnt))
        if r_max < tslots.shape[1]:
            kw.update(compact=jnp.asarray(packed), compact_rmax=r_max)
        ms, out = timed(
            sidx.retrieve_topk_split_sparse,
            s.dense_impact, s.dense_presence, s.post_doc_ids,
            s.post_weights, idx.doc_lengths, idx.avgdl,
            jnp.asarray(fslots), jnp.asarray(fcnt), jnp.asarray(trows),
            jnp.asarray(tslots), jnp.asarray(tqcnt), k, cap,
            t.alpha, t.beta, t.base_rate, **kw)
        nq = len(queries)
        ids = np.asarray(out[0])
        extra = ""
        if ref_out is None:
            ref_out = ids
        else:
            ov = (ids == ref_out).mean()
            extra = f"  id-agree={ov:.4f}"
        print(f"full kernel {st:5s} {ms:7.2f} ms "
              f"({nq / ms * 1e3:8.0f} q/s){extra}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    raw_matmul_ab()
    full_kernel_ab()

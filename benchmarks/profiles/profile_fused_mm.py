"""Fused Pallas matmul+block-max A/B on the real TPU.

Gates split_index.FUSED_MM: the fused kernel must beat the
XLA-matmul + Pallas-stripe-reduce pair (22.7 + 4.8 ms at
(8192, 51200) hilo on v5e) AND the full sparse kernel must get
faster end-to-end. Run on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), '..', '..')))
import numpy as np
import jax
import jax.numpy as jnp

from bench import make_corpus, make_queries
from bayesian_bm25_tpu import BayesianBM25Scorer
from bayesian_bm25_tpu.engine import pallas_matmul as pm
from bayesian_bm25_tpu.engine import pallas_reduce as pr
from bayesian_bm25_tpu.engine import split_index as sidx
from timed import timed


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    corpus = make_corpus(rng)
    queries = make_queries(rng)
    for storage in ("hilo", "int8"):
        scorer = BayesianBM25Scorer(
            base_rate=0.01,
            impact_storage=storage if storage != "hilo" else None)
        scorer.index(corpus, show_progress=False)
        s, idx, k = scorer._split, scorer._index, 10
        enc = sidx.encode_queries_split(queries, s)
        fslots, fcnt, trows, tqids, tqcnt = enc
        tslots = sidx.map_tail_slots(tqids, s)
        cap = sidx.candidate_cap(s, tslots, k)
        D_pad, K = s.dense_impact.shape
        nq = fslots.shape[0]
        print(f"[{storage}] nq {nq} D {D_pad} K {K} eligible:",
              pm.eligible(nq, K, D_pad, 256), flush=True)
        qvec, _ = sidx._densify_queries(
            jnp.asarray(fslots), jnp.asarray(fcnt), K)
        qvec = jax.block_until_ready(qvec)

        # stage A/B: unfused matmul + reduce vs fused. The matrices go
        # in as ARGUMENTS — a closure would embed them as HLO constants
        # and blow the tunnel's remote_compile body limit (HTTP 413).
        def unfused(qv, imp, lo, scale):
            sc = sidx._impact_matmul(
                qv, imp, lo, scorer._matmul_precision, scale=scale)
            return sc, pr.block_max(sc, 256, valid_upto=idx.n_docs)

        def fused(qv, imp, lo, scale):
            return pm.impact_matmul_bmax(qv, imp, lo, scale, idx.n_docs)

        margs = (s.dense_impact, s.dense_impact_lo, s.impact_scale)
        for name, f in (("unfused", unfused), ("fused", fused),
                        ("unfused2", unfused), ("fused2", fused)):
            ms, out = timed(jax.jit(f), qvec, *margs)
            print(f"  {name:9s} matmul+bmax {ms:7.2f} ms", flush=True)

        # full kernel A/B
        common = (s.dense_impact, s.dense_presence, s.post_doc_ids,
                  s.post_weights, idx.doc_lengths, idx.avgdl,
                  jnp.asarray(fslots), jnp.asarray(fcnt),
                  jnp.asarray(trows), jnp.asarray(tslots),
                  jnp.asarray(tqcnt), k, cap, 1.0, 2.0, 0.05)
        kw = dict(n_docs=idx.n_docs, impact_lo=s.dense_impact_lo,
                  tf_from_sign=s.post_w_positive,
                  impact_scale=s.impact_scale)
        ref = None
        for name, fm in (("base", False), ("fusedmm", True),
                         ("base2", False), ("fusedmm2", True)):
            ms, out = timed(sidx.retrieve_topk_split_sparse, *common,
                            **kw, fused_mm=fm)
            ids = np.asarray(out[0])
            extra = ""
            if ref is None:
                ref = ids
            else:
                extra = f"  id-agree={(ids == ref).mean():.4f}"
            print(f"  full kernel {name:9s} {ms:7.2f} ms "
                  f"({len(queries) / ms * 1e3:8.0f} q/s){extra}",
                  flush=True)


if __name__ == "__main__":
    main()

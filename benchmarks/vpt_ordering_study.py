"""VPT-discriminative ordering gate (multi-seed, decoy-cluster family).

The round-4 ordering gate could not SEE the VPT machinery: on the hard
family the dense calibration was rank-equivalent to the raw dense
signal, so `Bayesian-Vector-Balanced` tied `Bayesian-Balanced` to 16
digits and the KDE/GMM/gap subsystem was exercised but never
discriminated. Two round-5 changes fixed that:

1. The harness now mirrors the reference's VPT protocol
   (hybrid_beir.py:1888-2033): VPT-BM25Weights forces KDE with
   SHARPENED lexical-only weights, VPT-DensityPrior forces GMM with
   structural weights, and both report the additive log-odds fusion
   with the lexical probabilities. Routing both through method="auto"
   (the old behavior) let gap detection override the guidance and
   collapsed every variant onto one estimate.
2. `synthetic_dataset_vpt` (benchmarks/utils.py) plants the regime the
   reference observed on ArguAna-like data: a semantically-nearest
   DECOY cluster that is not relevant, a slightly-farther relevant
   cluster half of which is BM25-blind (paraphrase vocabulary), and a
   truncated-background geometry. The BM25-weighted likelihood ratio
   is NON-monotone in distance (it demotes the nearer decoys), so
   calibration genuinely changes rankings.

Gate pairs (non-overlapping mean +/- SE across seeds):
  VPT-BM25Weights > VPT-DensityPrior   (CI-penalty headline,
                                        /root/reference/README.md:557-558)
  VPT-BM25Weights > Bayesian-Balanced  (the likelihood ratio re-ranks
                                        past the lexical ceiling)
  VPT-BW-1.0 > VPT-BW-2.0              (Silverman factors below the
                                        c=2.0 default improve ranking —
                                        the reference's direction,
                                        README.md:566-569; on this 1-D
                                        family the optimum is interior:
                                        c=0.2 pays a KDE-coverage
                                        penalty that high-dimensional
                                        BEIR distances do not)
Plus a discrimination assertion: Bayesian-Vector-Balanced must differ
from Bayesian-Balanced per-seed (the round-4 16-digit tie is the bug
this study exists to prevent).

Usage:
    python benchmarks/vpt_ordering_study.py [--docs 6000] [--queries 96]
        [--seeds 7 8 9] [-o out.json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

STUDY_METHODS = [
    "BM25", "Dense", "Bayesian-Balanced", "Bayesian-Vector-Balanced",
    "VPT-BM25Weights", "VPT-DensityPrior",
    "VPT-BW-0.2", "VPT-BW-0.5", "VPT-BW-1.0", "VPT-BW-2.0",
]
GATE_PAIRS = [
    ("VPT-BM25Weights", "VPT-DensityPrior"),
    ("VPT-BM25Weights", "Bayesian-Balanced"),
    ("VPT-BW-1.0", "VPT-BW-2.0"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--queries", type=int, default=96)
    ap.add_argument("--topics", type=int, default=48)
    ap.add_argument("--seeds", type=int, nargs="*", default=[7, 8, 9])
    ap.add_argument("--device", default="cpu", choices=["auto", "cpu"])
    ap.add_argument("-R", type=int, default=1000)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from benchmarks.hybrid_beir import run_dataset
    from benchmarks.utils import synthetic_dataset_vpt

    per_method: dict[str, list[float]] = {}
    for seed in args.seeds:
        ds = synthetic_dataset_vpt(
            n_docs=args.docs, n_queries=args.queries,
            n_topics=args.topics, seed=seed,
            name=f"synthetic-vpt-s{seed}")
        res = run_dataset(ds, k=args.k, R=args.R, methods=STUDY_METHODS,
                          verbose=False)
        print(f"seed {seed}:")
        for m, v in sorted(res.items(),
                           key=lambda kv: -kv[1][f"ndcg@{args.k}"]):
            per_method.setdefault(m, []).append(v[f"ndcg@{args.k}"])
            print(f"  {m:30s} {v[f'ndcg@{args.k}'] * 100:.2f}")

    stats = {
        m: {
            "mean": float(np.mean(v)) * 100,
            "se": float(np.std(v, ddof=1) / np.sqrt(len(v))) * 100
            if len(v) > 1 else 0.0,
            "per_seed": [x * 100 for x in v],
        }
        for m, v in per_method.items()
    }
    print("\n=== mean +/- SE over seeds (NDCG@10 x100) ===")
    for m, s in sorted(stats.items(), key=lambda kv: -kv[1]["mean"]):
        print(f"  {m:30s} {s['mean']:6.2f} +/- {s['se']:.2f}")

    gates = []
    ok = True
    for win, lose in GATE_PAIRS:
        w, l = stats.get(win), stats.get(lose)
        if w is None or l is None:
            gates.append({"pair": [win, lose], "ok": False,
                          "reason": "missing method"})
            ok = False
            continue
        separated = (w["mean"] - w["se"]) > (l["mean"] + l["se"])
        gates.append({
            "pair": [win, lose], "ok": bool(separated),
            "margin": w["mean"] - l["mean"],
            "noise": w["se"] + l["se"],
        })
        ok = ok and separated

    # Discrimination assertion: Vector-Balanced must not tie Balanced
    # per-seed (the round-4 16-digit-identity failure mode).
    vb = per_method.get("Bayesian-Vector-Balanced", [])
    bal = per_method.get("Bayesian-Balanced", [])
    distinct = bool(vb and bal and any(
        abs(a - b) > 1e-12 for a, b in zip(vb, bal)))
    gates.append({"pair": ["Bayesian-Vector-Balanced",
                           "!= Bayesian-Balanced (per-seed)"],
                  "ok": distinct,
                  "margin": float(max(abs(a - b) for a, b in zip(vb, bal))
                                  * 100) if vb and bal else 0.0})
    ok = ok and distinct

    print("\n=== gate pairs ===")
    for g in gates:
        mark = "PASS" if g["ok"] else "FAIL"
        extra = (f" margin={g.get('margin', 0):.2f} "
                 f"noise={g.get('noise', 0):.2f}" if "noise" in g
                 else f" max|diff|={g.get('margin', 0):.2e}")
        print(f"  [{mark}] {g['pair'][0]} > {g['pair'][1]}{extra}")
    out = {"stats": stats, "gates": gates, "ok": ok,
           "config": {"docs": args.docs, "queries": args.queries,
                      "topics": args.topics, "seeds": args.seeds,
                      "R": args.R, "k": args.k}}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
        print(f"\nwritten to {args.output}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

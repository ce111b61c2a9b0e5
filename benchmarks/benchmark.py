"""Raw BM25 vs Bayesian probabilities: ranking + calibration + threshold
transfer in one report (reference: benchmarks/benchmark.py).

Compares raw scores, Bayesian auto-estimated, batch-fit, and online-updated
transforms on NDCG/MAP plus ECE/Brier and train->test threshold-transfer F1.

Usage: python benchmarks/benchmark.py [--data-dir DIR]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    BayesianBM25Scorer,
    BayesianProbabilityTransform,
    brier_score,
    expected_calibration_error,
)
from bayesian_bm25_tpu.engine.tokenize import tokenize_texts  # noqa: E402
from benchmarks.common import print_table, threshold_transfer  # noqa: E402
from benchmarks.metrics import evaluate_run  # noqa: E402
from benchmarks.utils import load_beir_dataset, synthetic_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--impact-storage", default=None,
                    choices=["f32", "hilo", "bf16", "int8"],
                    help="impact-matrix representation override "
                         "(default: matmul_precision mapping)")
    args = ap.parse_args()

    ds = (load_beir_dataset(args.data_dir) if args.data_dir
          else synthetic_dataset(n_docs=1500, n_queries=48))
    print(ds.stats())

    doc_ids = ds.doc_ids
    pos = {d: i for i, d in enumerate(doc_ids)}
    corpus_tokens = tokenize_texts([ds.corpus[d] for d in doc_ids])
    qids = list(ds.queries.keys())
    query_tokens = tokenize_texts([ds.queries[q] for q in qids])

    scorer = BayesianBM25Scorer(method="lucene", base_rate="auto",
                                impact_storage=args.impact_storage)
    scorer.index(corpus_tokens, show_progress=False)
    scores_all = scorer.get_scores_batch(query_tokens)
    avgdl = scorer.avgdl
    dlr = np.array([len(c) for c in corpus_tokens]) / avgdl

    rng = np.random.default_rng(42)
    half = len(qids) // 2

    def probs_for(transform, rows):
        out = {}
        for qi in rows:
            s = scores_all[qi]
            qset = set(query_tokens[qi])
            tfs = np.array([len(qset & set(c)) for c in corpus_tokens],
                           dtype=float)
            out[qi] = np.where(
                s > 0,
                np.asarray(transform.score_to_probability(s, tfs, dlr)), 0.0)
        return out

    def evaluate(prob_map, rows):
        run = {}
        ps, ys = [], []
        for qi in rows:
            p = prob_map[qi]
            order = np.argsort(-p)
            run[qids[qi]] = [doc_ids[i] for i in order[:10]]
            judged = ds.qrels.get(qids[qi], {})
            picks = [pos[d] for d in judged if d in pos]
            picks += list(rng.choice(len(doc_ids), size=30, replace=False))
            for d in set(picks):
                ps.append(p[d])
                ys.append(1.0 if judged.get(doc_ids[d], 0) > 0 else 0.0)
        qrels = {qids[qi]: ds.qrels[qids[qi]] for qi in rows
                 if qids[qi] in ds.qrels}
        m = evaluate_run(run, qrels, k=10)
        return m, np.asarray(ps), np.asarray(ys)

    # Training pool for batch fit / online updates
    tr_s, tr_y = [], []
    for qi in range(half):
        judged = ds.qrels.get(qids[qi], {})
        for did, rel in judged.items():
            if did in pos:
                tr_s.append(scores_all[qi, pos[did]])
                tr_y.append(1.0 if rel > 0 else 0.0)
        for d in rng.choice(len(doc_ids), size=30, replace=False):
            if doc_ids[d] not in judged:
                tr_s.append(scores_all[qi, d])
                tr_y.append(0.0)
    tr_s = np.asarray(tr_s)
    tr_y = np.asarray(tr_y)

    auto_t = scorer.transform
    batch_t = BayesianProbabilityTransform(
        alpha=auto_t.alpha, beta=auto_t.beta, base_rate=auto_t.base_rate)
    batch_t.fit(tr_s, tr_y, learning_rate=0.05, max_iterations=3000)

    online_t = BayesianProbabilityTransform(
        alpha=auto_t.alpha, beta=auto_t.beta, base_rate=auto_t.base_rate)
    order = rng.permutation(len(tr_s))
    for lo in range(0, len(order), 8):
        sel = order[lo:lo + 8]
        online_t.update(tr_s[sel], tr_y[sel], learning_rate=0.05)

    rows_out = []
    test_rows = range(half, len(qids))
    train_rows = range(half)
    for name, transform in (
        ("Bayesian (auto)", auto_t),
        ("Bayesian (batch fit)", batch_t),
        ("Bayesian (online)", online_t),
    ):
        te_map = probs_for(transform, test_rows)
        tr_map = probs_for(transform, train_rows)
        m, te_p, te_yy = evaluate(te_map, test_rows)
        _, tr_p, tr_yy = evaluate(tr_map, train_rows)
        tt = threshold_transfer(tr_p, tr_yy, te_p, te_yy)
        rows_out.append((name, m["ndcg@10"], m["map@10"],
                         expected_calibration_error(te_p, te_yy),
                         brier_score(te_p, te_yy), tt["test_f1"]))

    # Raw scores ranking baseline (no calibration metrics — not probs)
    raw_run = {}
    for qi in test_rows:
        order2 = np.argsort(-scores_all[qi])
        raw_run[qids[qi]] = [doc_ids[i] for i in order2[:10]]
    raw_m = evaluate_run(raw_run, {qids[qi]: ds.qrels[qids[qi]]
                                   for qi in test_rows}, k=10)
    rows_out.insert(0, ("Raw BM25", raw_m["ndcg@10"], raw_m["map@10"],
                        float("nan"), float("nan"), float("nan")))

    print_table(
        f"{ds.name}: raw vs Bayesian (test split)",
        rows_out, ("method", "NDCG@10", "MAP@10", "ECE", "Brier", "transfer F1"),
    )
    print(f"\nonline updates: {online_t._n_updates}; "
          f"averaged alpha={online_t.averaged_alpha:.3f} "
          f"beta={online_t.averaged_beta:.3f}")


if __name__ == "__main__":
    main()

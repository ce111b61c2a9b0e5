"""Base-rate configuration comparison (reference: benchmarks/base_rate.py).

Compares ranking (NDCG/MAP) and calibration (ECE/Brier) of: raw BM25,
Bayesian auto base rate (percentile/mixture/elbow), explicit base rates,
batch-fit with/without base rate, C2/C3 training modes, Platt scaling, and
min-max normalization — on a 50/50 query split (seed 42).

Usage: python benchmarks/base_rate.py [--data-dir DIR] [--docs N]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    BayesianBM25Scorer,
    PlattCalibrator,
    brier_score,
    expected_calibration_error,
)
from bayesian_bm25_tpu.models.probability import (  # noqa: E402
    BayesianProbabilityTransform,
)
from bayesian_bm25_tpu.engine.tokenize import tokenize_texts  # noqa: E402
from benchmarks.common import print_table, threshold_transfer  # noqa: E402
from benchmarks.metrics import evaluate_run  # noqa: E402
from benchmarks.utils import load_beir_dataset, synthetic_dataset  # noqa: E402


def collect_probs(ds, scorer_or_transform, bm25_all, qids, doc_ids,
                  corpus_tokens, query_tokens, mode="scorer", minmax=False,
                  platt=None, transform=None):
    """Per-query probability arrays + run + flat (prob, label) pools."""
    run = {}
    flat_p, flat_y = [], []
    avgdl = np.mean([len(t) for t in corpus_tokens])
    for qi, qid in enumerate(qids):
        scores = bm25_all[qi]
        if minmax:
            span = scores.max() - scores.min()
            probs = (scores - scores.min()) / (span if span > 0 else 1.0)
        elif platt is not None:
            probs = np.asarray(platt(scores))
        else:
            t = transform
            dlr = np.array([len(c) for c in corpus_tokens]) / avgdl
            qset = set(query_tokens[qi])
            tfs = np.array([len(qset & set(c)) for c in corpus_tokens],
                           dtype=float)
            probs = np.where(
                scores > 0,
                np.asarray(t.score_to_probability(scores, tfs, dlr)), 0.0)
        order = np.argsort(-probs)
        run[qid] = [doc_ids[i] for i in order[:10]]
        judged = ds.qrels.get(qid, {})
        for rank in order[:100]:
            flat_p.append(probs[rank])
            flat_y.append(1.0 if judged.get(doc_ids[rank], 0) > 0 else 0.0)
    return run, np.asarray(flat_p), np.asarray(flat_y)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--docs", type=int, default=1200)
    ap.add_argument("--queries", type=int, default=48)
    args = ap.parse_args()

    ds = (load_beir_dataset(args.data_dir) if args.data_dir
          else synthetic_dataset(n_docs=args.docs, n_queries=args.queries))
    print(ds.stats())

    doc_ids = ds.doc_ids
    corpus_tokens = tokenize_texts([ds.corpus[d] for d in doc_ids])
    qids = list(ds.queries.keys())
    rng = np.random.default_rng(42)
    perm = rng.permutation(len(qids))
    half = len(qids) // 2
    train_q = [qids[i] for i in perm[:half]]
    test_q = [qids[i] for i in perm[half:]]
    query_tokens = {q: t for q, t in zip(
        qids, tokenize_texts([ds.queries[q] for q in qids]))}

    scorer = BayesianBM25Scorer(method="lucene")
    scorer.index(corpus_tokens, show_progress=False)
    bm25_all = {q: s for q, s in zip(
        qids, scorer.get_scores_batch([query_tokens[q] for q in qids]))}

    # Training pool from train queries (judged + sampled negatives)
    tr_s, tr_y = [], []
    pos_map = {d: i for i, d in enumerate(doc_ids)}
    for q in train_q:
        judged = ds.qrels.get(q, {})
        for did, rel in judged.items():
            if did in pos_map:
                tr_s.append(bm25_all[q][pos_map[did]])
                tr_y.append(1.0 if rel > 0 else 0.0)
        for d in rng.choice(len(doc_ids), size=30, replace=False):
            if doc_ids[d] not in judged:
                tr_s.append(bm25_all[q][d])
                tr_y.append(0.0)
    tr_s = np.asarray(tr_s)
    tr_y = np.asarray(tr_y)

    auto = scorer.transform
    configs = []

    def add_config(name, transform=None, minmax=False, platt=None):
        bm_test = np.stack([bm25_all[q] for q in test_q])
        bm_train = np.stack([bm25_all[q] for q in train_q])
        run_test, p_test, y_test = collect_probs(
            ds, scorer, bm_test, test_q, doc_ids, corpus_tokens,
            [query_tokens[q] for q in test_q],
            minmax=minmax, platt=platt, transform=transform)
        _, p_train, y_train = collect_probs(
            ds, scorer, bm_train, train_q, doc_ids, corpus_tokens,
            [query_tokens[q] for q in train_q],
            minmax=minmax, platt=platt, transform=transform)
        m = evaluate_run(run_test, {q: ds.qrels[q] for q in test_q}, k=10)
        tt = threshold_transfer(p_train, y_train, p_test, y_test)
        configs.append((
            name, m["ndcg@10"], m["map@10"],
            expected_calibration_error(p_test, y_test),
            brier_score(p_test, y_test), tt["test_f1"],
        ))

    # Raw BM25 as min-max
    add_config("Min-max normalization", minmax=True)

    # Bayesian auto estimates (no base rate / auto / explicit)
    add_config("Bayesian (no base rate)", transform=BayesianProbabilityTransform(
        alpha=auto.alpha, beta=auto.beta))
    for method in ("percentile", "mixture", "elbow"):
        s2 = BayesianBM25Scorer(method="lucene", base_rate="auto",
                                base_rate_method=method)
        s2.index(corpus_tokens, show_progress=False)
        add_config(f"Bayesian (auto, {method})", transform=s2.transform)
    add_config("Bayesian (base_rate=0.001)", transform=BayesianProbabilityTransform(
        alpha=auto.alpha, beta=auto.beta, base_rate=0.001))

    # Batch fits (C1 / C2 / C3)
    fit_c1 = BayesianProbabilityTransform(alpha=auto.alpha, beta=auto.beta)
    fit_c1.fit(tr_s, tr_y, learning_rate=0.05, max_iterations=2000)
    add_config("Batch fit (balanced, C1)", transform=fit_c1)

    fit_c1br = BayesianProbabilityTransform(
        alpha=fit_c1.alpha, beta=fit_c1.beta,
        base_rate=float(np.clip(np.mean(tr_y), 1e-6, 0.5)))
    add_config("Batch fit + base_rate=auto", transform=fit_c1br)

    fit_c3 = BayesianProbabilityTransform(alpha=auto.alpha, beta=auto.beta)
    fit_c3.fit(tr_s, tr_y, mode="prior_free", learning_rate=0.05,
               max_iterations=2000)
    add_config("Batch fit (prior-free, C3)", transform=fit_c3)

    platt = PlattCalibrator()
    platt.fit(tr_s, tr_y, learning_rate=0.05, max_iterations=2000)
    add_config("Platt scaling", platt=platt)

    print_table(
        f"{ds.name}: base-rate configurations (test split)",
        configs,
        ("config", "NDCG@10", "MAP@10", "ECE", "Brier", "transfer F1"),
    )


if __name__ == "__main__":
    main()

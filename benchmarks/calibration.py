"""Calibration verification: reliability diagrams, threshold transfer,
Bayesian transform vs min-max and Platt
(reference: benchmarks/calibration.py).

Usage: python benchmarks/calibration.py [--data-dir DIR]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from bayesian_bm25_tpu import (  # noqa: E402
    BayesianBM25Scorer,
    PlattCalibrator,
    calibration_report,
)
from bayesian_bm25_tpu.engine.tokenize import tokenize_texts  # noqa: E402
from benchmarks.common import print_table, threshold_transfer  # noqa: E402
from benchmarks.utils import load_beir_dataset, synthetic_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()

    ds = (load_beir_dataset(args.data_dir) if args.data_dir
          else synthetic_dataset(n_docs=1200, n_queries=48))
    print(ds.stats())

    doc_ids = ds.doc_ids
    pos = {d: i for i, d in enumerate(doc_ids)}
    corpus_tokens = tokenize_texts([ds.corpus[d] for d in doc_ids])
    qids = list(ds.queries.keys())
    query_tokens = tokenize_texts([ds.queries[q] for q in qids])

    scorer = BayesianBM25Scorer(method="lucene", base_rate="auto")
    scorer.index(corpus_tokens, show_progress=False)
    probs_all = scorer.get_probabilities_batch(query_tokens)
    scores_all = scorer.get_scores_batch(query_tokens)

    rng = np.random.default_rng(42)
    half = len(qids) // 2

    def pool(rows, transform):
        ps, ys = [], []
        for qi in rows:
            judged = ds.qrels.get(qids[qi], {})
            # judged docs + sampled negatives
            picks = [pos[d] for d in judged if d in pos]
            picks += list(rng.choice(len(doc_ids), size=30, replace=False))
            for d in set(picks):
                ps.append(transform(qi, d))
                ys.append(1.0 if judged.get(doc_ids[d], 0) > 0 else 0.0)
        return np.asarray(ps), np.asarray(ys)

    bayes = lambda qi, d: probs_all[qi, d]  # noqa: E731

    def minmax(qi, d):
        s = scores_all[qi]
        span = s.max() - s.min()
        return (s[d] - s.min()) / (span if span > 0 else 1.0)

    # Platt fit on train pool of raw scores
    tr_rows = range(half)
    te_rows = range(half, len(qids))
    tr_s, tr_y = pool(tr_rows, lambda qi, d: scores_all[qi, d])
    platt = PlattCalibrator()
    platt.fit(tr_s, tr_y, learning_rate=0.05, max_iterations=3000)

    methods = {
        "Bayesian (auto base rate)": bayes,
        "Min-max": minmax,
        "Platt": lambda qi, d: float(platt(scores_all[qi, d])),
    }

    rows = []
    for name, fn in methods.items():
        tr_p, tr_yy = pool(tr_rows, fn)
        te_p, te_yy = pool(te_rows, fn)
        rep = calibration_report(te_p, te_yy)
        tt = threshold_transfer(tr_p, tr_yy, te_p, te_yy)
        rows.append((name, rep.ece, rep.brier, rep.logloss,
                     tt["train_f1"], tt["test_f1"]))
    print_table("Calibration on judged+sampled pools (test split)", rows,
                ("method", "ECE", "Brier", "LogLoss", "train F1", "test F1"))

    # Reliability diagram for the Bayesian method
    te_p, te_yy = pool(te_rows, bayes)
    print("\n" + calibration_report(te_p, te_yy).summary())


if __name__ == "__main__":
    main()

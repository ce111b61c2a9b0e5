"""IR evaluation metrics: DCG/NDCG@k, precision@k, recall@k, MAP@k.

Benchmark-local metrics (reference: benchmarks/metrics.py) extended with a
pytrec_eval-style evaluator over run/qrels dicts (pytrec_eval itself is not
available in this environment).
"""

from __future__ import annotations

import numpy as np


def dcg_at_k(relevances, k: int) -> float:
    rel = np.asarray(relevances, dtype=np.float64)[:k]
    if rel.size == 0:
        return 0.0
    discounts = 1.0 / np.log2(np.arange(2, rel.size + 2))
    return float(np.sum(rel * discounts))


def ndcg_at_k(ranked_relevances, all_relevances, k: int) -> float:
    """NDCG@k with the ideal ranking drawn from all judged relevances."""
    ideal = np.sort(np.asarray(all_relevances, dtype=np.float64))[::-1]
    idcg = dcg_at_k(ideal, k)
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked_relevances, k) / idcg


def precision_at_k(ranked_relevances, k: int) -> float:
    """P@k with the pytrec_eval / reference denominator: always k, even
    when fewer than k documents were retrieved (ref benchmarks/
    metrics.py:54-60)."""
    rel = np.asarray(ranked_relevances, dtype=np.float64)[:k]
    if rel.size == 0:
        return 0.0
    return float(np.sum(rel > 0) / k)


def recall_at_k(ranked_relevances, n_relevant: int, k: int) -> float:
    if n_relevant == 0:
        return 0.0
    rel = np.asarray(ranked_relevances, dtype=np.float64)[:k]
    return float(np.sum(rel > 0) / n_relevant)


def average_precision_at_k(ranked_relevances, n_relevant: int, k: int) -> float:
    if n_relevant == 0:
        return 0.0
    rel = np.asarray(ranked_relevances, dtype=np.float64)[:k] > 0
    if not rel.any():
        return 0.0
    cum = np.cumsum(rel)
    precisions = cum / np.arange(1, rel.size + 1)
    return float(np.sum(precisions * rel) / min(n_relevant, k))


def evaluate_run(run: dict, qrels: dict, k: int = 10) -> dict:
    """pytrec_eval-style evaluation.

    ``run``: query_id -> list of doc_ids ranked best-first (or dict
    doc_id -> score). ``qrels``: query_id -> {doc_id: graded relevance}.
    Returns mean ndcg@k / map@k / precision@k / recall@k over queries that
    have qrels.
    """
    ndcgs, maps, precs, recs = [], [], [], []
    for qid, judged in qrels.items():
        if qid not in run or not judged:
            continue
        ranking = run[qid]
        if isinstance(ranking, dict):
            ranking = [d for d, _ in sorted(ranking.items(),
                                            key=lambda kv: -kv[1])]
        rels = [judged.get(d, 0) for d in ranking[:k]]
        all_rels = list(judged.values())
        n_rel = sum(1 for v in judged.values() if v > 0)
        ndcgs.append(ndcg_at_k(rels, all_rels, k))
        maps.append(average_precision_at_k(rels, n_rel, k))
        precs.append(precision_at_k(rels, k))
        recs.append(recall_at_k(rels, n_rel, k))
    n = max(len(ndcgs), 1)
    return {
        f"ndcg@{k}": float(np.sum(ndcgs) / n),
        f"map@{k}": float(np.sum(maps) / n),
        f"p@{k}": float(np.sum(precs) / n),
        f"recall@{k}": float(np.sum(recs) / n),
        "n_queries": len(ndcgs),
    }

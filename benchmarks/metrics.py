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
    """AP at cutoff k, trec_eval map_cut semantics: the precision sum is
    truncated at k but the denominator stays the TOTAL judged-relevant
    count R (map_cut_k -> plain MAP as k grows; dividing by min(R, k) is
    a different measure some libraries call AP@k)."""
    if n_relevant == 0:
        return 0.0
    rel = np.asarray(ranked_relevances, dtype=np.float64)[:k] > 0
    if not rel.any():
        return 0.0
    cum = np.cumsum(rel)
    precisions = cum / np.arange(1, rel.size + 1)
    return float(np.sum(precisions * rel) / n_relevant)


def trec_sort(scored: dict) -> list:
    """doc_id -> score mapping to a best-first ranking with trec_eval's
    tie handling: descending score, ties broken by doc id in DESCENDING
    lexicographic order (trec_eval sorts docno reverse-alphabetically so
    runs with tied scores evaluate reproducibly)."""
    return [d for d, _ in sorted(scored.items(),
                                 key=lambda kv: (kv[1], kv[0]),
                                 reverse=True)]


def evaluate_run(run: dict, qrels: dict, k: int = 10) -> dict:
    """trec_eval/pytrec_eval-protocol evaluation (the reference evaluates
    through pytrec_eval with ndcg_cut/map_cut/recall measures, reference
    benchmarks/hybrid_beir.py:1142-1165; this reimplements those measure
    definitions — golden-fixture-pinned in tests/test_benchmarks.py).

    ``run``: query_id -> list of doc_ids ranked best-first (or dict
    doc_id -> score; tied scores break by doc id descending, as
    trec_eval does). ``qrels``: query_id -> {doc_id: graded relevance}.
    Queries with no judged-relevant document (all grades <= 0) are
    excluded from the averages, matching trec_eval topic accounting.
    Negative grades count as judged-nonrelevant: zero gain, not
    relevant. Returns mean ndcg@k / map@k / precision@k / recall@k.
    """
    ndcgs, maps, precs, recs = [], [], [], []
    for qid, judged in qrels.items():
        if qid not in run or not judged:
            continue
        n_rel = sum(1 for v in judged.values() if v > 0)
        if n_rel == 0:
            continue
        ranking = run[qid]
        if isinstance(ranking, dict):
            ranking = trec_sort(ranking)
        rels = [max(judged.get(d, 0), 0) for d in ranking[:k]]
        all_rels = [max(v, 0) for v in judged.values()]
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

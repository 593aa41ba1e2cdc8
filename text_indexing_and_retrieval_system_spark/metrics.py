"""IR functional metrics (reference E1-E4,
`/root/reference/code/performance_metrics.py:38-206`): Precision@k,
Recall@k, F1@k, Accuracy@k, AP/MAP, DCG/NDCG@k with binary relevance.

Driver-side numpy over collected top-k lists — these evaluate result
quality against golden lists, they are not data-path operators.
"""

from __future__ import annotations

import math


def precision_at_k(retrieved: list, relevant: set, k: int) -> float:
    top = retrieved[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(retrieved: list, relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    top = retrieved[:k]
    return sum(1 for d in top if d in relevant) / len(relevant)


def f1_at_k(retrieved: list, relevant: set, k: int) -> float:
    p = precision_at_k(retrieved, relevant, k)
    r = recall_at_k(retrieved, relevant, k)
    if p + r == 0:
        return 0.0
    return 2 * p * r / (p + r)


def accuracy_at_k(retrieved: list, relevant: set, k: int, corpus_size: int) -> float:
    """(TP+TN)/corpus: TN = docs neither retrieved nor relevant
    (`performance_metrics.py:97-125`)."""
    top = set(retrieved[:k])
    tp = len(top & relevant)
    fp = len(top - relevant)
    fn = len(relevant - top)
    tn = corpus_size - tp - fp - fn
    if corpus_size == 0:
        return 0.0
    return (tp + tn) / corpus_size


def average_precision(retrieved: list, relevant: set) -> float:
    """Running precision at each relevant hit
    (`performance_metrics.py:127-154`)."""
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, d in enumerate(retrieved, start=1):
        if d in relevant:
            hits += 1
            acc += hits / i
    if hits == 0:
        return 0.0
    return acc / len(relevant)


def mean_average_precision(runs: list[tuple[list, set]]) -> float:
    if not runs:
        return 0.0
    return sum(average_precision(r, rel) for r, rel in runs) / len(runs)


def dcg_at_k(retrieved: list, relevant: set, k: int) -> float:
    """Binary relevance, rel / log2(i + 2) with 0-based i
    (`performance_metrics.py:156-206`)."""
    return sum(
        1.0 / math.log2(i + 2)
        for i, d in enumerate(retrieved[:k])
        if d in relevant
    )


def ndcg_at_k(retrieved: list, relevant: set, k: int) -> float:
    ideal_hits = min(len(relevant), k)
    idcg = sum(1.0 / math.log2(i + 2) for i in range(ideal_hits))
    if idcg == 0:
        return 0.0
    return dcg_at_k(retrieved, relevant, k) / idcg

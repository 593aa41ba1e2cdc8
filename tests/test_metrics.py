"""IR metric spot checks with hand-computed values
(FIXTURES.md §6; reference `performance_metrics.py:38-206`)."""

import math

import pytest

from text_indexing_and_retrieval_system_spark import metrics as M

RETRIEVED = ["a", "b", "c", "d", "e"]
RELEVANT = {"a", "c", "f"}


def test_precision_recall_f1():
    assert M.precision_at_k(RETRIEVED, RELEVANT, 5) == pytest.approx(2 / 5)
    assert M.recall_at_k(RETRIEVED, RELEVANT, 5) == pytest.approx(2 / 3)
    p, r = 2 / 5, 2 / 3
    assert M.f1_at_k(RETRIEVED, RELEVANT, 5) == pytest.approx(2 * p * r / (p + r))
    assert M.precision_at_k([], RELEVANT, 5) == 0.0
    assert M.recall_at_k(RETRIEVED, set(), 5) == 0.0


def test_accuracy():
    # corpus of 10: tp=2 (a, c), fp=3 (b, d, e), fn=1 (f), tn=4
    assert M.accuracy_at_k(RETRIEVED, RELEVANT, 5, 10) == pytest.approx(6 / 10)


def test_average_precision():
    # hits at ranks 1 and 3: (1/1 + 2/3) / 3 relevant
    assert M.average_precision(RETRIEVED, RELEVANT) == pytest.approx(
        (1.0 + 2 / 3) / 3
    )
    assert M.average_precision(["x"], RELEVANT) == 0.0


def test_ndcg():
    # hits at positions 0 and 2 -> dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5
    assert M.dcg_at_k(RETRIEVED, RELEVANT, 5) == pytest.approx(1.5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert M.ndcg_at_k(RETRIEVED, RELEVANT, 5) == pytest.approx(1.5 / idcg)
    assert M.ndcg_at_k(RETRIEVED, set(), 5) == 0.0


def test_map():
    runs = [(RETRIEVED, RELEVANT), (["f"], {"f"})]
    assert M.mean_average_precision(runs) == pytest.approx(
        (M.average_precision(RETRIEVED, RELEVANT) + 1.0) / 2
    )

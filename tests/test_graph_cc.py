"""Connected components (large-star/small-star) vs a pure-python
union-find oracle, plus the neardup_clusters pipeline over documents."""

from __future__ import annotations

import random

import pytest

from text_indexing_and_retrieval_system_spark.operators.graph import (
    connected_components,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Min-label components by union-find — the independent oracle."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["u", "v"])
    got = connected_components(df).collect()
    out = {int(r["node"]): int(r["component"]) for r in got}
    assert len(out) == len(got), "duplicate node rows"
    return out


def test_two_disjoint_components(spark):
    edges = [(3, 1), (1, 7), (10, 12)]
    assert _run(spark, edges) == _uf_components(edges)


def test_long_chain_converges_fast(spark):
    # worst case for naive label propagation: diameter = n
    edges = [(i, i + 1) for i in range(40)]
    out = _run(spark, edges)
    assert out == _uf_components(edges)
    assert set(out.values()) == {0}


def test_star_and_self_loops_and_dup_edges(spark):
    edges = [(5, 5), (9, 2), (2, 9), (9, 4), (9, 17), (9, 17)]
    out = _run(spark, edges)
    # self-loop-only node contributes no edge -> absent by contract
    assert 5 not in out
    assert out == {2: 2, 4: 2, 9: 2, 17: 2}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = rng.sample(range(10_000), 120)
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    assert _run(spark, edges) == _uf_components(edges)


def test_neardup_clusters_pipeline(spark):
    from text_indexing_and_retrieval_system_spark.operators.dedup import (
        neardup_clusters,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight!"),  # ~dup of 1
        (3, "a completely different sentence about spark engines"),
        (4, "a completely different sentence about spark engines indeed"),  # ~dup of 3
        (5, "the quick brown fox jumps over the lazy dog tonight ok"),  # ~dup of 1
        (6, "nothing shares shingles with this one whatsoever xyzzy"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (int(r["doc_id"]), int(r["cluster_id"]), int(r["cluster_size"]))
        for r in neardup_clusters(docs, n=3, threshold=0.5).collect()
    }
    assert got == {
        (1, 1, 3),
        (2, 1, 3),
        (5, 1, 3),
        (3, 3, 2),
        (4, 3, 2),
    }

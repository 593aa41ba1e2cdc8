"""Distributed connected components (alternating large-star / small-star).

Turns near-duplicate candidate PAIRS (LSH / n-gram Jaccard output,
`operators/dedup.py`) into duplicate CLUSTERS — the step a dedup
pipeline needs before it can pick one canonical document per group.
The reference stops at id-level dedup (`dataset_news.py:330-343`); this
is the content-cluster completion of that family.

Algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond" (SoCC 2014) — the
two-star alternation converges in O(log n) rounds on any graph (vs
O(diameter) for naive label propagation), each round two shuffles
(a groupBy-min and a join), all built-in DataFrame ops:

- large-star: every node points its LARGER neighbors at the minimum of
  its neighborhood (including itself);
- small-star: every node points its smaller-or-equal neighbors (and
  itself) at that minimum.

Scale notes (the 100 TB shape): each round is 2 shuffles on the node
id — no all-pairs anything; per-iteration `localCheckpoint` truncates
the lineage (an iterative DataFrame loop otherwise re-plans the whole
history each round and the DAG grows O(rounds^2)); convergence is
detected by a cheap 1-row aggregate (count + order-independent hash
sum) instead of a subtract/anti-join. Duplicate-cluster graphs are
low-diameter in practice, so rounds ~ 2-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) undirected -> edges (x, m) for every x in N(u), x > u,
    where m = min(N(u) + {u})."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Oriented big->small; every node's small neighborhood (and the
    node itself) re-points at the neighborhood minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    re_pointed = joined.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return re_pointed.union(self_edge).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Order-independent fingerprint of an edge set: ONE tiny aggregate
    (row count + sum of per-row hashes) — the convergence check without
    a subtract shuffle."""
    # decimal(38,0) accumulator: a plain long sum of xxhash64 values
    # overflows under ANSI mode after a handful of rows
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`, where
    component = the minimum node id reachable from it. Deterministic.
    Raises if the alternation has not converged after `max_iterations`
    (the two-star bound is O(log n); 50 covers any realistic graph)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = _signature(edges)
    for _ in range(max_iterations):
        edges_next = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        sig = _signature(edges_next)
        edges.unpersist(blocking=False)
        edges = edges_next
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    # converged small-star output is a star: (node, component-min) for
    # every non-root node, plus (root, root) self rows from mins
    roots = edges.select(F.col("v").alias("u"), F.col("v").alias("v")).distinct()
    return (
        edges.union(roots)
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )

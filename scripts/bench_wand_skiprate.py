"""WAND/MaxScore pruning payoff at corpus scale (VERDICT r2 item 3).

Runs the interactive wand path (topk_disjunctive, MaxScore block
skipping + certified cross-bucket theta seeds) for N sequential
free-text queries against the pre-staged 4.84M-turn index and reports:
  - blocks scanned vs decoded (skip rate), via Spark accumulators
  - per-query latency (first-run and steady-state)
  - bit-identity of the pruned results vs the unpruned batch kernel

Usage: python scripts/bench_wand_skiprate.py [cores] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "/dev/shm/tirs_phase_stage"


def main(cores: int, n_queries: int) -> None:
    import pyspark.sql.functions as F

    from text_indexing_and_retrieval_system_spark import engine, querygen
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )

    spark = get_spark(
        app_name=f"tirs-wand-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("SCALE_SHUFFLE", 128)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    idx = engine.load(spark, os.path.join(STAGE, "idx"))
    lex = (
        spark.read.parquet(os.path.join(STAGE, "idx", "lexicon"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3000)
        .toPandas()
    )
    pools = querygen.pools_from_frequencies(
        list(zip(lex["term"], lex["df"])),
        querygen.PoolSpec(min_word_freq=3, high=(5, 60), mid=(61, 400), low=(401, 2800)),
    )
    qs = querygen.generate_queries(pools, n_queries=n_queries, seed=19)
    # only pure disjunctions route to wand; keep those
    qs = [q for q in qs if all(op not in q for op in ("AND", "NOT", '"'))]

    # correctness cross-check: wand vs kernel strategy, same queries
    for q in qs[:8]:
        a = idx.search(q, k=50, strategy="wand")
        b = idx.search(q, k=50, strategy="kernel")
        assert a.docs == b.docs and a.scores == b.scores, f"MISMATCH: {q}"

    def run_pass(queries):
        lat, tot, dec = [], 0, 0
        for q in queries:
            t0 = time.time()
            idx.search(q, k=50, strategy="wand")
            lat.append(time.time() - t0)
            tot += idx.last_prune_stats["blocks_total"]
            dec += idx.last_prune_stats["blocks_decoded"]
        return lat, tot, dec

    lat1, tot1, dec1 = run_pass(qs)  # first pass: seeds fill as buckets score
    lat2, tot2, dec2 = run_pass(qs)  # warm pass: certified seeds pre-loaded

    out = {
        "cores": cores,
        "n_turns": idx.stats["n_docs"],
        "n_queries": len(qs),
        "first_pass": {
            "blocks_scanned": tot1,
            "blocks_decoded": dec1,
            "skip_rate": round(1 - dec1 / max(tot1, 1), 4),
            "lat_avg_s": round(sum(lat1) / len(lat1), 3),
        },
        "warm_pass": {
            "blocks_scanned": tot2,
            "blocks_decoded": dec2,
            "skip_rate": round(1 - dec2 / max(tot2, 1), 4),
            "lat_avg_s": round(sum(lat2) / len(lat2), 3),
            "lat_p95_s": round(sorted(lat2)[int(0.95 * len(lat2))], 3),
        },
        "identical_vs_kernel": 8,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )

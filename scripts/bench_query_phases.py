"""Per-phase attribution of the 256-query batch at two parallelism
levels, on the pre-staged 4.85M-turn index (/dev/shm/tirs_phase_stage).

Separates the kernel job (scales with cores) from the driver tail
(parse/lexicon/collect/merge/id-resolution — fixed) to locate the
4-vs-16 efficiency residual.

Run:  python scripts/bench_query_phases.py <cores> [n_queries]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = os.environ.get("TIRS_STAGE", "/dev/shm/tirs_phase_stage/768000")  # size-keyed since round 6


def main() -> None:
    cores = int(sys.argv[1])
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from text_indexing_and_retrieval_system_spark import engine, querygen
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )
    import pyspark.sql.functions as F

    spark = get_spark(
        app_name=f"tirs-qphase-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=32,
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
    qs = querygen.generate_queries(pools, n_queries=n_q, seed=11)
    warm = querygen.generate_queries(pools, n_queries=8, seed=7)
    idx.search_batch(warm, k=50)

    best = None
    for _ in range(3):
        timings: dict = {}
        t0 = time.time()
        res = idx.search_batch(qs, k=50, timings=timings)
        total = time.time() - t0
        if best is None or total < best[0]:
            best = (total, timings, sum(len(r.docs) for r in res.values()))
    total, timings, hits = best
    print(
        json.dumps(
            {
                "cores": cores,
                "n_queries": n_q,
                "total_sec": round(total, 3),
                "qps": round(n_q / total, 1),
                "hits": hits,
                "phases": {k: round(v, 3) for k, v in timings.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

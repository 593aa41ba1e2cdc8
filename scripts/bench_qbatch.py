"""Query-batch driver-tail decomposition on the pre-staged 4.84M-turn
index (round-3: close the 0.61 -> >=0.8 scaling gap by attributing and
then shrinking the corpus-independent constants).

Usage:
  python scripts/bench_qbatch.py --worker <cores> [n_queries]   one level
  python scripts/bench_qbatch.py [n_queries]                    2 vs 8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = os.environ.get("TIRS_STAGE", "/dev/shm/tirs_phase_stage")


def worker(cores: int, n_queries: int) -> None:
    import pyspark.sql.functions as F

    from text_indexing_and_retrieval_system_spark import engine, querygen
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )

    spark = get_spark(
        app_name=f"tirs-qb-{cores}",
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
    qs = querygen.generate_queries(pools, n_queries=n_queries, seed=11)
    warm = querygen.generate_queries(pools, n_queries=8, seed=7)
    idx.search_batch(warm, k=50)

    best = None
    for _ in range(int(os.environ.get("QB_REPEATS", "2"))):
        timings: dict = {}
        t0 = time.time()
        res = idx.search_batch(qs, k=50, timings=timings)
        sec = time.time() - t0
        hits = sum(len(r.docs) for r in res.values())
        if best is None or sec < best["query_sec"]:
            best = {
                "cores": cores,
                "n_queries": n_queries,
                "query_sec": round(sec, 2),
                "qps": round(n_queries / sec, 2),
                "hits": hits,
                "phases": {k: round(v, 3) for k, v in timings.items()},
            }
    print(json.dumps(best))
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        worker(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 1024)
        return
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    for cores in (2, 8):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_queries)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        print(line)


if __name__ == "__main__":
    main()

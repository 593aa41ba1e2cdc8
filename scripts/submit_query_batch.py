"""spark-submit entrypoint: run a batch of queries against an index.

    spark-submit --py-files tirs.zip scripts/submit_query_batch.py \
        --index-dir <dir> --queries <file with one query per line> [-k 50]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("-k", type=int, default=50)
    args = p.parse_args()

    spark = SparkSession.builder.appName("tirs-query-batch").getOrCreate()
    from text_indexing_and_retrieval_system_spark import engine

    idx = engine.load(spark, args.index_dir)
    with open(args.queries) as f:
        qs = [line.strip() for line in f if line.strip()]
    t0 = time.time()
    out = idx.search_batch(qs, k=args.k)
    dt = time.time() - t0
    for q in qs:
        r = out[q]
        print(json.dumps({"query": q, "docs": r.docs, "scores": r.scores}))
    print(json.dumps({"n_queries": len(qs), "seconds": round(dt, 3), "qps": round(len(qs) / dt, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

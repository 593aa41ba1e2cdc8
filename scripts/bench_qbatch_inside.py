"""Split the query-batch Spark job into planning / executor pipeline /
collect at one parallelism level (diagnosis for the ~10 s in-job
constant found by bench_qbatch.py).

Usage: python scripts/bench_qbatch_inside.py <cores> [n_queries]
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
    from text_indexing_and_retrieval_system_spark.operators import wand
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )

    spark = get_spark(
        app_name=f"tirs-qbi-{cores}",
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
    idx.search_batch(querygen.generate_queries(pools, n_queries=8, seed=7), k=50)

    # rebuild the batch plan exactly as search_batch does
    from text_indexing_and_retrieval_system_spark.operators import query_parser as qp

    nodes = [qp.parse(q) for q in dict.fromkeys(qs)]
    metas = {}
    all_tokens = set()
    for qid, node in enumerate(nodes):
        occ, _ = idx._query_tokens(node)
        meta = {}
        lexr = idx.lexicon_for(sorted({t for _, t in occ}))
        idf = dict(zip(lexr["term"], lexr["idf"]))
        for i, t in occ:
            if t in idf:
                meta.setdefault(t, []).append((i, float(idf[t])))
        metas[qid] = meta
        all_tokens.update(meta)
    known = sorted(all_tokens)
    print(f"distinct terms in batch: {len(known)}")

    for rep in range(3):
        out = {"cores": cores, "rep": rep}
        blocks = idx.blocks_for(known)
        local = wand.topk_disjunctive_batch(blocks, metas, idx.stats["avgdl"], 50)

        t0 = time.time()
        local._jdf.queryExecution().executedPlan()
        out["planning_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_scan = blocks.count()  # scan+filter only (no python, no shuffle)
        out["scan_count_sec"] = round(time.time() - t0, 2)
        out["blocks_matched"] = n_scan

        t0 = time.time()
        local.write.format("noop").mode("overwrite").save()
        out["noop_pipeline_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        lpdf = local.toPandas()
        out["topandas_sec"] = round(time.time() - t0, 2)
        out["winner_rows"] = len(lpdf)

        t0 = time.time()
        wand.merge_query_topk_driver(lpdf, 50)
        out["merge_sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 1024)

"""Decide the simhash formulation by measurement (round-3, VERDICT #4).

Three candidates over the documents table at sf0.1 and at ~10x that
(replicated with distinct doc ids):
  filter32    round-2 zero-shuffle: 32 per-bit array-filter votes
  aggregate1  fused zero-shuffle: ONE array traversal accumulating all
              32 bit counters via aggregate + zip_with
  explode     round-1: explode(tokens) -> per-bit conditional sums via
              one groupBy shuffle

Usage: python scripts/bench_simhash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from text_indexing_and_retrieval_system_spark.operators.dedup import (
    _toks_array,
    simhash,
)
from text_indexing_and_retrieval_system_spark.session import get_spark


def simhash_aggregate(docs, bits=32):
    base = docs.select("doc_id", _toks_array(docs).alias("__toks"))
    harr = F.transform(
        F.col("__toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    hashed = base.select("doc_id", harr.alias("__h")).filter(F.size("__h") > 0)
    counts = F.aggregate(
        F.col("__h"),
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
                    for b in range(bits)
                ]
            ),
            lambda a, c: a + c,
        ),
    )
    n_tok = F.size(F.col("__h")).cast("long")
    with_counts = hashed.select("doc_id", n_tok.alias("__n"), counts.alias("__c"))
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.element_at(F.col("__c"), b + 1) * 2 > F.col("__n"),
            F.lit(1 << b).cast("long"),
        ).otherwise(0)
    return with_counts.select("doc_id", sim.alias("simhash"))


def simhash_explode(docs, bits=32):
    base = docs.select("doc_id", _toks_array(docs).alias("__toks"))
    tok = base.select("doc_id", F.explode("__toks").alias("t")).withColumn(
        "h", F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    )
    aggs = [F.count("*").alias("__n")] + [
        F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(bits)
    ]
    g = tok.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"c{b}") * 2 > F.col("__n"), F.lit(1 << b).cast("long")
        ).otherwise(0)
    return g.select("doc_id", sim.alias("simhash"))


def main():
    spark = get_spark(app_name="bench-simhash", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    big = None
    reps = int(os.environ.get("SIMHASH_REPS", "10"))
    if reps > 1:
        big = docs.select(
            "doc_id", "text", F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("__r")
        ).select(F.concat_ws("#", "doc_id", "__r").alias("doc_id"), "text")

    variants = {
        "filter32": simhash,
        "aggregate1": simhash_aggregate,
        "explode": simhash_explode,
    }
    # correctness cross-check at sf0.1 first
    ref = None
    for name, fn in variants.items():
        got = fn(docs).orderBy("doc_id").toPandas()
        if ref is None:
            ref = got
        else:
            assert got.equals(ref), f"{name} diverges from filter32"
    print("all variants agree on", len(ref), "rows")

    for label, d in [("sf0.1", docs), (f"sf0.1 x{reps}", big)]:
        if d is None:
            continue
        d = d.persist()
        d.count()
        for name, fn in variants.items():
            times = []
            for _ in range(3):
                t0 = time.time()
                fn(d).agg(F.sum("simhash"), F.count("*")).collect()
                times.append(round(time.time() - t0, 2))
            print(f"{label:12s} {name:10s} min={min(times)} all={times}")
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

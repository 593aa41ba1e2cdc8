"""spark-submit entrypoint: build (or resume) an index.

    spark-submit --py-files tirs.zip scripts/submit_build.py \
        --input <transcripts parquet/table> --index-dir <dir> \
        [--chunks N] [--term-buckets N] [--range-buckets N]

On a cluster the SparkSession comes preconfigured by spark-submit; this
script only declares the job. The same entrypoint runs the sandbox
demo with --master local[*].
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--term-buckets", type=int, default=16)
    p.add_argument("--range-buckets", type=int, default=32)
    args = p.parse_args()

    spark = SparkSession.builder.appName("tirs-build").getOrCreate()
    from text_indexing_and_retrieval_system_spark.operators.index_build import (
        IndexBuildConfig,
    )
    from text_indexing_and_retrieval_system_spark.operators.segments import (
        build_index,
    )

    transcripts = (
        spark.read.table(args.input)
        if "." in args.input and not args.input.startswith(("/", "file:", "s3:", "hdfs:"))
        else spark.read.parquet(args.input)
    )
    cfg = IndexBuildConfig(
        n_segment_chunks=args.chunks,
        n_term_buckets=args.term_buckets,
        n_range_buckets=args.range_buckets,
    )
    stats = build_index(spark, transcripts, args.index_dir, cfg, input_desc=args.input)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()

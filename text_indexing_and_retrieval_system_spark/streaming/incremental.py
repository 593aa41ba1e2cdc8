"""Incremental index ingest via Structured Streaming.

The reference's only update path is a full rebuild
(`/root/reference/code/indexes/index_custom.py:654-750`). Here new
transcript turns stream in (file source / Kafka in prod), and each
micro-batch is tokenized and appended as a new *segment* directory with
its own manifest — exactly the unit the batch builder checkpoints — so
the streaming and batch paths share one storage format and one resume
story. `refresh_postings` then folds all accumulated segments into fresh
postings blocks + lexicon (cheap relative to ingest; a production setup
runs it on a schedule, like any LSM-ish two-level design).

Doc ids: streaming turns get conv ids beyond the batch-assigned dense
range via a deterministic hash-partitioned extension map (new convs
only), preserving the doc_id_int ordering invariants within each conv.
For the sandbox tests, stream input re-uses pre-assigned conv ints.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_build as ib
from ..operators.index_build import IndexBuildConfig
from ..operators.segments import Manifests, term_bucket_col
from ..sources.provider import ParquetDirProvider


def extend_convmap(
    spark: SparkSession, index_dir: str, new_transcripts: DataFrame
) -> DataFrame:
    """Register conversations not yet in the convmap: new conv ids get
    dense ints appended after the existing range (sorted lexicographically
    within the extension — deterministic for a given extension set).
    Returns the full updated convmap DataFrame (also persisted)."""
    convmap_path = os.path.join(index_dir, "convmap")
    existing = spark.read.parquet(convmap_path)
    base = existing.agg(F.max("conv_int")).collect()[0][0]
    base = -1 if base is None else base
    new = (
        new_transcripts.select("conv_id")
        .distinct()
        .join(existing, "conv_id", "left_anti")
    )
    from ..operators.index_build import assign_conv_ids

    fresh = assign_conv_ids(spark, new).withColumn(
        "conv_int", F.col("conv_int") + F.lit(base + 1)
    )
    if fresh.limit(1).count() > 0:
        fresh.write.mode("append").parquet(convmap_path)
    return spark.read.parquet(convmap_path)


def ingest_stream(
    stream_df: DataFrame,
    index_dir: str,
    convmap: DataFrame,
    cfg: IndexBuildConfig = IndexBuildConfig(),
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """stream of transcript turns → per-micro-batch segment dirs.

    `stream_df` must carry the transcript schema; conv ids are resolved
    against `convmap` (new conversations must be pre-registered — the
    deterministic id-extension job in a production pipeline).
    Returns the StreamingQuery.
    """
    man = Manifests(index_dir)
    seg_root = os.path.join(index_dir, "segments")

    def process_batch(batch_df: DataFrame, batch_id: int):
        unit = f"stream_batch_{batch_id:06d}"
        if man.done(unit):
            return  # replayed micro-batch after restart: idempotent skip
        t0 = time.time()
        docs = ib.with_doc_ids(batch_df, convmap)
        seg = ib.tokenize_to_doc_postings(docs, cfg.normalize)
        path = os.path.join(seg_root, f"chunk=stream{batch_id:06d}")
        seg.write.mode("overwrite").parquet(path)
        n = batch_df.sparkSession.read.parquet(path).count()
        man.record(unit, rows=n, seconds=time.time() - t0, batch_id=batch_id)

    writer = stream_df.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _resolve_cfg(index_dir: str, cfg: IndexBuildConfig | None) -> IndexBuildConfig:
    """The config recorded in the build manifest is authoritative for
    incremental updates: re-tokenizing with different normalize settings
    or re-bucketing with a different n_term_buckets would silently corrupt
    the index (the reader prunes with the manifest's bucket count). An
    explicit cfg must match the manifest; None loads it."""
    man = Manifests(index_dir)
    info = man.read("build") or man.read("stage3_postings") or {}
    recorded = info.get("config")
    if recorded is None:
        return cfg if cfg is not None else IndexBuildConfig()
    stored = IndexBuildConfig.from_lineage(recorded)
    if cfg is not None and cfg.lineage() != stored.lineage():
        raise ValueError(
            f"explicit config conflicts with the build manifest of {index_dir}: "
            f"{cfg.lineage()} != {stored.lineage()}"
        )
    return stored


def add_documents(
    spark: SparkSession,
    index_dir: str,
    new_transcripts: DataFrame,
    cfg: IndexBuildConfig | None = None,
) -> str:
    """Batch-append new turns as one segment chunk (reference
    `update_index` add path, `index_custom.py:654-750` — but incremental
    instead of delete-and-rebuild). Also appends the turns to the docs/
    hydration store so search(hydrate=True) sees them immediately. Call
    refresh_postings afterwards; config defaults to the build manifest's."""
    cfg = _resolve_cfg(index_dir, cfg)
    man = Manifests(index_dir)
    convmap = extend_convmap(spark, index_dir, new_transcripts)
    existing = [
        u for u in os.listdir(man.dir) if u.startswith("update_add_")
    ]
    unit = f"update_add_{len(existing):06d}"
    t0 = time.time()
    docs = ib.with_doc_ids(new_transcripts, convmap)
    seg = ib.tokenize_to_doc_postings(docs, cfg.normalize)
    path = os.path.join(index_dir, "segments", f"chunk={unit}")
    seg.write.mode("overwrite").parquet(path)
    provider = ParquetDirProvider(index_dir)
    doc_cols = docs.select(
        "doc_id_int", "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    if provider.exists("docs"):
        # idempotent append: a replayed/resumed add (crash between the
        # docs append and the manifest record) must not duplicate
        # hydration rows. Anti-join against the id range this chunk
        # covers — the docs store is doc_id_int-sorted within partitions,
        # so the range predicate prunes to ~nothing on a fresh add (new
        # convs land past the existing range); on a replay it matches the
        # chunk's own rows and the append becomes a no-op.
        # bounds from the DOCS frame, not the tokenized segment: zero-token
        # docs produce no segment rows, and ids outside a segment-derived
        # range would be re-appended on replay. No forced broadcast — on a
        # replay `already` is a full chunk's ids; let Spark (AQE) pick.
        bounds = docs.agg(
            F.min("doc_id_int").alias("lo"), F.max("doc_id_int").alias("hi")
        ).collect()[0]
        if bounds["lo"] is not None:
            already = (
                provider.read(spark, "docs")
                .filter(F.col("doc_id_int").between(bounds["lo"], bounds["hi"]))
                .select("doc_id_int")
            )
            doc_cols = doc_cols.join(already, "doc_id_int", "left_anti")
    provider.append(doc_cols, "docs")
    n = spark.read.parquet(path).count()
    man.record(unit, rows=n, seconds=time.time() - t0)
    return unit


def delete_documents(spark: SparkSession, index_dir: str, doc_ids: list[str]) -> int:
    """Tombstone doc ids (string form conv:turn); refresh_postings
    excludes tombstoned docs from every rebuilt table."""
    doclen = spark.read.parquet(os.path.join(index_dir, "doclen"))
    hits = doclen.filter(F.col("doc_id").isin(doc_ids)).select("doc_id_int", "doc_id")
    n = hits.count()
    if n:
        hits.write.mode("append").parquet(os.path.join(index_dir, "tombstones"))
    return n


def _apply_tombstones(spark: SparkSession, index_dir: str, seg: DataFrame) -> DataFrame:
    tomb_path = os.path.join(index_dir, "tombstones")
    if os.path.isdir(tomb_path):
        tomb = spark.read.parquet(tomb_path).select("doc_id_int")
        return seg.join(F.broadcast(tomb), "doc_id_int", "left_anti")
    return seg


def refresh_postings(
    spark: SparkSession, index_dir: str, cfg: IndexBuildConfig | None = None
) -> dict:
    """Fold ALL segments (batch + streamed) into fresh doclen/stats/
    postings/lexicon/docs — the two-level merge reapplied over the grown
    segment set. Writes to versioned dirs then swaps, so readers never
    see a partial index. Config defaults to the build manifest's (see
    `_resolve_cfg`). An `InvertedIndex` handle held across a refresh
    serves stale stats/lexicon — call its `reload()` afterwards."""
    cfg = _resolve_cfg(index_dir, cfg)
    man = Manifests(index_dir)
    provider = ParquetDirProvider(index_dir)  # the TableProvider seam:
    # point this at an IcebergProvider and the staged-write + commit
    # below become catalog transactions (sources/provider.py)
    seg = spark.read.parquet(os.path.join(index_dir, "segments", "chunk=*"))
    seg = _apply_tombstones(spark, index_dir, seg)
    convmap = spark.read.parquet(os.path.join(index_dir, "convmap"))

    doclen = (
        seg.groupBy("doc_id_int")
        .agg(F.first("dl").alias("dl"))
        .withColumn("conv_int", F.shiftrightunsigned("doc_id_int", ib.TURN_BITS))
        .withColumn(
            "turn_idx",
            (F.col("doc_id_int") - F.col("conv_int") * (1 << ib.TURN_BITS)).cast("int"),
        )
        .join(convmap, "conv_int")
        .withColumn(
            "doc_id",
            # %04d pads but never truncates (see ib.with_doc_ids)
            F.concat_ws(":", F.col("conv_id"), F.format_string("%04d", "turn_idx")),
        )
        .select("doc_id_int", "doc_id", "dl")
    )
    provider.write_staged(
        doclen.repartitionByRange(max(cfg.n_range_buckets // 4, 1), "doc_id_int"),
        "doclen",
    )
    agg = (
        provider.read(spark, provider.stage_name("doclen"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"), F.sum("dl").alias("tt"))
        .collect()[0]
    )
    stats = {
        "n_docs": agg["n_docs"],
        "avgdl": float(agg["avgdl"]),
        "total_tokens": agg["tt"],
        "n_convs": convmap.count(),
        # fresh generation id: keys executor theta-seed caches (see
        # engine.reload) — mtime alone can collide on coarse-mtime FS
        "generation": uuid.uuid4().hex,
    }

    max_doc = seg.agg(F.max("doc_id_int")).collect()[0][0] or 0
    range_shift = max(
        int(max_doc / max(cfg.n_range_buckets, 1)).bit_length(), ib.TURN_BITS
    )
    blocks = ib.build_blocks(seg, cfg, range_shift).withColumn(
        "bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets)
    )
    provider.write_staged(
        blocks.repartition(
            cfg.n_term_buckets * 4, term_bucket_col(F.col("term"), cfg.n_term_buckets * 4)
        ).sortWithinPartitions("term", "first_doc"),
        "postings",
        partition_by=("bucket",),
        options={"parquet.block.size": str(1 << 20)},
    )
    n = stats["n_docs"]
    lex = (
        provider.read(spark, provider.stage_name("postings"))
        .groupBy("term")
        .agg(
            F.sum("n").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.max(ib.impact_bound_col(stats["avgdl"])).alias("max_impact"),
            F.count("*").alias("n_blocks"),
        )
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn("bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets))
    )
    provider.write_staged(lex, "lexicon")

    # docs/ hydration store: drop tombstoned docs (and self-heal duplicate
    # doc_id_int rows a replayed add_documents append may have left —
    # keeper is the min doc_id, matching the reference's first-wins dedup)
    if provider.exists("docs"):
        from ..operators.segments import DOC_COLS

        # select the contract columns: a chunked (per-chunk build) store
        # carries an inferred `chunk` partition column that must not leak
        # into the refreshed flat rewrite
        docs_df = _apply_tombstones(
            spark, index_dir, provider.read(spark, "docs").select(*DOC_COLS)
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("doc_id_int").orderBy("doc_id")
        docs_df = (
            docs_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        provider.write_staged(
            docs_df.repartitionByRange(
                max(cfg.n_range_buckets // 4, 1), "doc_id_int"
            ).sortWithinPartitions("doc_id_int"),
            "docs",
        )

    # swap the staged tables in (rename per table on the parquet backend;
    # catalog transactions on Iceberg) + stats/manifest update
    provider.commit_staged(["doclen", "postings", "lexicon", "docs"])
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    man.record(
        "refresh_postings",
        range_shift=range_shift,
        n_terms=provider.num_rows("lexicon"),
        **stats,
    )
    return stats

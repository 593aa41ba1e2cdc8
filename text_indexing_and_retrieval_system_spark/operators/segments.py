"""Resumable, manifest-checkpointed index build orchestration.

The reference's only "update" story is delete + full rebuild
(`/root/reference/code/indexes/index_custom.py:654-750`). Here every
build stage — and every stage-1 *chunk* (a contiguous conversation
range) — writes to its own directory and records a JSON manifest with
lineage (input, config hash, conv range), row counts, and wall time.
A restarted build skips every manifest-complete unit, so a build killed
mid-way resumes from the last finished chunk and produces an identical
index (verified by tests/test_resume.py).

On-disk layout (parquet-catalog fallback for Iceberg — see
sources/catalog.py for the seam):

    index_dir/
      _manifests/<unit>.json
      convmap/              stage0: conv_id -> dense conv_int
      segments/chunk=<i>/   stage1: (doc_id_int, term, tf, dl, positions)
      doclen/               stage2: doc_id_int, doc_id, dl
      stats.json            stage2: n_docs, avgdl, total_tokens, n_convs
      postings/bucket=<b>/  stage3: compressed blocks, term-bucketed,
                            sorted by (term, first_doc) within files
      lexicon/              stage3: term, df, cf, idf, max_impact
      docs/chunk=<i>/       stage4: doc store for hydration (per-chunk,
                            written FIRST in each pipeline; stage 1
                            tokenizes from it, so raw input is scanned
                            exactly once per build)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import index_build as ib
from .index_build import IndexBuildConfig

N_TERM_BUCKET_EXPR_SUBSTR = 8

# hydration-store column contract (stage 4 / docs/): readers select these
# explicitly so the inferred `chunk=` partition column never leaks out
DOC_COLS = ("doc_id_int", "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts")


def term_bucket_py(term: str, n_buckets: int) -> int:
    """md5-prefix bucket — identical in Python and Spark SQL so the query
    side can prune partition directories for a term without a lookup."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def term_bucket_col(col, n_buckets: int):
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def parquet_num_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job. Local-FS only (the
    cluster path swaps in the catalog's snapshot summary)."""
    import glob as globmod

    import pyarrow.parquet as pq

    total = 0
    for f in globmod.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


class Manifests:
    def __init__(self, index_dir: str):
        self.dir = os.path.join(index_dir, "_manifests")
        os.makedirs(self.dir, exist_ok=True)

    def path(self, unit: str) -> str:
        return os.path.join(self.dir, f"{unit}.json")

    def done(self, unit: str) -> bool:
        p = self.path(unit)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "complete"

    def record(self, unit: str, **info):
        payload = {"unit": unit, "status": "complete", **info}
        tmp = self.path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, default=str)
        os.replace(tmp, self.path(unit))

    def read(self, unit: str) -> dict | None:
        p = self.path(unit)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


def _config_hash(cfg: IndexBuildConfig, input_desc: str) -> str:
    return hashlib.md5(
        json.dumps({"cfg": cfg.lineage(), "input": input_desc}, sort_keys=True).encode()
    ).hexdigest()[:12]


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: IndexBuildConfig = IndexBuildConfig(),
    input_desc: str = "",
    fail_after_chunk: int | None = None,  # test hook: simulate a crash
) -> dict:
    """Run the full (resumable) build; returns the final stats dict."""
    os.makedirs(index_dir, exist_ok=True)
    man = Manifests(index_dir)
    chash = _config_hash(cfg, input_desc)
    prior = man.read("build")
    if prior and prior.get("config_hash") not in (None, chash):
        raise ValueError(
            f"index at {index_dir} was built with different config "
            f"({prior.get('config_hash')} != {chash}); delete it or use a new dir"
        )

    t_build0 = time.time()
    lineage = {"config_hash": chash, "input": input_desc, "config": cfg.lineage()}

    # ---------------- stage 0: conv ids ----------------
    convmap_path = os.path.join(index_dir, "convmap")
    if not man.done("stage0_convmap"):
        t0 = time.time()
        n_convs = ib.assign_and_write_convmap(spark, transcripts, convmap_path)
        man.record(
            "stage0_convmap", n_convs=n_convs, seconds=time.time() - t0, **lineage
        )
    convmap = spark.read.parquet(convmap_path)
    n_convs = man.read("stage0_convmap")["n_convs"]

    docs = ib.with_doc_ids(transcripts, convmap)

    # doc-id range geometry — needed by every later stage's partitioning.
    # Known from n_convs alone (no data pass).
    max_doc = (n_convs << ib.TURN_BITS) + (1 << ib.TURN_BITS)
    range_shift = max(int(max_doc / max(cfg.n_range_buckets, 1)).bit_length(), ib.TURN_BITS)
    n_store_parts = max(cfg.n_range_buckets // 4, 1)
    # shifting 2 more bits than the block bucketing yields ~n_range/4
    # contiguous ranges — a COMPUTED partitioning column, so the exchange
    # is a plain hash repartition (repartitionByRange would add a
    # sampling pass over the child per write)
    store_part_col = F.shiftrightunsigned(F.col("doc_id_int"), range_shift + 2)

    seg_root = os.path.join(index_dir, "segments")
    doclen_path = os.path.join(index_dir, "doclen")
    postings_path = os.path.join(index_dir, "postings")
    lexicon_path = os.path.join(index_dir, "lexicon")
    stats_path = os.path.join(index_dir, "stats.json")
    docs_path = os.path.join(index_dir, "docs")
    n_chunks = cfg.n_segment_chunks
    if n_convs < cfg.chunk_min_convs:
        # deterministic for a given input (n_convs comes from stage 0),
        # so resumes re-derive the same chunk geometry
        n_chunks = 1

    # ---------------- stages 1-4: per-chunk pipelines ----------------
    # Chunks are contiguous conversation ranges, so their doc-id sets are
    # disjoint: docs-store write -> tokenize -> doclen -> pack+write
    # postings runs per chunk with NO global barrier. Block packing no
    # longer needs global avgdl (blocks carry (max_tf, min_dl); the
    # impact bound folds in at read time — ib.impact_bound_col), which is
    # what unlocks the pipeline: chunk i's pack/write (the one phase
    # bounded by the write path, not cores) overlaps chunk i+1's
    # CPU-bound tokenize instead of serializing behind all of stage 1.
    # Per-(term, range_bucket) blocks from different chunks cover
    # disjoint ordered doc ranges, so queries traverse them exactly like
    # same-shuffle blocks.
    #
    # The doc store (stage 4, reference S5 `index_custom.py:203-211`) is
    # folded INTO the chunk pipeline rather than run as a separate
    # full-input job: round-3 measured it as the build's Amdahl floor
    # (~165 s wall at BOTH local[2] and local[8] — a constant tail that
    # caps scaling past ~8 cores). Writing docs/chunk=<i> FIRST and
    # tokenizing from the just-written (columnar, doc_id-sorted) chunk
    # also eliminates the second full scan of the input: the raw input is
    # now read exactly once per build.
    # file/split geometry: stage 1's tokenize parallelism is bounded by
    # the docs chunk's split count, so the write must produce enough
    # row groups for every core to get work (measured: 2 big files per
    # chunk packed into 1-2 scan tasks and built at 0.61 efficiency on
    # the N=2-vs-8 pair; 8 MB row groups + a 16 MB split bin restore
    # ~1.0). Small row groups also sharpen doc_id_int row-group pruning
    # for hydration point-lookups on the sorted store.
    docs_parts_per_chunk = max(
        -(-n_store_parts // n_chunks), spark.sparkContext.defaultParallelism
    )
    legacy_docs = man.done("stage4_docs")  # pre-round-4 flat doc store
    if not legacy_docs and os.path.isdir(docs_path):
        # A pre-round-4 build that crashed MID-stage-4 leaves flat
        # part-*.parquet files at docs/ root with no manifest; writing
        # docs/chunk=<i>/ beside them would mix leaf depths and break
        # Spark partition discovery. No manifest means the flat write
        # never committed — remove the strays before the first chunk.
        import shutil as _shutil

        for entry in os.listdir(docs_path):
            if entry.startswith("chunk="):
                continue
            full = os.path.join(docs_path, entry)
            if os.path.isdir(full):
                _shutil.rmtree(full)
            else:
                os.remove(full)

    # Materialized (persisted/cached) input changes the optimal chunk
    # plan: tokenizing from the doc-store read-back exists to avoid a
    # SECOND scan of raw input, but when the input relation is already
    # materialized a re-scan is free — so stage 1 tokenizes straight
    # from it and runs CONCURRENTLY with the stage-4 doc-store write
    # (guide §2.6 "overlap independent jobs"; the two jobs share the
    # cached scan). Cold/remote inputs keep the single-raw-scan order.
    try:
        lvl = transcripts.storageLevel
        input_materialized = bool(lvl.useMemory or lvl.useDisk)
    except Exception:
        input_materialized = False

    def run_chunk(chunk: int) -> None:
        chunk_seg = os.path.join(seg_root, f"chunk={chunk}")
        chunk_docs = os.path.join(docs_path, f"chunk={chunk}")
        lo = chunk * n_convs // n_chunks
        hi = (chunk + 1) * n_convs // n_chunks

        def do_stage4() -> None:
            unit4 = f"stage4_chunk_{chunk:03d}"
            if legacy_docs or man.done(unit4):
                return
            t0 = time.time()
            part = docs.filter((F.col("conv_int") >= lo) & (F.col("conv_int") < hi))
            (
                part.select(*DOC_COLS)
                # hash on doc_id_int: store_part_col has too few distinct
                # values INSIDE one chunk to fan out. Files then cover
                # scattered ids, but sortWithinPartitions still makes
                # every row group a near-contiguous id quantile — the
                # row-group min/max pruning hydration relies on is kept
                .repartition(docs_parts_per_chunk, F.col("doc_id_int"))
                .sortWithinPartitions("doc_id_int")
                .write.mode("overwrite")
                .option("parquet.block.size", str(8 << 20))
                .parquet(chunk_docs)
            )
            man.record(unit4, conv_range=[lo, hi], seconds=time.time() - t0, **lineage)

        def do_stage1(from_input: bool) -> None:
            unit1 = f"stage1_chunk_{chunk:03d}"
            if man.done(unit1):
                return
            t0 = time.time()
            if legacy_docs or from_input:
                part = docs.filter(
                    (F.col("conv_int") >= lo) & (F.col("conv_int") < hi)
                )
            else:
                # tokenize from the chunk's own doc store — column-pruned
                # to (doc_id_int, text); the raw input is not re-scanned
                part = spark.read.parquet(chunk_docs)
            seg = ib.tokenize_to_doc_postings(part, cfg.normalize)
            seg.write.mode("overwrite").parquet(chunk_seg)
            man.record(
                unit1,
                conv_range=[lo, hi],
                rows=parquet_num_rows(chunk_seg),
                seconds=time.time() - t0,
                **lineage,
            )

        if input_materialized and not legacy_docs:
            with ThreadPoolExecutor(max_workers=2) as pool:
                f4 = pool.submit(do_stage4)
                f1 = pool.submit(do_stage1, True)
                f4.result()
                f1.result()
        else:
            do_stage4()
            do_stage1(False)

        def do_stage2() -> None:
            unit2 = f"stage2_chunk_{chunk:03d}"
            if man.done(unit2):
                return
            t0 = time.time()
            from pyspark.sql import Observation

            seg_c = spark.read.parquet(chunk_seg)
            doclen_c = (
                seg_c.groupBy("doc_id_int")
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
            # chunk stats ride along with the write via observe()
            obs = Observation(f"doclen_stats_{chunk}")
            (
                doclen_c.repartition(n_store_parts, store_part_col)
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_tokens"),
                )
                .sortWithinPartitions("doc_id_int")
                .write.mode("overwrite")
                .parquet(os.path.join(doclen_path, f"chunk={chunk}"))
            )
            agg = obs.get
            man.record(
                unit2,
                n_docs=agg["n_docs"],
                total_tokens=agg["total_tokens"],
                seconds=time.time() - t0,
                **lineage,
            )

        def do_stage3() -> None:
            unit3 = f"stage3_chunk_{chunk:03d}"
            if man.done(unit3):
                return
            t0 = time.time()
            # two shuffles by measurement: pack on (term, range_bucket) —
            # fine-grained, skew-free partitions for the big sort+pack —
            # then re-key the (much smaller) packed blocks to 4 aligned
            # files per bucket dir (a single term-keyed shuffle writing
            # directly was ~40% slower: the dynamic-partition writer
            # re-sorts each task's payload rows by dir)
            seg_c = spark.read.parquet(chunk_seg)
            blocks = ib.build_blocks(seg_c, cfg, range_shift).withColumn(
                "bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets)
            )
            sub_col = term_bucket_col(F.col("term"), cfg.n_term_buckets * 4)
            (
                blocks.repartition(cfg.n_term_buckets * 4, sub_col)
                .sortWithinPartitions("term", "first_doc")
                .write.mode("overwrite")
                # small row groups: files are term-sorted, so per-row-group
                # min/max stats make a query's IN(terms) skip everything
                # but the few groups holding its terms
                .option("parquet.block.size", str(1 << 20))
                .partitionBy("bucket")
                .parquet(os.path.join(postings_path, f"chunk={chunk}"))
            )
            man.record(unit3, seconds=time.time() - t0, **lineage)

        # doclen (stage 2) and block packing (stage 3) both read ONLY the
        # chunk's segments — independent jobs, overlapped (guide §2.6):
        # the small doclen write back-fills executors the pack stage's
        # shuffle tail leaves idle
        with ThreadPoolExecutor(max_workers=2) as pool:
            f2 = pool.submit(do_stage2)
            f3 = pool.submit(do_stage3)
            f2.result()
            f3.result()

    # finer scan splits for the build's own reads: the docs chunks are
    # written with 8 MB row groups, and a 16 MB split bin stops Spark
    # from packing them into a couple of fat tokenize tasks (the split
    # count is stage 1's parallelism ceiling). Restored afterwards.
    SPLIT_CONF = "spark.sql.files.maxPartitionBytes"
    prev_split = spark.conf.get(SPLIT_CONF, None)
    spark.conf.set(SPLIT_CONF, str(16 << 20))
    try:
        if fail_after_chunk is not None:
            # test hook path: strictly sequential so the crash point is
            # exact
            for chunk in range(n_chunks):
                run_chunk(chunk)
                if chunk == fail_after_chunk:
                    raise RuntimeError(
                        f"simulated crash after stage1_chunk_{chunk:03d}"
                    )
        else:
            # chunk pipelines are independent — run them concurrently
            # (the Spark scheduler interleaves the jobs; manifests stay
            # per-unit, so resume granularity is unchanged). In-flight
            # pipelines are bounded by the session's parallelism: each
            # pipeline keeps up to ~2 cores of mixed JVM+python work
            # busy, so defaultParallelism/2 saturates without
            # oversubscribing (6 pipelines on a 2-core session measured
            # 25% SLOWER than 2 — python workers of concurrent
            # applyInPandas stages thrash each other's caches)
            width = min(
                n_chunks, max(1, spark.sparkContext.defaultParallelism // 2), 4
            )
            with ThreadPoolExecutor(max_workers=width) as pool:
                list(pool.map(run_chunk, range(n_chunks)))
    finally:
        if prev_split is None:
            spark.conf.unset(SPLIT_CONF)
        else:
            spark.conf.set(SPLIT_CONF, prev_split)

    # ---------------- stats fold + global lexicon ----------------
    n_docs = 0
    total_tokens = 0
    for chunk in range(n_chunks):
        info = man.read(f"stage2_chunk_{chunk:03d}")
        n_docs += info["n_docs"] or 0
        total_tokens += info["total_tokens"] or 0  # None on an empty chunk
    stats = {
        "n_docs": n_docs,
        # exact-int sum / exact-int count: bit-identical to a global avg
        "avgdl": total_tokens / n_docs if n_docs else 0.0,
        "total_tokens": total_tokens,
        "n_convs": n_convs,
        # random generation id — keys executor-side theta-seed caches
        # (engine.reload); mtime alone can collide on coarse-mtime FS
        "generation": uuid.uuid4().hex,
    }
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)

    if not man.done("stage3_postings"):
        t0 = time.time()
        # lexicon from the written (columnar, payload-pruned) postings —
        # cheaper than persisting the block payloads in memory
        blocks_r = spark.read.parquet(postings_path).select(
            "term", "n", "sum_tf", "max_tf", "min_dl"
        )
        n = stats["n_docs"]
        lex = (
            blocks_r.groupBy("term")
            .agg(
                F.sum("n").alias("df"),
                F.sum("sum_tf").alias("cf"),
                F.max(ib.impact_bound_col(stats["avgdl"])).alias("max_impact"),
                F.count("*").alias("n_blocks"),
            )
            # Lucene/ES BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))
            .withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
            )
            .withColumn("bucket", term_bucket_col(F.col("term"), cfg.n_term_buckets))
        )
        (
            lex.repartition(max(cfg.n_term_buckets // 4, 1), "bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(lexicon_path)
        )
        man.record(
            "stage3_postings",
            n_terms=parquet_num_rows(lexicon_path),
            range_shift=range_shift,
            seconds=time.time() - t0,
            **lineage,
        )

    # ---------------- stage 5: two-level merge (compaction) ----------------
    # Per-chunk posting segments are the BUILD-side layout (pipelining);
    # queries prefer one term-sorted file set per bucket: 6 chunks meant
    # 6x the files/footers/row-group runs per term (measured 15-35%
    # slower 1024-query batches at 4.84M turns). The merge is a single
    # scalable shuffle+write; same columns, same blocks — blocks from
    # different chunks cover disjoint doc ranges and coexist unchanged.
    # Skipped entirely for single-chunk builds: with one chunk the layout
    # is already one term-sorted file set per bucket (under chunk=0/), so
    # the merge would only strip a partition level the readers already
    # handle — pure cost at small scale.
    if cfg.compact and n_chunks > 1 and not man.done("stage5_compact"):
        t0 = time.time()
        merged_tmp = postings_path + "_compact"
        old_path = postings_path + "_old"
        # Crash-atomic swap: rename FIRST, delete LAST, and key recovery
        # on the presence of postings_old (renames are atomic; rmtree is
        # not — a half-deleted postings dir must never be re-read as a
        # compaction source).
        if os.path.isdir(old_path):
            # a previous run completed the merge write (the rename away
            # from postings_path only ever happens after the write
            # finished) and died somewhere in the swap — finish it
            if not os.path.isdir(postings_path):
                if os.path.isdir(merged_tmp):
                    os.rename(merged_tmp, postings_path)
                else:  # pragma: no cover - impossible under this protocol
                    os.rename(old_path, postings_path)
            if os.path.isdir(old_path) and os.path.isdir(postings_path):
                import shutil as _shutil

                _shutil.rmtree(old_path)
        else:
            import shutil as _shutil

            if os.path.isdir(merged_tmp):
                # no postings_old -> the merge write never committed its
                # swap; the tmp dir may be partial, so redo it from the
                # (still intact) chunked source
                _shutil.rmtree(merged_tmp)
            blocks_all = spark.read.parquet(postings_path)
            if "chunk" in blocks_all.columns:
                blocks_all = blocks_all.drop("chunk")
            sub_col = term_bucket_col(F.col("term"), cfg.n_term_buckets * 4)
            (
                blocks_all.repartition(cfg.n_term_buckets * 4, sub_col)
                .sortWithinPartitions("term", "first_doc")
                .write.mode("overwrite")
                .option("parquet.block.size", str(1 << 20))
                .partitionBy("bucket")
                .parquet(merged_tmp)
            )
            os.rename(postings_path, old_path)
            os.rename(merged_tmp, postings_path)
            _shutil.rmtree(old_path)
        man.record("stage5_compact", seconds=time.time() - t0, **lineage)

    man.record(
        "build",
        seconds_total=time.time() - t_build0,
        stats=stats,
        **lineage,
    )
    return stats

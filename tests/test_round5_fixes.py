"""Round-5 fixes from ADVICE.md: docs/ stray-flat-file cleanup before the
first per-chunk write, provider.append empty-frame skip + numeric
partition dirs, and pos_payload-aware block-cache accounting."""

import glob
import os

import pytest

from text_indexing_and_retrieval_system_spark import engine
from text_indexing_and_retrieval_system_spark.operators.index_build import (
    IndexBuildConfig,
)
from text_indexing_and_retrieval_system_spark.sources.provider import (
    ParquetDirProvider,
)


def test_stray_flat_docs_removed_before_chunk_write(spark, corpus_df, tmp_path):
    """A pre-round-4 build that crashed mid-stage-4 leaves flat
    part-*.parquet at docs/ root with NO stage4_docs manifest; resuming
    with the per-chunk writer must remove them, or mixed leaf depths
    break Spark partition discovery on the doc store."""
    d = str(tmp_path / "idx")
    cfg = IndexBuildConfig(n_term_buckets=4, n_range_buckets=4, n_segment_chunks=2)
    idx = engine.build(spark, corpus_df, d, cfg, input_desc="strays")
    want = idx.search_collect('"said" OR "index"', k=10)

    docs = os.path.join(d, "docs")
    # simulate the crashed legacy flat write: strays at docs/ root,
    # chunk 0 not yet committed
    import shutil

    shutil.rmtree(os.path.join(docs, "chunk=0"))
    os.remove(os.path.join(d, "_manifests", "stage4_chunk_000.json"))
    os.remove(os.path.join(d, "_manifests", "build.json"))
    with open(os.path.join(docs, "part-00000-dead.parquet"), "wb") as f:
        f.write(b"PAR1 not a real file")
    open(os.path.join(docs, "_SUCCESS"), "w").close()

    idx2 = engine.build(spark, corpus_df, d, cfg, input_desc="strays")
    root_entries = [e for e in os.listdir(docs) if not e.startswith("chunk=")]
    assert root_entries == [], root_entries
    assert glob.glob(os.path.join(docs, "chunk=*", "*.parquet"))
    # the store still reads as one partitioned table and queries agree
    got = idx2.search_collect('"said" OR "index"', k=10)
    assert got.docs == want.docs and got.scores == want.scores
    assert spark.read.parquet(docs).count() > 0


def test_provider_append_skips_empty_and_keeps_int_partitions(spark, tmp_path):
    p = ParquetDirProvider(str(tmp_path / "tbl"))
    df = spark.range(3).withColumnRenamed("id", "doc_id_int")
    # seed a hive-partitioned layout like docs/chunk=0
    df.write.parquet(os.path.join(p.location("docs"), "chunk=0"))

    loc = p.location("docs")
    p.append(df.limit(0), "docs")  # replay case: must be a no-op
    assert sorted(os.listdir(loc)) == ["chunk=0"]

    p.append(df, "docs")
    assert sorted(os.listdir(loc)) == ["chunk=0", "chunk=1"]
    # partition column stays numeric for every reader
    back = spark.read.parquet(loc)
    kind = dict(back.dtypes)["chunk"]
    assert kind in ("int", "bigint"), kind
    assert back.count() == 6

    # appending again continues the numeric sequence
    p.append(df, "docs")
    assert sorted(os.listdir(loc)) == ["chunk=0", "chunk=1", "chunk=2"]


def test_block_cache_accounts_pos_payload(spark, built_index):
    """Frames cached with with_positions=True carry pos_payload (usually
    larger than payload); the LRU budget must charge for both."""
    idx = built_index
    idx._block_cache.clear()
    idx._block_cache_bytes = 0
    # a phrase query pulls position-bearing blocks through the driver path
    res = idx.search_collect('PHRASE "it said"', k=5)
    assert idx._block_cache, "driver path did not populate the cache"
    expect = 0
    has_pos = False
    for g in idx._block_cache.values():
        expect += engine.InvertedIndex._frame_bytes(g)
        if len(g) and "pos_payload" in g.columns:
            has_pos = True
    assert idx._block_cache_bytes == expect
    assert has_pos, "expected at least one position-bearing cached frame"
    # and the charge is strictly larger than payload alone for pos frames
    payload_only = sum(
        int(g["payload"].map(len).sum()) for g in idx._block_cache.values() if len(g)
    )
    assert expect > payload_only

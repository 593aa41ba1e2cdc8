"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship BM25 top-k over sf0.001 documents.
`queries()` / `oracle_sql()` — one entry per implemented operator family
from SURVEY.md §2 (+ the training-data pipeline ops), each matched
against a DuckDB ANSI-SQL oracle on the same parquet tables.

Implementation lives in text_indexing_and_retrieval_system_spark/
(operators/docquery.py, dedup.py, similarity.py, functions/textstats.py);
the indexed engine path (compressed posting blocks + block-max scorer)
is exercised by the pytest golden suite over the transcript corpus.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from text_indexing_and_retrieval_system_spark.functions import textstats
from text_indexing_and_retrieval_system_spark.operators import (
    dedup,
    docquery,
    multimodal,
    similarity,
)

BM25_TERMS = ["join", "merge", "scan"]
TFIDF_TERMS = ["hash", "filter"]
WC_TERMS = ["row", "batch"]


_SHIPPED_TO: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers regardless
    of how the session was launched (the spark-submit --py-files story,
    done lazily): zip the package and addPyFile it once per context."""
    ctx_id = id(spark.sparkContext)
    if ctx_id in _SHIPPED_TO:
        return
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    pkg = "text_indexing_and_retrieval_system_spark"
    zpath = os.path.join(tempfile.gettempdir(), f"tirs_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for dirpath, _, files in os.walk(os.path.join(root, pkg)):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added or unsupported — executor PYTHONPATH may cover it
    _SHIPPED_TO.add(ctx_id)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: free-text BM25 top-20 on the documents table."""
    return docquery.ranked_topk(
        _docs(spark, "/root/testdata/sf0.001"), BM25_TERMS, "bm25", k=20
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- boolean retrieval (F1-F5) ----
    q["term_postings"] = lambda s, d: docquery.term_postings(_docs(s, d), "merge")
    q["bool_and"] = lambda s, d: docquery.bool_and(_docs(s, d), "join", "hash")
    q["bool_or_not"] = lambda s, d: docquery.bool_or_not(
        _docs(s, d), "scan", "filter", "join"
    )
    q["phrase_match"] = lambda s, d: docquery.phrase_match(_docs(s, d), "order", "sort")

    # ---- ranking (R2/R4; B2-B3 scorers) ----
    q["bm25_topk"] = lambda s, d: docquery.ranked_topk(_docs(s, d), BM25_TERMS, "bm25")
    q["tfidf_topk"] = lambda s, d: docquery.ranked_topk(
        _docs(s, d), TFIDF_TERMS, "tfidf"
    )
    q["wordcount_topk"] = lambda s, d: docquery.ranked_topk(_docs(s, d), WC_TERMS, "wordcount")

    # ---- corpus statistics (B4, P7, doclen/stats tables) ----
    q["doclen"] = lambda s, d: docquery.doclen(_docs(s, d))
    q["corpus_stats"] = lambda s, d: docquery.corpus_stats(_docs(s, d))
    q["word_freq_top50"] = lambda s, d: docquery.word_freq_top(_docs(s, d), 50)
    q["term_stats"] = lambda s, d: docquery.term_stats(_docs(s, d), min_df=100)

    # ---- dedup family ----
    q["dedup_exact"] = lambda s, d: dedup.exact_dedup_groups(_docs(s, d))
    q["ngram_jaccard_pairs"] = lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), n=3, threshold=0.2
    )
    q["minhash_signatures"] = lambda s, d: dedup.minhash_signatures(
        _docs(s, d), n=3, n_hashes=8
    )
    q["lsh_candidate_pairs"] = lambda s, d: dedup.lsh_candidate_pairs(
        _docs(s, d), n=3, n_hashes=8, rows_per_band=2
    )
    q["simhash"] = lambda s, d: dedup.simhash(_docs(s, d), bits=32)
    q["dedup_clusters"] = lambda s, d: dedup.neardup_clusters(
        _docs(s, d), n=3, threshold=0.2
    )

    # ---- text analysis ----
    q["token_counts"] = lambda s, d: textstats.token_counts(_docs(s, d))
    q["quality_scores"] = lambda s, d: textstats.quality_scores(_docs(s, d))
    q["langid"] = lambda s, d: textstats.langid(_docs(s, d))
    q["content_fingerprint"] = lambda s, d: textstats.content_fingerprint(_docs(s, d))
    q["rolling_fingerprints"] = lambda s, d: textstats.rolling_fingerprints(
        _docs(s, d), window=8
    )

    # ---- similarity search ----
    q["cosine_topk"] = lambda s, d: similarity.cosine_topk(_emb(s, d), 0, k=10)
    q["embedding_neardup"] = lambda s, d: similarity.embedding_neardup_pairs(
        _emb(s, d), threshold=0.35
    )
    q["embedding_neardup_lsh"] = lambda s, d: similarity.embedding_neardup_lsh(
        _emb(s, d), dim=64, threshold=0.35, n_planes=4
    )
    q["ann_topk_lsh"] = lambda s, d: similarity.ann_topk_lsh(
        _emb(s, d), 0, dim=64, k=10, n_planes=8
    )
    q["ann_topk_lsh_multiprobe"] = lambda s, d: similarity.ann_topk_lsh(
        _emb(s, d), 0, dim=64, k=10, n_planes=8, multiprobe=1
    )
    q["ann_topk_ivf"] = lambda s, d: similarity.ann_topk_ivf(
        _emb(s, d), 0, k=10, nlist=16, stride=31, nprobe=3
    )

    def _ivf_store(s, d):
        # the at-scale path: materialize the inverted file (embeddings
        # partitioned by centroid id), then answer from partition-pruned
        # scans of the nprobe probed cids only — same oracle as the
        # in-plan variant (results are identical by construction)
        import tempfile

        emb = _emb(s, d)
        cents = similarity.ivf_centroids(emb, nlist=16, stride=31)
        path = os.path.join(
            tempfile.gettempdir(), "tirs_ivf_store_" + os.path.basename(d.rstrip("/"))
        )
        similarity.build_ivf_store(emb, cents, path)
        return similarity.ann_topk_ivf_store(s, path, emb, 0, cents, k=10, nprobe=3)

    q["ann_topk_ivf_store"] = _ivf_store

    # ---- multimodal decode (round 4: REAL PPM/WAV codec kernels) ----
    # documents -> deterministic PPM/WAV payloads via the real encoders
    # -> decode + feature-extract inside one Arrow kernel; the emitted
    # payload sizes have a closed-form SQL oracle (see
    # multimodal.media_from_documents docstring)
    def _mm(s, d):
        from pyspark.sql import functions as F

        media = multimodal.media_from_documents(_docs(s, d))
        # the declared output is size-only — skip the decode+feature
        # kernel the select would discard (mapInPandas is opaque, so
        # Catalyst cannot prune it; guide §4). Same rows, same oracle.
        return multimodal.extract_features(
            media, fake=False, with_feature=False
        ).select(
            "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes")
        )

    q["multimodal_features"] = _mm

    # ---- stemming distributed over the corpus (Snowball + Lancaster) ----
    # both oracled against vendored hand-derived (spec-on-paper)
    # term->stem fixtures via DuckDB read_csv — see oracle_sql(),
    # tests/test_porter2_fixture.py and tests/test_lancaster.py; the
    # algorithms themselves are also spec-example-tested there
    def _stem_top50(algo: str):
        def run_query(s, d):
            from pyspark.sql import functions as F

            from text_indexing_and_retrieval_system_spark.functions.normalize import (
                NormalizeConfig,
                normalize_to_tokens,
            )

            cfg = NormalizeConfig(stemming=algo, stopword_languages=())
            docs = _docs(s, d).select("doc_id", "text")

            def run(batches):
                import pandas as pd

                for pdf in batches:
                    toks = normalize_to_tokens(pdf["text"], cfg)
                    out = pd.DataFrame(
                        {"doc_id": pdf["doc_id"], "stem": toks}
                    ).explode("stem")
                    yield out.dropna()

            stems = docs.mapInPandas(run, schema="doc_id long, stem string")
            return (
                stems.groupBy("stem")
                .agg(F.count("*").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("stem"))
                .limit(50)
            )

        return run_query

    q["stem_snowball_top50"] = _stem_top50("snowball")
    q["stem_lancaster_top50"] = _stem_top50("lancaster")

    # ---- relational operators on the TPC-H-ish tables (scan/join/agg/topk) ----
    q["pricing_summary"] = _pricing_summary
    q["revenue_by_nation"] = _revenue_by_nation
    q["events_hourly"] = _events_hourly
    q["user_sessions"] = _user_sessions
    return q


def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def _user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (window functions): sessions split at >30-min gaps
    per user; per-user session count + largest session."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet TIMESTAMP is NTZ here; epoch seconds via tz cast (session UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count("*").alias("n_events"))
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


SQL_USER_SESSIONS = """
with marked as (
  select user_id, ts,
         case when lag(ts) over (partition by user_id order by ts) is null
                   or epoch(ts) - epoch(lag(ts) over (partition by user_id order by ts)) > 1800
              then 1 else 0 end as new_sess
  from events),
sess as (select user_id, ts,
                sum(new_sess) over (partition by user_id order by ts
                                    rows between unbounded preceding and current row) as sess_id
         from marked),
per_sess as (select user_id, sess_id, count(*) as n_events from sess group by 1, 2)
select user_id, count(*) as n_sessions, max(n_events) as max_session_events
from per_sess group by user_id order by user_id
"""


def _stem_oracle(fixture_csv: str) -> str:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", fixture_csv
    )
    return f"""
with toks as ({docquery.SQL_TOKS}),
m as (select * from read_csv('{path}', header=true,
                             columns={{'term': 'varchar', 'stem': 'varchar'}}))
select coalesce(m.stem, toks.term) as stem, count(*) as freq
from toks left join m on toks.term = m.term
group by 1 order by freq desc, stem asc limit 50
"""


def oracle_sql() -> dict[str, str]:
    return {
        "term_postings": docquery.sql_term_postings("merge"),
        "bool_and": docquery.sql_bool_and("join", "hash"),
        "bool_or_not": docquery.sql_bool_or_not("scan", "filter", "join"),
        "phrase_match": docquery.sql_phrase("order", "sort"),
        "bm25_topk": docquery.sql_ranked_topk(BM25_TERMS, "bm25"),
        "tfidf_topk": docquery.sql_ranked_topk(TFIDF_TERMS, "tfidf"),
        "wordcount_topk": docquery.sql_ranked_topk(WC_TERMS, "wordcount"),
        "doclen": docquery.sql_doclen(),
        "corpus_stats": docquery.sql_corpus_stats(),
        "word_freq_top50": docquery.sql_word_freq_top(50),
        "term_stats": docquery.sql_term_stats(min_df=100),
        "dedup_exact": dedup.sql_exact_dedup_groups(),
        "ngram_jaccard_pairs": dedup.sql_ngram_jaccard_pairs(n=3, threshold=0.2),
        "dedup_clusters": dedup.sql_neardup_clusters(n=3, threshold=0.2),
        "minhash_signatures": dedup.sql_minhash_signatures(n=3, n_hashes=8),
        "lsh_candidate_pairs": dedup.sql_lsh_candidate_pairs(
            n=3, n_hashes=8, rows_per_band=2
        ),
        "simhash": dedup.sql_simhash(bits=32),
        "token_counts": textstats.sql_token_counts(),
        "quality_scores": textstats.sql_quality_scores(),
        "langid": textstats.sql_langid(),
        "content_fingerprint": textstats.sql_content_fingerprint(),
        "rolling_fingerprints": textstats.sql_rolling_fingerprints(window=8),
        "cosine_topk": similarity.sql_cosine_topk(0, k=10),
        "embedding_neardup": similarity.sql_embedding_neardup_pairs(threshold=0.35),
        "embedding_neardup_lsh": similarity.sql_embedding_neardup_lsh(
            dim=64, threshold=0.35, n_planes=4
        ),
        "ann_topk_lsh": similarity.sql_ann_topk_lsh(0, dim=64, k=10, n_planes=8),
        "ann_topk_lsh_multiprobe": similarity.sql_ann_topk_lsh(
            0, dim=64, k=10, n_planes=8, multiprobe=1
        ),
        "ann_topk_ivf": similarity.sql_ann_topk_ivf(
            0, k=10, nlist=16, stride=31, nprobe=3
        ),
        "ann_topk_ivf_store": similarity.sql_ann_topk_ivf(
            0, k=10, nlist=16, stride=31, nprobe=3
        ),
        # DuckDB has no offline stem() (fts extension is not
        # downloadable here), so these oracles join the corpus tokens
        # against vendored term->stem fixtures whose rows were derived
        # BY HAND from the published algorithms (independent of this
        # repo's implementations — see tests/test_porter2_fixture.py and
        # tests/test_lancaster.py for the per-word derivations and the
        # full-vocab coverage guards). Unknown tokens fall back to
        # identity, which would hash-MISMATCH against the stemmed Spark
        # side — an alert, not a silent pass — if the testdata
        # vocabulary ever grows.
        "stem_snowball_top50": _stem_oracle("porter2_vocab_stems.csv"),
        "stem_lancaster_top50": _stem_oracle("lancaster_vocab_stems.csv"),
        # payload-size closed form: PPM = 11-byte header + 48 pixel
        # bytes; WAV = 44-byte RIFF header + 2*max(min(bytes,192)//2, 8)
        "multimodal_features": """
select doc_id as media_id,
       case when doc_id % 2 = 0 then 'image' else 'audio' end as kind,
       case when doc_id % 2 = 0 then 59
            else 44 + 2 * greatest(least(octet_length(encode(coalesce(text, ''))), 192) // 2, 8)
       end as n_bytes
from documents
""",
        "pricing_summary": """
select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
       round(sum(l_extendedprice), 2) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
       round(avg(l_discount), 6) as avg_disc, count(*) as count_order
from lineitem group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
""",
        "revenue_by_nation": """
select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*) as n_items
from lineitem join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join nation on c_nationkey = n_nationkey
group by n_name order by revenue desc, n_name asc
""",
        "events_hourly": """
select date_trunc('hour', ts) as hour, event_type, count(*) as n_events,
       round(sum(value), 2) as sum_value
from events group by 1, 2 order by hour, event_type
""",
        "user_sessions": SQL_USER_SESSIONS,
    }

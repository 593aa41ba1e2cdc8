"""Scoring + top-k: the pure-DataFrame (Catalyst) ranked-retrieval path.

The reference's TAAT accumulator (`/root/reference/code/indexes/
query_processing/query_processing_engine.py:318-362`) is literally a hash
aggregate: postings of the scoring terms, filtered to the boolean
candidate set, summed per doc. Here that is expressed declaratively —
Catalyst gives partial+final aggregation, the candidate semi-join is
pushed below the aggregate, and `orderBy().limit(k)` becomes
TakeOrderedAndProject (the distributed equivalent of the reference's
size-k heap, `:407-450`).

Scorers (reference `_get_score_key` dispatch, `:295-316`, extended with
the BM25 the reference's ES ground truth uses):
    wordcount: tf
    tfidf:     tf * ln(N/df)                (`index_custom.py:240-250`)
    bm25:      idf * (tf*(k1+1)/(tf + k1*((1-b) + b*dl/avgdl)))
               idf = ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75

Float determinism: per-doc contributions are collected as
(term_idx, contrib) structs, array_sort-ed, and left-folded — the sum
order is the query's term order, identical to the oracle's accumulation
order, so scores are bit-identical, not merely close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def contribution_col(scorer: str, avgdl: float, n_docs: int):
    """Per-(term,doc) score contribution from columns tf, dl, df, idf."""
    tf = F.col("tf").cast("double")
    if scorer == "wordcount":
        return tf
    if scorer == "tfidf":
        return tf * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    if scorer == "bm25":
        denom = tf + F.lit(K1) * (
            F.lit(1.0 - B) + (F.lit(B) * F.col("dl").cast("double")) / F.lit(avgdl)
        )
        return F.col("idf") * (tf * F.lit(K1 + 1.0) / denom)
    raise ValueError(f"unknown scorer {scorer!r}")


def score_candidates(
    candidates: DataFrame,
    term_postings: DataFrame,
    scorer: str,
    avgdl: float,
    n_docs: int,
) -> DataFrame:
    """candidates(doc_id_int) × term_postings(term_idx, doc_id_int, tf,
    dl, df, idf) → (doc_id_int, score), zero-filled for candidates that
    match no scoring term (`query_processing_engine.py:356-358`)."""
    contrib = term_postings.join(candidates, "doc_id_int", "left_semi").select(
        "doc_id_int",
        F.struct(
            F.col("term_idx").alias("i"),
            contribution_col(scorer, avgdl, n_docs).alias("c"),
        ).alias("tc"),
    )
    summed = contrib.groupBy("doc_id_int").agg(
        F.aggregate(
            F.array_sort(F.collect_list("tc")),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )
    return (
        candidates.join(summed, "doc_id_int", "left")
        .select("doc_id_int", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def top_k(scored: DataFrame, doclen: DataFrame, k: int) -> DataFrame:
    """Total order (score DESC, doc_id_int ASC) → TakeOrderedAndProject.

    The engine-wide tie-break is doc_id_int — i.e. (conv rank, turn_idx) —
    on EVERY path (dataframe, wand, batch) and in the oracle. Tie-breaking
    on the doc_id *string* would diverge when one conv_id is a prefix of
    another ('conv1:0005' sorts after 'conv12:0000' as strings)."""
    return (
        scored.join(doclen.select("doc_id_int", "doc_id"), "doc_id_int")
        .orderBy(F.desc("score"), F.asc("doc_id_int"))
        .limit(k)
        .select("doc_id", "doc_id_int", "score")
    )

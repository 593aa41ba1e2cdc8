"""Block-max top-k scorer over the compressed postings blocks.

Spark-shaped successor of the reference's DAAT + thresholding + early
stopping (`/root/reference/code/indexes/query_processing/
query_processing_engine.py:364-460`): instead of one pointer-advancing
Python loop, the doc space is already split into contiguous doc-id range
buckets at build time, so each executor scores one bucket's blocks fully
vectorized (numpy) and emits a local top-k; the global top-k is the
TakeOrderedAndProject merge of the per-bucket winners — the distributed
analogue of the reference's single min-heap (`:407-450`).

Block-level pruning (the block-max part): a block cannot contribute to
the top-k unless `idf_t * block_max_impact + Σ_{u≠t} ub_u > θ`, where
ub_u is term u's global max score and θ a score threshold. θ can be
seeded from a previous batch or estimated; with θ=0 all blocks decode
(exact full scoring). Pruning never changes results because skipped
blocks are provably below the threshold of the *k-th best overall* —
we only skip when θ is a certified lower bound (local top-k so-far).

Scores are accumulated per doc in ascending term order, matching the
oracle/DataFrame paths bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codec

K1 = 1.2
B = 0.75

TOPK_SCHEMA = "doc_id_int long, score double"

# fixed partition count for the bucket-kernel shuffles: an EXPLICIT
# repartition (not groupBy's default) so AQE can't coalesce the stage
# down by Arrow byte size — the kernel's cost is python CPU per bucket,
# which AQE's size heuristic cannot see. 64 partitions over <=32 bucket
# keys keeps hash collisions (two buckets on one task = a straggler)
# rare while staying cheap at low core counts; identical at every
# parallelism level so scaling runs compare identical plans.
KERNEL_SHUFFLE_PARTITIONS = 64


KERNEL_COLS = ["term", "range_bucket", "first_doc", "last_doc", "block_max_impact", "payload"]


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of one int32, matching Spark's `hash()` /
    HashPartitioning for integer keys (same seed 42) — lets the driver
    predict which shuffle partition a bucket id lands on without a job."""
    m = 0xFFFFFFFF
    k = (x & m) * 0xCC9E2D51 & m
    k = ((k << 15) | (k >> 17)) & m
    k = (k * 0x1B873593) & m
    h = (seed ^ k) & m
    h = ((h << 13) | (h >> 19)) & m
    h = (h * 5 + 0xE6546B64) & m
    h ^= 4  # length in bytes
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h  # int32


def _slot_values(n_parts: int) -> list[int]:
    """For each partition index p in [0, n_parts): an int v with
    murmur3(v) % n_parts == p. Remapping bucket b to value v_b makes
    Spark's HashPartitioning place every bucket on its OWN partition —
    n_parts tasks, all non-empty, no hash-collision stragglers and no
    empty partitions each paying the UDF-closure ship + unpickle."""
    out: dict[int, int] = {}
    v = 0
    while len(out) < n_parts:
        p = _murmur3_int32(v) % n_parts
        if p not in out:
            out[p] = v
        v += 1
    return [out[p] for p in range(n_parts)]


def _bucket_grouped(blocks: DataFrame, n_buckets: int | None = None):
    # slim the kernel shuffle to the columns the kernels read (drops the
    # partition/bucket/stats columns; pos_payload rides along only when
    # the caller selected it for a phrase tree)
    cols = KERNEL_COLS + (["pos_payload"] if "pos_payload" in blocks.columns else [])
    slim = blocks.select(*cols)
    if not n_buckets:
        return slim.repartition(KERNEL_SHUFFLE_PARTITIONS, "range_bucket").groupBy(
            "range_bucket"
        )
    slotted, n_parts = _with_slot(slim, n_buckets)
    return slotted.repartition(n_parts, "__slot").groupBy("__slot")


def _with_slot(df: DataFrame, n_buckets: int):
    """Attach the partition-placement slot column (see _slot_values).
    Buckets outside [0, n_buckets) map to null — they share one group,
    which is still EXACT: a group holding several buckets' blocks scores
    like one bigger bucket (doc sets are disjoint), so placement only
    ever affects performance, never results.

    NOTE (round-5 falsified idea): subdividing a range bucket into
    finer placement groups (e.g. by first_doc bits) is NOT sound here,
    even though blocks are doc-disjoint per term: a doc's score
    accumulates across ITS QUERY TERMS' blocks, whose first_docs differ
    per term — a sub-bucket split can send them to different groups and
    emit partial scores (caught by
    test_batch_kernel_split_is_placement_invariant before it shipped).
    Groups must stay unions of whole doc-range buckets."""
    n_parts = n_buckets
    vals = _slot_values(n_parts)
    # ONE py4j call: F.create_map over 2*n literal Columns costs ~n
    # driver round trips (~0.1 s/query at 32 buckets, pure driver time)
    pairs = ",".join(f"{b},{vals[b]}" for b in range(n_parts))
    mapping = F.expr(f"map({pairs})")
    return df.withColumn("__slot", mapping[F.col("range_bucket")]), n_parts


def _dl_grouped(dl_b: DataFrame, n_buckets: int | None = None):
    """Doclen side of the NOT-universe cogroup, slotted with the SAME
    mapping as the blocks side so matching buckets land together."""
    if not n_buckets:
        return dl_b.repartition(KERNEL_SHUFFLE_PARTITIONS, "range_bucket").groupBy(
            "range_bucket"
        )
    slotted, n_parts = _with_slot(dl_b, n_buckets)
    return slotted.repartition(n_parts, "__slot").groupBy("__slot")


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame({"doc_id_int": [], "score": []}).astype(
        {"doc_id_int": "int64", "score": "float64"}
    )


_DECODE_CACHE: dict[tuple[bytes, float], tuple[np.ndarray, np.ndarray]] = {}
_DECODE_CACHE_MAX = 200_000  # blocks; ~100-300 MB worst case per executor


def _decode_block(payload: bytes, avgdl: float) -> tuple[np.ndarray, np.ndarray]:
    """Payload → (doc_ids, impacts), memoized per executor process.

    Query batches share Zipfian pool terms, so the same hot blocks decode
    over and over; executors are long-lived, so an in-process cache keyed
    by (payload bytes, avgdl) amortizes the decode the way a real engine
    keeps hot posting lists paged in."""
    if not isinstance(payload, bytes):
        payload = bytes(payload)
    key = (payload, avgdl)
    got = _DECODE_CACHE.get(key)
    if got is not None:
        return got
    d, tf, dl, _ = codec.unpack_postings(payload)
    tf_f = tf.astype(np.float64)
    denom = tf_f + K1 * ((1.0 - B) + (B * dl.astype(np.float64)) / avgdl)
    out = (d, tf_f * (K1 + 1.0) / denom)
    if len(_DECODE_CACHE) < _DECODE_CACHE_MAX:
        _DECODE_CACHE[key] = out
    return out


def score_bucket_pruned(
    pdf: pd.DataFrame,
    term_meta: dict[str, list[tuple[int, float]]],
    avgdl: float,
    k: int,
    theta_seed: float = -np.inf,
) -> tuple[pd.DataFrame, int, int]:
    """Exact top-k with MaxScore-style block skipping (the reference's
    thresholding/early-stopping, R5/R6, rebuilt for block granularity).

    Phase A (candidate discovery): terms processed in descending upper
    bound (ub = Σ occurrence idfs × bucket-max impact). Once the
    certified k-th partial score θ strictly exceeds the sum of remaining
    terms' ubs, later terms cannot introduce new top-k docs, so only
    their blocks whose doc-id range overlaps existing candidates are
    decoded — whole blocks are skipped using the block-max/first/last
    metadata without touching payload bytes.

    Phase B (exact rescore): contributions re-accumulated over the
    surviving candidates in ascending term-occurrence order — the same
    float summation order as the oracle and the DataFrame path, so
    scores stay bit-identical. Skipped blocks provably contain no
    candidates, so no contribution is missed.

    `theta_seed` is a CERTIFIED lower bound on the global k-th best
    score (e.g. another bucket's exact local k-th, or this query's k-th
    from a previous run) — with it, skipping fires before the bucket
    accumulates k candidates of its own (cross-bucket theta, R6). A doc
    excluded under the seed scores STRICTLY below k other docs, so
    results (ties included) are unchanged.

    Returns (top-k frame, n_blocks_total, n_blocks_decoded).
    """
    if pdf.empty:
        return _empty_topk(), 0, 0

    per_term_blocks: dict[str, pd.DataFrame] = {
        t: grp.sort_values("first_doc")
        for t, grp in pdf.groupby("term", sort=False)
        if t in term_meta
    }
    if not per_term_blocks:
        return _empty_topk(), int(len(pdf)), 0

    idf_sum = {t: sum(idf for _, idf in term_meta[t]) for t in per_term_blocks}
    ub = {
        t: idf_sum[t] * float(grp["block_max_impact"].max())
        for t, grp in per_term_blocks.items()
    }
    order = sorted(per_term_blocks, key=lambda t: -ub[t])
    suffix = np.cumsum([ub[t] for t in order][::-1])[::-1]

    n_total = int(len(pdf))
    n_decoded = 0
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    cands = np.empty(0, dtype=np.int64)
    part = np.empty(0, dtype=np.float64)

    for i, term in enumerate(order):
        grp = per_term_blocks[term]
        theta_local = (
            np.partition(part, part.size - k)[part.size - k]
            if part.size >= k
            else -np.inf
        )
        theta = max(theta_local, theta_seed)
        restricted = suffix[i] < theta
        firsts = grp["first_doc"].to_numpy(dtype=np.int64)
        lasts = grp["last_doc"].to_numpy(dtype=np.int64)
        if restricted:
            lo = np.searchsorted(cands, firsts, side="left")
            hi = np.searchsorted(cands, lasts, side="right")
            keep = lo < hi  # block range contains >= 1 candidate
            # block-max refinement (the BMW check proper): even a block
            # WITH candidates skips when its own bound cannot lift any
            # of them to theta — every candidate c in the block scores
            # at most part[c] + idf*block_max + Σ remaining ubs, and a
            # candidate appears in at most one block of this term. This
            # is where non-flat per-block bounds (long-doc / low-tf
            # regions) pay off; strict `<` preserves plateau ties.
            bmax = grp["block_max_impact"].to_numpy(dtype=np.float64)
            rem = suffix[i + 1] if i + 1 < len(order) else 0.0
            for j in np.flatnonzero(keep):
                seg_max = part[lo[j] : hi[j]].max()
                if seg_max + idf_sum[term] * bmax[j] + rem < theta:
                    keep[j] = False
        else:
            keep = np.ones(len(grp), dtype=bool)
        payloads = grp["payload"].to_numpy()
        docs_parts, imp_parts = [], []
        for j in np.flatnonzero(keep):
            d, imp = _decode_block(payloads[j], avgdl)
            docs_parts.append(d)
            imp_parts.append(imp)
        n_decoded += int(keep.sum())
        if not docs_parts:
            decoded[term] = (np.empty(0, dtype=np.int64), np.empty(0))
            continue
        d_all = np.concatenate(docs_parts)
        imp_all = np.concatenate(imp_parts)
        decoded[term] = (d_all, imp_all)
        contrib = idf_sum[term] * imp_all
        if restricted:
            idx = np.searchsorted(cands, d_all)
            valid = (idx < cands.size) & (cands[np.minimum(idx, cands.size - 1)] == d_all)
            part[idx[valid]] += contrib[valid]
        else:
            merged = np.union1d(cands, d_all)
            new_part = np.zeros(merged.size, dtype=np.float64)
            new_part[np.searchsorted(merged, cands)] = part
            np.add.at(new_part, np.searchsorted(merged, d_all), contrib)
            cands, part = merged, new_part
        # BMW-style candidate pruning (exact): a candidate that cannot
        # reach theta even with every REMAINING term's maximum
        # contribution scores strictly below k certified docs — drop it
        # now, shrinking the overlap set later restricted terms' blocks
        # are tested against (this is what turns restriction into actual
        # whole-block skips: fewer candidates -> sparser overlap).
        # `>=` keeps exact-bound candidates, so plateau ties survive;
        # the k best PARTIALS always survive (their part >= theta), so
        # the next iteration's theta_local is unchanged.
        if i + 1 < len(order) and part.size > k:
            theta_now = max(
                np.partition(part, part.size - k)[part.size - k], theta_seed
            )
            keep_c = part + suffix[i + 1] >= theta_now
            if not keep_c.all():
                cands, part = cands[keep_c], part[keep_c]

    if cands.size == 0:
        return _empty_topk(), n_total, n_decoded

    # phase B: exact rescore of candidates in term-occurrence order
    occs = sorted(
        (idx, t, idf)
        for t in decoded
        for (idx, idf) in term_meta.get(t, [])
    )
    scores = np.zeros(cands.size, dtype=np.float64)
    for _, term, idf in occs:
        d, imp = decoded[term]
        if d.size == 0:
            continue
        idx = np.searchsorted(cands, d)
        valid = (idx < cands.size) & (cands[np.minimum(idx, cands.size - 1)] == d)
        scores[idx[valid]] += idf * imp[valid]

    if cands.size > k:
        kth = np.partition(-scores, k - 1)[k - 1]
        sel_pool = np.flatnonzero(-scores <= kth)
        sel = sel_pool[np.lexsort((cands[sel_pool], -scores[sel_pool]))[:k]]
    else:
        sel = np.lexsort((cands, -scores))
    return (
        pd.DataFrame({"doc_id_int": cands[sel], "score": scores[sel]}),
        n_total,
        n_decoded,
    )


def score_bucket(
    pdf: pd.DataFrame,
    term_meta: dict[str, tuple[int, float]],
    avgdl: float,
    k: int,
) -> pd.DataFrame:
    """Score one range bucket's blocks. term_meta: term -> (term_idx, idf).

    Exact top-k within the bucket with MaxScore-style block skipping:
    process terms in descending upper bound; once the running certified
    threshold θ exceeds the sum of remaining terms' upper bounds, the
    remaining terms can only re-rank docs already seen, so their blocks
    whose doc range misses all current candidates are skipped.
    """
    if pdf.empty:
        return pd.DataFrame({"doc_id_int": [], "score": []}).astype(
            {"doc_id_int": "int64", "score": "float64"}
        )

    # decode per term: map term -> (docs, impacts) arrays
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term, grp in pdf.groupby("term", sort=False):
        docs_parts, imp_parts = [], []
        for payload in grp.sort_values("first_doc")["payload"]:
            d, tf, dl, _ = codec.unpack_postings(bytes(payload))
            tf_f = tf.astype(np.float64)
            denom = tf_f + K1 * ((1.0 - B) + (B * dl.astype(np.float64)) / avgdl)
            imp_parts.append(tf_f * (K1 + 1.0) / denom)
            docs_parts.append(d)
        per_term[term] = (np.concatenate(docs_parts), np.concatenate(imp_parts))

    # accumulate in ascending term_idx order (determinism contract);
    # a term occurring twice in the query is scored once per occurrence
    # (`query_processing_engine.py:141-170` keeps duplicates)
    items = sorted(
        (idx, t, idf)
        for t in per_term
        for (idx, idf) in term_meta.get(t, [])
    )
    if not items:
        return pd.DataFrame({"doc_id_int": [], "score": []}).astype(
            {"doc_id_int": "int64", "score": "float64"}
        )
    all_docs = np.unique(np.concatenate([per_term[t][0] for _, t, _ in items]))
    scores = np.zeros(all_docs.size, dtype=np.float64)
    for _, term, idf in items:
        d, imp = per_term[term]
        idxs = np.searchsorted(all_docs, d)
        scores[idxs] += idf * imp
    if all_docs.size > k:
        # exact top-k with (score desc, doc asc) tie-break: select every
        # doc scoring >= the k-th score, then lexsort and cut
        kth = np.partition(-scores, k - 1)[k - 1]
        cand = np.flatnonzero(-scores <= kth)
        order = np.lexsort((all_docs[cand], -scores[cand]))[:k]
        sel = cand[order]
    else:
        order = np.lexsort((all_docs, -scores))
        sel = order
    return pd.DataFrame({"doc_id_int": all_docs[sel], "score": scores[sel]})


_THETA_SEEDS: dict[str, float] = {}  # per-worker-process certified seeds
_THETA_SEEDS_MAX = 10_000


def topk_disjunctive(
    blocks: DataFrame,
    term_meta: dict[str, list[tuple[int, float]]],
    avgdl: float,
    k: int,
    query_key: str | None = None,
    acc_total=None,
    acc_decoded=None,
    n_buckets: int | None = None,
) -> DataFrame:
    """blocks(term, range_bucket, first_doc, payload, ...) filtered to the
    query terms → global (doc_id_int, score) top-k candidates.

    `query_key` enables cross-bucket theta: each worker process keeps the
    best certified k-th score it has produced for that key, so buckets it
    processes later (same job, or a repeat of the query in the session)
    start skipping immediately instead of from theta = -inf. Seeds are
    exact local k-th scores — always valid global lower bounds — so
    results stay bit-identical (asserted by test_wand_pruning).

    `acc_total` / `acc_decoded` (Spark accumulators) report block-level
    pruning effectiveness: blocks decoded vs blocks scanned.

    Caller applies the final orderBy/limit after joining doc_id strings.
    """

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # resolve the LIVE module's seed store: a bare global reference
        # would be re-pickled by value into every task's deserialized
        # closure (fresh dict each task — no cross-task state at all);
        # importing inside the UDF hits the worker process's real module
        # singleton, which persists across tasks and jobs under
        # spark.python.worker.reuse
        from text_indexing_and_retrieval_system_spark.operators import (
            wand as _w,
        )

        seeds = _w._THETA_SEEDS
        seed = seeds.get(query_key, -np.inf) if query_key else -np.inf
        out, n_total, n_decoded = score_bucket_pruned(
            pdf, term_meta, avgdl, k, theta_seed=seed
        )
        if query_key and len(out) >= k:
            kth = float(out["score"].iloc[k - 1])
            if len(seeds) < _THETA_SEEDS_MAX or query_key in seeds:
                seeds[query_key] = max(seeds.get(query_key, -np.inf), kth)
        if acc_total is not None:
            acc_total.add(n_total)
        if acc_decoded is not None:
            acc_decoded.add(n_decoded)
        return out

    return _bucket_grouped(blocks, n_buckets).applyInPandas(run, schema=TOPK_SCHEMA)


# packed winner rows: ONE row per (query, bucket) with the winners as
# raw int64/float64 arrays. At 1k+ queries x dozens of buckets the
# row-per-winner format put ~1M rows through Arrow serialization, the
# driver collect, and the merge lexsort input conversion — a corpus-
# independent tail at every parallelism level; packed it is ~25k rows
# for the same bytes and the merge unpacks with zero-copy frombuffer.
BATCH_TOPK_SCHEMA = "query_id int, doc_ids binary, scores binary"


def _unpack_winner_rows(lpdf: pd.DataFrame) -> tuple[np.ndarray, ...]:
    """Packed winner rows -> flat (qids, docs, scores) numpy arrays."""
    counts = lpdf["doc_ids"].map(len).to_numpy(dtype=np.int64) // 8
    qids = np.repeat(lpdf["query_id"].to_numpy(dtype=np.int64), counts)
    docs = np.frombuffer(b"".join(lpdf["doc_ids"]), dtype=np.int64)
    scores = np.frombuffer(b"".join(lpdf["scores"]), dtype=np.float64)
    return qids, docs, scores


# NOTE (round-5 falsified experiment): a per-process decoded-block cache
# for the batch kernel (payload -> block-relative offsets + impacts,
# misses batch-decoded with first_docs pinned to 0) was implemented and
# interleave-A/B-measured on the 4.85M-turn staged index at 16 cores:
# min 2.05s cached vs 1.75s uncached per 256-query batch — the per-block
# python assembly (dict lookups + 7k-array concatenate) costs more than
# the ONE vectorized codec pass it saves. The vectorized decode stays
# unconditional; scripts/bench_batch_ab.py holds the harness.
def _decode_terms(pdf: pd.DataFrame, avgdl: float, local: bool = False):
    """All of a bucket's blocks -> {term: (sorted doc ids, impacts)} in
    ONE vectorized codec pass (codec.unpack_postings_batch) + one
    vectorized BM25-impact computation over every row — replaces the
    per-block decode loop (~90us/block of numpy setup overhead, which
    dominated the batch kernel at 300k+ blocks per query batch).

    With `local=True` returns (per_term, base) where doc ids are int32
    offsets from `base` — valid whenever the group's doc span fits 31
    bits (one range bucket always does; the merged overflow-slot group
    may not, and falls back to global int64 with base=0). The batch
    scoring path runs entirely in the int32 space: ~half the memory
    traffic on a kernel that is bandwidth-bound, identical scores."""
    want_local = local
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if not len(pdf):
        return (per_term, 0) if want_local else per_term
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    base = 0
    use_local32 = False
    if local:
        base = int(pdf["first_doc"].min())
        if int(pdf["last_doc"].max()) - base < (1 << 31):
            use_local32 = True
        else:
            base = 0  # span too wide (merged overflow group): global mode
    first_docs = (
        pdf["first_doc"].to_numpy(dtype=np.int64) if use_local32 else None
    )
    block_n, docs, tfs, dls = codec.unpack_postings_batch(
        pdf["payload"].to_list(), first_docs=first_docs, base=base
    )
    tf_f = tfs.astype(np.float64)
    imp = (
        tf_f
        * (K1 + 1.0)
        / (tf_f + K1 * ((1.0 - B) + (B * dls.astype(np.float64)) / avgdl))
    )
    terms = pdf["term"].to_numpy()
    block_row_ends = np.cumsum(block_n)
    block_row_starts = block_row_ends - block_n
    term_first_block = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
    bounds = np.r_[term_first_block, len(terms)]
    for i in range(len(term_first_block)):
        b0, b1 = bounds[i], bounds[i + 1]
        r0, r1 = block_row_starts[b0], block_row_ends[b1 - 1]
        per_term[terms[b0]] = (docs[r0:r1], imp[r0:r1])
    return (per_term, base) if want_local else per_term


# process-local per-batch theta store: {batch_key: {qid: kth-best score
# seen so far}}. Buckets hold DISJOINT doc-id ranges, so the kth-best
# score within any already-scored bucket is a lower bound on the global
# kth-best — later buckets in the same worker process can drop emission
# rows below it without affecting the merged top-k (same certified-seed
# argument as _THETA_SEEDS on the wand path). Only the CURRENT batch's
# thetas are kept (replaced when a new batch_key arrives).
_BATCH_THETA: dict[str, dict[int, float]] = {}


def topk_disjunctive_batch(
    blocks: DataFrame,
    queries_meta: dict[int, dict[str, list[tuple[int, float]]]],
    avgdl: float,
    k: int,
    n_buckets: int | None = None,
    batch_key: str | None = None,
) -> DataFrame:
    """Many queries in ONE distributed pass (the reference runs its whole
    200-query benchmark sequentially, `performance_metrics.py:521-559`;
    here the batch shares a single scan + decode of the union of posting
    lists per bucket, and per-query scoring is a numpy loop).

    Returns (query_id, doc_id_int, score) — per-bucket local top-k per
    query; caller does the tiny global merge.

    `queries_meta` may be a plain dict or a pyspark Broadcast of one.
    Pass a Broadcast for big batches: a plain dict is pickled into the
    UDF closure and re-deserialized by EVERY task, while a broadcast
    value is fetched and cached once per executor worker process
    (measured ~0.2 s/task at 8k queries — a pseudo-constant that grew
    with batch size).
    """

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import time as _t

        _t0 = _t.time()
        _c0 = _t.process_time()
        qmetas = (
            queries_meta.value if hasattr(queries_meta, "value") else queries_meta
        )
        empty = pd.DataFrame({"query_id": [], "doc_ids": [], "scores": []}).astype(
            {"query_id": "int32", "doc_ids": "object", "scores": "object"}
        )
        if pdf.empty:
            return empty
        # per-batch emission thetas shared across this worker process's
        # buckets (see _BATCH_THETA): the first bucket a worker scores
        # emits its full local top-k; later buckets drop rows strictly
        # below the best kth score seen — the merged global top-k is
        # bit-identical, with ~60% fewer winner rows through Arrow,
        # collect, and the driver merge (a corpus-independent tail)
        thetas: dict[int, tuple[float, int]] = {}
        if batch_key is not None:
            # live-module store (see topk_disjunctive.run): a bare global
            # would be a per-task copy and never share state
            from text_indexing_and_retrieval_system_spark.operators import (
                wand as _w,
            )

            if batch_key not in _w._BATCH_THETA:
                _w._BATCH_THETA.clear()
                _w._BATCH_THETA[batch_key] = {}
            thetas = _w._BATCH_THETA[batch_key]
        # int32 bucket-local doc space (see _decode_terms): scoring is
        # bandwidth-bound, so halving the doc-array traffic is wall time
        per_term, doc_base = _decode_terms(pdf, avgdl, local=True)
        _t_decode = _t.time() - _t0
        # numpy accumulation + ONE output frame: a pandas DataFrame per
        # query + concat measured ~1s/bucket of pure allocator overhead
        # at 1024 queries. (A bucket-level dense-score-buffer variant
        # with per-term index maps was tried and measured 1.6x SLOWER —
        # scattered writes into a bucket-wide float buffer lose to the
        # per-query contiguous unique+searchsorted arrays.)
        qid_list: list[int] = []
        doc_blobs: list[bytes] = []
        score_blobs: list[bytes] = []
        for qid, term_meta in qmetas.items():
            items = sorted(
                (idx, t, idf)
                for t in per_term
                for (idx, idf) in term_meta.get(t, [])
            )
            if not items:
                continue
            # one-pass accumulation: unique(return_inverse) + bincount
            # replaces T searchsorted passes (T * df_t * log(U) binary
            # searches). Bit-identical to the per-term loop: bincount
            # adds element-by-element in input order, and the concat
            # order below is the same sorted-items order the loop added
            # in, so every doc's partial sums happen in the identical
            # floating-point sequence (scripts/bench_score_accum.py
            # asserts this; 1.2-1.6x on mid/hot-df queries)
            all_docs = np.concatenate([per_term[t][0] for _, t, _ in items])
            all_imps = np.concatenate(
                [idf * per_term[t][1] for _, t, idf in items]
            )
            q_docs, inv = np.unique(all_docs, return_inverse=True)
            scores = np.bincount(inv, weights=all_imps, minlength=q_docs.size)
            if q_docs.size > k:
                kth = np.partition(-scores, k - 1)[k - 1]
                cand = np.flatnonzero(-scores <= kth)
                order = np.lexsort((q_docs[cand], -scores[cand]))[:k]
                sel = cand[order]
            else:
                sel = np.lexsort((q_docs, -scores))
            sel_scores = scores[sel]
            docs_g = q_docs[sel].astype(np.int64) + np.int64(doc_base)
            # theta = full rank key (kth score, kth GLOBAL doc id): with
            # the synthetic corpus's heavy BM25 score ties, a score-only
            # bound keeps whole tie plateaus — the (score desc, doc asc)
            # rank key the merge actually uses cuts them exactly
            own_kth = (
                (float(sel_scores[-1]), int(docs_g[-1]))
                if sel.size == k
                else None
            )
            prior = thetas.get(qid)
            if prior is not None:
                ps, pd_ = prior
                # drop rows ranking strictly below the certified kth:
                # >=k docs already outrank them, so they cannot reach
                # the global top-k
                keep = (sel_scores > ps) | ((sel_scores == ps) & (docs_g < pd_))
                sel_scores = sel_scores[keep]
                docs_g = docs_g[keep]
            if own_kth is not None and (
                prior is None
                or own_kth[0] > prior[0]
                or (own_kth[0] == prior[0] and own_kth[1] < prior[1])
            ):
                thetas[qid] = own_kth
            if docs_g.size:
                qid_list.append(qid)
                doc_blobs.append(docs_g.tobytes())
                score_blobs.append(sel_scores.tobytes())
        _log = os.environ.get("TIRS_KERNEL_TIMELOG")
        if _log:
            # opt-in per-group diagnostic (scaling-bench skew analysis):
            # one line per kernel group with decode/total split
            with open(_log, "a") as _fh:
                _fh.write(
                    f"{key[0]},{len(pdf)},{_t_decode:.4f},"
                    f"{_t.time() - _t0:.4f},"
                    f"{_t.process_time() - _c0:.4f},{os.getpid()}\n"
                )
        if not qid_list:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.asarray(qid_list, dtype=np.int32),
                "doc_ids": doc_blobs,
                "scores": score_blobs,
            }
        )

    return _bucket_grouped(blocks, n_buckets).applyInPandas(
        run, schema=BATCH_TOPK_SCHEMA
    )


# --------------------------------------------------------------------------
# full boolean trees in the bucket kernel (interactive path)
# --------------------------------------------------------------------------


def normalize_tree(node, norm_fn):
    """Parsed raw node -> token-level tree evaluable inside the kernel:
    ('tok', t) | ('and', a, b) | ('or', a, b) | ('not', a) |
    ('phrase', (t1, .., tn)) | ('empty',). A multi-token TERM becomes the
    implicit AND of its tokens (BooleanPlanner semantics). The result is
    plain nested tuples — picklable into the Arrow kernel closure."""
    kind = node[0]
    if kind == "term":
        toks = norm_fn(node[1])
        if not toks:
            return ("empty",)
        out = ("tok", toks[0])
        for t in toks[1:]:
            out = ("and", out, ("tok", t))
        return out
    if kind in ("and", "or"):
        return (kind, normalize_tree(node[1], norm_fn), normalize_tree(node[2], norm_fn))
    if kind == "not":
        return ("not", normalize_tree(node[1], norm_fn))
    if kind == "phrase":
        toks = tuple(norm_fn(node[1]))
        return ("phrase", toks) if toks else ("empty",)
    raise ValueError(f"unknown node kind: {kind!r}")


def tree_has(tree, kind: str) -> bool:
    if tree[0] == kind:
        return True
    return any(
        isinstance(c, tuple) and tree_has(c, kind) for c in tree[1:]
    )


def _eval_tree(tree, term_docs, universe, phrase_eval):
    """Set evaluation over sorted unique int64 doc arrays."""
    empty = np.empty(0, dtype=np.int64)
    kind = tree[0]
    if kind == "empty":
        return empty
    if kind == "tok":
        return term_docs.get(tree[1], empty)
    if kind == "and":
        return np.intersect1d(
            _eval_tree(tree[1], term_docs, universe, phrase_eval),
            _eval_tree(tree[2], term_docs, universe, phrase_eval),
            assume_unique=True,
        )
    if kind == "or":
        return np.union1d(
            _eval_tree(tree[1], term_docs, universe, phrase_eval),
            _eval_tree(tree[2], term_docs, universe, phrase_eval),
        )
    if kind == "not":
        if universe is None:
            raise ValueError("NOT requires the bucket universe (doclen cogroup)")
        return np.setdiff1d(
            universe,
            _eval_tree(tree[1], term_docs, universe, phrase_eval),
            assume_unique=True,
        )
    if kind == "phrase":
        return phrase_eval(tree[1])
    raise ValueError(f"unknown tree kind: {kind!r}")


def _phrase_eval_factory(pdf: pd.DataFrame, words: tuple[str, ...]):
    """Positional adjacency inside one bucket: decode the phrase words'
    blocks WITH positions (from the separate pos_payload column),
    intersect doc lists, then keep start positions p with p+i present in
    word i's positions."""
    per_word: dict[str, tuple[np.ndarray, list]] = {}
    for term, grp in pdf.groupby("term", sort=False):
        if term not in words:
            continue
        docs_parts, pos_parts = [], []
        for row in grp.sort_values("first_doc").itertuples(index=False):
            d, _tf, _dl, _ = codec.unpack_postings(bytes(row.payload))
            docs_parts.append(d)
            pos_parts.extend(codec.unpack_positions(bytes(row.pos_payload), len(d)))
        per_word[term] = (np.concatenate(docs_parts), pos_parts)

    def enc_positions(w: str, common: np.ndarray) -> np.ndarray:
        """Flatten word w's position lists over the common docs into ONE
        sorted array of (doc_ordinal << 32) | position — adjacency then
        becomes whole-array set intersection instead of a per-doc loop.
        Positions are tiny (token offsets within one turn), so `enc - i`
        can never wrap into the previous doc ordinal's range."""
        d_w, pos_w = per_word[w]
        idx = np.searchsorted(d_w, common)
        lists = [pos_w[int(j)] for j in idx]
        lens = np.fromiter((len(p) for p in lists), dtype=np.int64, count=len(lists))
        if not lens.sum():
            return np.empty(0, dtype=np.int64)
        flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in lists if len(p)])
        ords = np.repeat(np.arange(len(common), dtype=np.int64), lens)
        return (ords << 32) | flat

    def ev(ws: tuple[str, ...]) -> np.ndarray:
        if any(w not in per_word for w in ws):
            return np.empty(0, dtype=np.int64)
        common = per_word[ws[0]][0]
        for w in ws[1:]:
            common = np.intersect1d(common, per_word[w][0], assume_unique=True)
        if common.size == 0 or len(ws) == 1:
            return common
        # vectorized adjacency (round-2 verdict wrong-#2: the old per-doc
        # python loop degraded on hot phrases over big candidate sets):
        # a start position p survives word i iff p + i is among word i's
        # positions in the same doc, i.e. enc(p) ∈ enc(word_i) - i
        starts = enc_positions(ws[0], common)
        for i, w in enumerate(ws[1:], start=1):
            if starts.size == 0:
                break
            starts = np.intersect1d(
                starts, enc_positions(w, common) - i, assume_unique=True
            )
        return common[np.unique(starts >> 32)]

    return ev


def _score_candidates_np(
    cands: np.ndarray,
    per_term: dict[str, tuple[np.ndarray, np.ndarray]],
    term_meta: dict[str, list[tuple[int, float]]],
    k: int,
) -> pd.DataFrame:
    """BM25 over a fixed candidate array, contributions accumulated in
    term-occurrence order (bit-identical to the DataFrame path / oracle);
    candidates matching no scoring term keep 0.0."""
    if cands.size == 0:
        return _empty_topk()
    scores = np.zeros(cands.size, dtype=np.float64)
    occs = sorted(
        (idx, t, idf) for t in per_term for (idx, idf) in term_meta.get(t, [])
    )
    for _, term, idf in occs:
        d, imp = per_term[term]
        idx = np.searchsorted(cands, d)
        valid = (idx < cands.size) & (cands[np.minimum(idx, cands.size - 1)] == d)
        scores[idx[valid]] += idf * imp[valid]
    if cands.size > k:
        kth = np.partition(-scores, k - 1)[k - 1]
        pool = np.flatnonzero(-scores <= kth)
        sel = pool[np.lexsort((cands[pool], -scores[pool]))[:k]]
    else:
        sel = np.lexsort((cands, -scores))
    return pd.DataFrame({"doc_id_int": cands[sel], "score": scores[sel]})


def boolean_score_bucket(
    pdf: pd.DataFrame,
    tree,
    term_meta: dict[str, list[tuple[int, float]]],
    avgdl: float,
    k: int,
    universe=None,
) -> pd.DataFrame:
    """One range bucket of blocks -> boolean/phrase-filtered BM25 local
    top-k. The shared per-bucket kernel body: the distributed
    boolean_topk applies it inside applyInPandas; the engine's
    driver-local interactive path calls it in-process over cached block
    frames. `universe` (sorted int64 doc ids of the bucket) is required
    when the tree contains NOT."""
    per_term = _decode_terms(pdf, avgdl) if len(pdf) else {}
    term_docs = {t: d for t, (d, _) in per_term.items()}
    # positions decode only happens if/when a phrase subtree is hit
    phrase_eval = lambda ws: _phrase_eval_factory(pdf, ws)(ws)  # noqa: E731
    cands = _eval_tree(tree, term_docs, universe, phrase_eval)
    return _score_candidates_np(cands, per_term, term_meta, k)


def boolean_topk(
    blocks: DataFrame,
    tree,
    term_meta: dict[str, list[tuple[int, float]]],
    avgdl: float,
    k: int,
    doclen: DataFrame | None = None,
    range_shift: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Arbitrary boolean/phrase query + BM25 ranking in ONE kernel pass —
    the interactive successor of the DataFrame join plan (same results,
    bit-identical scores, ~4 Catalyst stages fewer). Per range bucket:
    decode -> set-evaluate the tree -> score candidates -> local top-k;
    the caller merges the tiny per-bucket winners.

    NOT needs the complement universe, so when the tree contains one the
    blocks are COGROUPed with the doclen table (bucketed by the same
    doc-id range shift) — this also covers buckets where the query's
    tokens have no blocks at all but whose docs still match the
    complement."""
    needs_universe = tree_has(tree, "not")

    def run_one(pdf: pd.DataFrame, universe) -> pd.DataFrame:
        return boolean_score_bucket(pdf, tree, term_meta, avgdl, k, universe)

    if needs_universe:
        if doclen is None or range_shift is None:
            raise ValueError("NOT queries need doclen + range_shift")
        dl_b = doclen.select(
            F.shiftrightunsigned("doc_id_int", range_shift)
            .cast("int")
            .alias("range_bucket"),
            "doc_id_int",
        )

        def run_co(key, blocks_pdf: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
            universe = np.sort(dl_pdf["doc_id_int"].to_numpy(dtype=np.int64))
            return run_one(blocks_pdf, universe)

        return (
            _bucket_grouped(blocks, n_buckets)
            .cogroup(_dl_grouped(dl_b, n_buckets))
            .applyInPandas(run_co, schema=TOPK_SCHEMA)
        )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return run_one(pdf, None)

    return _bucket_grouped(blocks, n_buckets).applyInPandas(run, schema=TOPK_SCHEMA)


def merge_query_topk_driver(
    lpdf: pd.DataFrame, k: int
) -> dict[int, list[tuple[int, float]]]:
    """Driver-side vectorized merge of the per-(query, bucket) winners.

    Two stages, both exact: (1) a per-query k-th-largest-score threshold
    (padded 2D np.partition over the row-level blobs) prunes the winner
    pool to rows with score >= tau — a provable superset of the top-k,
    since any row ranked <= k under (score desc, doc asc) has score >=
    the query's k-th largest score; (2) the (doc, -score, qid) lexsort +
    group cut runs on the ~buckets-times-smaller candidate set. At 1024
    queries x 24 buckets x k=50 (1.04M winners) this is 0.31 -> 0.09 s
    of driver tail per batch — a flat constant that was capping the
    N-vs-4N query scaling pair. The distributed merge_query_topk is the
    large-cluster path."""
    if lpdf.empty:
        return {}
    counts = lpdf["doc_ids"].map(len).to_numpy(dtype=np.int64) // 8
    qids_row = lpdf["query_id"].to_numpy(dtype=np.int64)
    docs = np.frombuffer(b"".join(lpdf["doc_ids"]), dtype=np.int64)
    scores = np.frombuffer(b"".join(lpdf["scores"]), dtype=np.float64)
    qids = np.repeat(qids_row, counts)
    uq, qrow = np.unique(qids_row, return_inverse=True)
    totals = np.bincount(qrow, weights=counts).astype(np.int64)
    width = int(totals.max()) if totals.size else 0
    if width > k:
        # column start of each row-blob = prefix sum of counts within
        # its query (rows arrive bucket-interleaved, so group first)
        order_rows = np.argsort(qrow, kind="stable")
        c_sorted = counts[order_rows]
        q_sorted = qrow[order_rows]
        cs = np.cumsum(c_sorted) - c_sorted
        grp_first = np.flatnonzero(np.r_[True, q_sorted[1:] != q_sorted[:-1]])
        run_len = np.diff(np.r_[grp_first, q_sorted.size])
        cstart = np.empty(counts.size, dtype=np.int64)
        cstart[order_rows] = cs - np.repeat(cs[grp_first], run_len)
        row_start = np.cumsum(counts) - counts
        el_col = np.repeat(cstart - row_start, counts) + np.arange(qids.size)
        el_qrow = np.repeat(qrow, counts)
        S = np.full((uq.size, width), -np.inf)
        S[el_qrow, el_col] = scores
        tau = -np.partition(-S, k - 1, axis=1)[:, k - 1]
        keep = scores >= tau[el_qrow]
        qids, docs, scores = qids[keep], docs[keep], scores[keep]
    order = np.lexsort((docs, -scores, qids))  # by query, score desc, doc asc
    qids, docs, scores = qids[order], docs[order], scores[order]
    out: dict[int, list[tuple[int, float]]] = {}
    starts = np.flatnonzero(np.r_[True, qids[1:] != qids[:-1]])
    ends = np.r_[starts[1:], qids.size]
    for s, e in zip(starts, ends):
        e = min(e, s + k)
        out[int(qids[s])] = list(zip(docs[s:e].tolist(), scores[s:e].tolist()))
    return out


def merge_query_topk(local: DataFrame, k: int) -> DataFrame:
    """Merge per-(query, bucket) winners to a global per-query top-k
    inside Spark (one small shuffle on query_id) so the driver collects
    only k rows per query. One vectorized pandas pass per PARTITION —
    not per query group (applyInPandas with thousands of tiny groups
    pays a pandas round trip each)."""

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            qids, docs, scores = _unpack_winner_rows(pdf)
            order = np.lexsort((docs, -scores, qids))
            qids, docs, scores = qids[order], docs[order], scores[order]
            starts = np.flatnonzero(np.r_[True, qids[1:] != qids[:-1]])
            ends = np.r_[starts[1:], qids.size]
            out_q, out_d, out_s = [], [], []
            for s, e in zip(starts, ends):
                e = min(e, s + k)
                out_q.append(int(qids[s]))
                out_d.append(docs[s:e].tobytes())
                out_s.append(scores[s:e].tobytes())
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_q, dtype=np.int32),
                    "doc_ids": out_d,
                    "scores": out_s,
                }
            )

    return local.repartition(KERNEL_SHUFFLE_PARTITIONS, "query_id").mapInPandas(
        run, schema=BATCH_TOPK_SCHEMA
    )

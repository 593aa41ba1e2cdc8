"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — fully JVM-side via zip_with +
aggregate (no UDF, stays in codegen). Scale path: LSH random-hyperplane
bucketing — deterministic seeded hyperplanes, candidates restricted to
same-bucket vectors, re-scored exactly; at 100 TB the bucket join
replaces the broadcast cross-product.

Embedding near-dup pairs (for dedup pipelines): all pairs with cosine >=
threshold via the same machinery.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, round_to: int = 4
) -> DataFrame:
    """Top-k nearest to the vector with id `query_vec_id` (excluded from
    results). Query vector is a one-row broadcast — the scan stays a
    single pass over the embeddings table."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    joined = embeddings.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_emb"))
    )
    return (
        joined.select("vec_id", F.round(cos, round_to).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def sql_cosine_topk(query_vec_id: int, k: int = 10, round_to: int = 4) -> str:
    return f"""
with q as (select embedding as q_emb from embeddings where vec_id = {query_vec_id}),
ex as (select vec_id, unnest(embedding)::double as x,
              generate_subscripts(embedding, 1) as i
       from embeddings where vec_id != {query_vec_id}),
qx as (select unnest(q_emb)::double as qx, generate_subscripts(q_emb, 1) as i from q),
qn as (select sqrt(sum(qx * qx)) as qnorm from qx)
select ex.vec_id,
       round(sum(ex.x * qx.qx) / (sqrt(sum(ex.x * ex.x)) * any_value(qn.qnorm)),
             {round_to}) as cosine
from ex join qx using (i), qn
group by ex.vec_id
order by cosine desc, ex.vec_id asc limit {k}
"""


def _gemm_pair_scorer(threshold: float, round_to: int):
    """mapInPandas kernel over block-pair rows (vs_a, vs_b, same_blk):
    dense numpy GEMM per pair, emit (vec_a, vec_b, cosine >= threshold).
    For same-block pairs each unordered pair appears twice in the matrix,
    so only the id-upper-triangle is kept."""
    import pandas as pd

    def score(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ids_a = np.array([r["vec_id"] for r in row["vs_a"]], dtype=np.int64)
                mat_a = np.array(
                    [r["embedding"] for r in row["vs_a"]], dtype=np.float64
                )
                ids_b = np.array([r["vec_id"] for r in row["vs_b"]], dtype=np.int64)
                mat_b = np.array(
                    [r["embedding"] for r in row["vs_b"]], dtype=np.float64
                )
                na = np.sqrt((mat_a * mat_a).sum(axis=1))
                nb = np.sqrt((mat_b * mat_b).sum(axis=1))
                cos = (mat_a @ mat_b.T) / np.outer(na, nb)
                cos = np.round(cos, round_to)
                keep = cos >= threshold
                if row["same_blk"]:
                    keep &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(keep)
                if ii.size:
                    a_ids, b_ids = ids_a[ii], ids_b[jj]
                    outs.append(
                        pd.DataFrame(
                            {
                                "vec_a": np.minimum(a_ids, b_ids),
                                "vec_b": np.maximum(a_ids, b_ids),
                                "cosine": cos[ii, jj],
                            }
                        )
                    )
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame({"vec_a": [], "vec_b": []}).assign(cosine=[]).astype(
                    {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
                )
            )

    return score


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    round_to: int = 4,
    n_blocks: int = 8,
) -> DataFrame:
    """(vec_a, vec_b, cosine >= threshold) — exact all-pairs via blocked
    numpy GEMM: vectors are hash-partitioned into n_blocks groups, the
    n_blocks^2/2 group pairs are scored as dense matrix products inside
    one mapInPandas pass (a row-at-a-time higher-order-function cross
    join is ~100x slower).

    This is the SMALL-N VERIFIER: it materializes the whole table into
    n_blocks collect_list rows and scores O(n^2/2) pairs. The default
    scale path is `embedding_neardup_lsh`, which restricts the GEMM to
    same-LSH-bucket candidates with bounded per-group size."""
    e = embeddings.groupBy(
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).alias("blk")
    ).agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("vs")
    )
    pairs = (
        e.select(F.col("blk").alias("blk_a"), F.col("vs").alias("vs_a"))
        .crossJoin(
            e.select(F.col("blk").alias("blk_b"), F.col("vs").alias("vs_b"))
        )
        .filter(F.col("blk_a") <= F.col("blk_b"))
        .withColumn("same_blk", F.col("blk_a") == F.col("blk_b"))
    )
    return pairs.mapInPandas(
        _gemm_pair_scorer(threshold, round_to),
        schema="vec_a long, vec_b long, cosine double",
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    round_to: int = 4,
    n_planes: int = 16,
    seed: int = 13,
    max_block: int = 4096,
) -> DataFrame:
    """LSH-gated near-dup pairs — the 100 TB default path.

    Pipeline: sign-of-projection buckets (deterministic literal
    hyperplanes) -> per-bucket blocked GEMM. Only same-bucket pairs are
    scored, so compute is O(sum over buckets of |bucket|^2), not O(n^2),
    and the only wide operations are one bucket groupBy and one
    same-bucket join. Executor memory is bounded: each bucket is
    salt-split into ceil(|bucket| / max_block) sub-blocks (hot/boilerplate
    buckets split into many), so no collect_list group exceeds max_block
    vectors. Recall = LSH bucket recall (pairs split across buckets are
    missed — that IS the operator's contract; `embedding_neardup_pairs`
    is the exact verifier at small n)."""
    b = lsh_buckets(embeddings, dim, n_planes, seed)
    e = embeddings.join(b, "vec_id")
    sizes = e.groupBy("bucket").agg(F.count("*").alias("__bsz"))
    e = e.join(F.broadcast(sizes), "bucket").withColumn(
        "nsub", F.ceil(F.col("__bsz") / F.lit(max_block)).cast("int")
    )
    g = (
        e.withColumn("blk", F.pmod(F.col("vec_id"), F.col("nsub")))
        .groupBy("bucket", "blk")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("vs"))
    )
    pairs = (
        g.select("bucket", F.col("blk").alias("blk_a"), F.col("vs").alias("vs_a"))
        .join(
            g.select(
                "bucket", F.col("blk").alias("blk_b"), F.col("vs").alias("vs_b")
            ),
            "bucket",
        )
        .filter(F.col("blk_a") <= F.col("blk_b"))
        .withColumn("same_blk", F.col("blk_a") == F.col("blk_b"))
    )
    return pairs.mapInPandas(
        _gemm_pair_scorer(threshold, round_to),
        schema="vec_a long, vec_b long, cosine double",
    )


def sql_embedding_neardup_pairs(threshold: float = 0.9, round_to: int = 4) -> str:
    return f"""
with ex as (select vec_id, unnest(embedding)::double as x,
                   generate_subscripts(embedding, 1) as i from embeddings),
nrm as (select vec_id, sqrt(sum(x * x)) as nn from ex group by vec_id),
dots as (select a.vec_id as vec_a, b.vec_id as vec_b, sum(a.x * b.x) as d
         from ex a join ex b on a.i = b.i and a.vec_id < b.vec_id
         group by a.vec_id, b.vec_id)
select vec_a, vec_b, round(d / (na.nn * nb.nn), {round_to}) as cosine
from dots join nrm na on vec_a = na.vec_id join nrm nb on vec_b = nb.vec_id
where round(d / (na.nn * nb.nn), {round_to}) >= {threshold}
"""


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _sql_planes_values(dim: int, n_planes: int, seed: int) -> str:
    """The seeded hyperplanes as a SQL VALUES literal (p, i, w) — i is
    1-based to match generate_subscripts. repr() round-trips the float64
    exactly, so the oracle sees bit-identical plane weights."""
    pl = hyperplanes(dim, n_planes, seed)
    return ", ".join(
        f"({p}, {i + 1}, {float(pl[p, i])!r})"
        for p in range(n_planes)
        for i in range(dim)
    )


def _sql_buckets_cte(dim: int, n_planes: int, seed: int) -> str:
    """CTE chain computing the same sign-of-projection buckets as
    `lsh_buckets`. `sum(x * w ORDER BY i)` forces sequential accumulation
    in array order — the exact fold `_dot` performs — so projection signs
    (hence buckets) match Spark bit-for-bit."""
    return f"""
planes(p, i, w) as (values {_sql_planes_values(dim, n_planes, seed)}),
exb as (select vec_id, unnest(embedding)::double as x,
               generate_subscripts(embedding, 1) as i from embeddings),
proj as (select vec_id, p, sum(x * w order by i) as pr
         from exb join planes using (i) group by vec_id, p),
buckets as (select vec_id,
                   sum(case when pr > 0 then (1::bigint << p) else 0 end)::bigint as bucket
            from proj group by vec_id)"""


def sql_ann_topk_lsh(
    query_vec_id: int,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    round_to: int = 4,
    multiprobe: int = 0,
) -> str:
    probe = "b.bucket = qb.bucket"
    if multiprobe >= 1:
        probe = "(" + " or ".join(
            ["b.bucket = qb.bucket"]
            + [f"b.bucket = xor(qb.bucket, {1 << p})" for p in range(n_planes)]
        ) + ")"
    return f"""
with {_sql_buckets_cte(dim, n_planes, seed)},
qb as (select bucket from buckets where vec_id = {query_vec_id}),
cand as (select b.vec_id from buckets b, qb
         where {probe} and b.vec_id != {query_vec_id}),
q as (select embedding as q_emb from embeddings where vec_id = {query_vec_id}),
ex as (select vec_id, x, i from exb
       where vec_id in (select vec_id from cand)),
qx as (select unnest(q_emb)::double as qx, generate_subscripts(q_emb, 1) as i from q),
qn as (select sqrt(sum(qx * qx)) as qnorm from qx)
select ex.vec_id,
       round(sum(ex.x * qx.qx) / (sqrt(sum(ex.x * ex.x)) * any_value(qn.qnorm)),
             {round_to}) as cosine
from ex join qx using (i), qn
group by ex.vec_id
order by cosine desc, ex.vec_id asc limit {k}
"""


def sql_embedding_neardup_lsh(
    dim: int,
    threshold: float = 0.9,
    round_to: int = 4,
    n_planes: int = 16,
    seed: int = 13,
) -> str:
    return f"""
with {_sql_buckets_cte(dim, n_planes, seed)},
nrm as (select vec_id, sqrt(sum(x * x)) as nn from exb group by vec_id),
dots as (select a.vec_id as vec_a, b.vec_id as vec_b, sum(a.x * b.x) as d
         from exb a join exb b on a.i = b.i and a.vec_id < b.vec_id
         join buckets ba on a.vec_id = ba.vec_id
         join buckets bb on b.vec_id = bb.vec_id and ba.bucket = bb.bucket
         group by a.vec_id, b.vec_id)
select vec_a, vec_b, round(d / (na.nn * nb.nn), {round_to}) as cosine
from dots join nrm na on vec_a = na.vec_id join nrm nb on vec_b = nb.vec_id
where round(d / (na.nn * nb.nn), {round_to}) >= {threshold}
"""


def lsh_buckets(
    embeddings: DataFrame, dim: int, n_planes: int = 16, seed: int = 13
) -> DataFrame:
    """(vec_id, bucket): sign-of-projection bucket per vector. Planes are
    literal columns (deterministic, no broadcast variable needed)."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p_idx in range(n_planes):
        plane = F.array([F.lit(float(v)) for v in planes[p_idx]])
        proj = _dot(F.col("embedding"), plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p_idx).cast("long")).otherwise(0)
    return embeddings.select("vec_id", bucket.alias("bucket"))


# --------------------------------------------------------------------------
# IVF-flat ANN: the cluster-pruned scale path.
#
# Coarse quantizer: the embeddings of the first `nlist` vectors with
# vec_id % stride == 0 (deterministic data-sampled centroids — the
# k-means-init-style coarse quantizer, chosen so a SQL oracle can
# reselect the exact same centroids from the table). Every vector is
# assigned to its max-cosine centroid; a query probes its `nprobe`
# nearest centroids and scores exact cosine inside them only.
#
# 100-TB design: assignment is a single NARROW map over the table (the
# centroid set rides along as literal columns below, or as a broadcast
# numpy matrix inside a pandas UDF once nlist reaches ~10^4);
# `build_ivf_store` then materializes the inverted file as a
# cid-partitioned table, so a query's candidate read is a
# partition-PRUNED scan of ~nprobe/nlist of the corpus — the IVF list
# structure expressed as storage partitioning instead of a filter.
# --------------------------------------------------------------------------


def ivf_centroids(
    embeddings: DataFrame, nlist: int = 16, stride: int = 31
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer, collected to the driver (nlist
    rows — the faiss-style 'train once, tiny model' artifact)."""
    rows = (
        embeddings.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(nlist)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


def _centroid_cos_exprs(cents: list[tuple[int, list[float]]]) -> list[tuple[int, str]]:
    """[(cid, cosine SQL expression string)] against a bound `__vnorm`
    column.

    Everything per-centroid is ONE SQL string, composed into a single
    F.expr by the callers — building the same tree from F.lit / HOF
    lambda Columns costs a py4j round trip per node (nlist x dim
    literals + 5 lambdas per centroid ≈ 2 s of pure driver time per
    call site at nlist=16, dim=64; the round-3 bucket-slot-map lesson).
    repr() emits the shortest round-trip decimal and the `D` suffix
    parses it straight to a double (no DecimalType detour), so the
    literals are bit-identical to F.lit's.

    The centroid norm is pre-folded HERE in Python — sequential
    double adds in array order then one IEEE sqrt — which is the exact
    fold both Spark's `aggregate` and the oracle's `sum(w*w ORDER BY
    i)` perform, so unrounded assignment cosines stay bit-identical
    across all three engines (the LSH-bucket precedent)."""
    import math

    out = []
    for cid, emb in cents:
        arr = "array(" + ",".join(f"{float(v)!r}D" for v in emb) + ")"
        acc = 0.0
        for v in emb:
            acc += float(v) * float(v)
        cnorm = math.sqrt(acc)
        cos = (
            f"aggregate(zip_with(embedding, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
            f" / (__vnorm * {cnorm!r}D)"
        )
        out.append((cid, cos))
    return out


def ivf_assign(
    embeddings: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, cid): nearest-centroid assignment with NO shuffle — an
    array_max over per-centroid cosine structs, entirely JVM-side.
    Ties break to the smallest cid (struct carries -cid so the struct
    max picks it)."""
    df = embeddings.withColumn("__vnorm", _norm(F.col("embedding")))
    pairs = _centroid_cos_exprs(cents)
    structs = ",".join(
        f"struct({cos} AS cos, CAST({-cid} AS INT) AS ncid)" for cid, cos in pairs
    )
    best = F.expr(f"array_max(array({structs}))")
    return df.select("vec_id", (-best["ncid"]).alias("cid"))


def ivf_query_probes(
    embeddings: DataFrame,
    query_vec_id: int,
    cents: list[tuple[int, list[float]]],
    nprobe: int,
) -> DataFrame:
    """One row, one column `probe_cids`: the query's nprobe nearest
    centroid ids (cos desc, cid asc — sorted as struct(-cos, cid) asc,
    exact for IEEE orderings without NaN)."""
    df = embeddings.filter(F.col("vec_id") == query_vec_id).withColumn(
        "__vnorm", _norm(F.col("embedding"))
    )
    pairs = _centroid_cos_exprs(cents)
    structs = ",".join(
        f"struct(-({cos}) AS negcos, CAST({cid} AS INT) AS cid)"
        for cid, cos in pairs
    )
    probes = F.expr(
        f"transform(slice(array_sort(array({structs})), 1, {int(nprobe)}), s -> s.cid)"
    )
    return df.select(probes.alias("probe_cids"))


def ann_topk_ivf(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nlist: int = 16,
    stride: int = 31,
    nprobe: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: exact cosine restricted to the
    query's nprobe nearest clusters. nprobe == nlist degenerates to
    exact brute force (asserted in tests/test_ann_ivf.py)."""
    cents = ivf_centroids(embeddings, nlist, stride)
    assigned = ivf_assign(embeddings, cents)
    probes = ivf_query_probes(embeddings, query_vec_id, cents, nprobe)
    cands = (
        assigned.crossJoin(F.broadcast(probes))
        .filter(
            F.array_contains(F.col("probe_cids"), F.col("cid"))
            & (F.col("vec_id") != query_vec_id)
        )
        .select("vec_id")
    )
    # no distinct on the candidate ids: `assigned` is one row per
    # vec_id by construction and left_semi is set-semantics anyway, so
    # deduping here would be a full extra shuffle of the candidate set
    # for nothing (at 10^9 vectors, the most expensive no-op in the plan)
    pool = embeddings.join(
        cands.union(
            embeddings.filter(F.col("vec_id") == query_vec_id).select("vec_id")
        ),
        "vec_id",
        "left_semi",
    )
    return cosine_topk(pool, query_vec_id, k, round_to)


def build_ivf_store(
    embeddings: DataFrame, cents: list[tuple[int, list[float]]], path: str
) -> None:
    """Materialize the inverted file: embeddings written partitioned by
    centroid id. This is the at-scale artifact — candidate reads become
    partition-pruned scans (PartitionFilters on cid, asserted in
    tests/test_ann_ivf.py), touching ~nprobe/nlist of the bytes."""
    ivf_assign(embeddings, cents).join(embeddings, "vec_id").write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(path)


def ann_topk_ivf_store(
    spark,
    path: str,
    embeddings: DataFrame,
    query_vec_id: int,
    cents: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Query the materialized inverted file: identical results to the
    in-plan `ann_topk_ivf`, but the candidate scan reads only the probed
    cid partitions."""
    probe_cids = [
        int(c)
        for c in ivf_query_probes(embeddings, query_vec_id, cents, nprobe).collect()[
            0
        ]["probe_cids"]
    ]
    pool = (
        spark.read.parquet(path)
        .filter(F.col("cid").isin(probe_cids) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", "embedding")
        .union(
            embeddings.filter(F.col("vec_id") == query_vec_id).select(
                "vec_id", "embedding"
            )
        )
    )
    return cosine_topk(pool, query_vec_id, k, round_to)


def sql_ann_topk_ivf(
    query_vec_id: int,
    k: int = 10,
    nlist: int = 16,
    stride: int = 31,
    nprobe: int = 3,
    round_to: int = 4,
) -> str:
    """DuckDB twin of ann_topk_ivf. Assignment cosines use
    `sum(... ORDER BY i)` sequential accumulation to mirror Spark's
    fold exactly; the final reported cosine reuses the cosine_topk
    oracle shape."""
    return f"""
with cent as (select vec_id as cid, embedding as cemb from embeddings
              where vec_id % {stride} = 0 order by vec_id limit {nlist}),
cx as (select cid, unnest(cemb)::double as w,
              generate_subscripts(cemb, 1) as i from cent),
cn as (select cid, sqrt(sum(w * w order by i)) as cnorm from cx group by cid),
exb as (select vec_id, unnest(embedding)::double as x,
               generate_subscripts(embedding, 1) as i from embeddings),
vn as (select vec_id, sqrt(sum(x * x order by i)) as vnorm from exb group by vec_id),
cc as (select e.vec_id, c.cid, sum(e.x * c.w order by e.i) as d
       from exb e join cx c using (i) group by e.vec_id, c.cid),
ccn as (select cc.vec_id, cc.cid, cc.d / (vn.vnorm * cn.cnorm) as cos
        from cc join vn on cc.vec_id = vn.vec_id join cn on cc.cid = cn.cid),
assign as (select vec_id, cid from (
             select vec_id, cid,
                    row_number() over (partition by vec_id
                                       order by cos desc, cid asc) as rn
             from ccn) t where rn = 1),
qprobe as (select cid from ccn where vec_id = {query_vec_id}
           order by cos desc, cid asc limit {nprobe}),
cand as (select a.vec_id from assign a
         where a.cid in (select cid from qprobe)
           and a.vec_id != {query_vec_id}),
q as (select embedding as q_emb from embeddings where vec_id = {query_vec_id}),
ex as (select vec_id, x, i from exb
       where vec_id in (select vec_id from cand)),
qx as (select unnest(q_emb)::double as qx,
              generate_subscripts(q_emb, 1) as i from q),
qn as (select sqrt(sum(qx * qx)) as qnorm from qx)
select ex.vec_id,
       round(sum(ex.x * qx.qx) / (sqrt(sum(ex.x * ex.x)) * any_value(qn.qnorm)),
             {round_to}) as cosine
from ex join qx using (i), qn
group by ex.vec_id
order by cosine desc, ex.vec_id asc limit {k}
"""


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    round_to: int = 4,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: exact cosine, restricted to the query's LSH
    bucket — the scale path for 10^12 vectors. `multiprobe=1` also probes
    the n_planes buckets at Hamming distance 1 from the query's (one sign
    bit flipped): the standard recall lever, costing n_planes+1 bucket
    lookups instead of 1 while still touching a ~2^-(n_planes-log2(n+1))
    fraction of the corpus. Recall is measured against brute force in
    tests/test_ann_recall.py."""
    buckets = lsh_buckets(embeddings, dim, n_planes, seed)
    qb = buckets.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    allowed = F.col("bucket") == F.col("qbucket")
    if multiprobe >= 1:
        for p in range(n_planes):
            allowed = allowed | (
                F.col("bucket") == F.col("qbucket").bitwiseXOR(F.lit(1 << p))
            )
    cands = (
        buckets.crossJoin(F.broadcast(qb))
        .filter(allowed & (F.col("vec_id") != query_vec_id))
        .select("vec_id")
    )
    return cosine_topk(
        embeddings.join(cands.union(
            embeddings.filter(F.col("vec_id") == query_vec_id).select("vec_id")
        ).distinct(), "vec_id", "left_semi"),
        query_vec_id,
        k,
        round_to,
    )

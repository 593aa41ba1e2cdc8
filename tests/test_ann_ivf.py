"""IVF-flat ANN: exactness at full probe, store-path identity with
partition pruning, candidate containment, and recall at nprobe=3.

The corpus is the deterministic driver testdata (sf0.01 embeddings,
500 x 64d), so every value here is an exact constant. Reference
parity: the reference has no vector search at all — this operator
family is part of the LLM-data-pipeline surface the engine adds
(brute cosine baseline + LSH + IVF as the cluster-pruned scale path).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_indexing_and_retrieval_system_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"
NLIST, STRIDE, K = 16, 31, 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(emb):
    c = similarity.ivf_centroids(emb, nlist=NLIST, stride=STRIDE)
    assert [cid for cid, _ in c] == [i * STRIDE for i in range(NLIST)]
    return c


def test_full_probe_equals_brute_force(emb):
    """nprobe == nlist degenerates IVF to exact brute force."""
    full = similarity.ann_topk_ivf(
        emb, 0, k=K, nlist=NLIST, stride=STRIDE, nprobe=NLIST
    ).toPandas()
    brute = similarity.cosine_topk(emb, 0, k=K).toPandas()
    assert full.equals(brute)


def test_assignment_is_total_and_candidates_contained(emb, cents):
    assigned = similarity.ivf_assign(emb, cents).toPandas()
    assert len(assigned) == emb.count()  # every vector lands in a cluster
    assert assigned["cid"].isin([cid for cid, _ in cents]).all()
    probes = similarity.ivf_query_probes(emb, 0, cents, nprobe=3).collect()[0][
        "probe_cids"
    ]
    assert len(probes) == 3
    got = similarity.ann_topk_ivf(
        emb, 0, k=K, nlist=NLIST, stride=STRIDE, nprobe=3
    ).toPandas()
    cid_of = dict(zip(assigned["vec_id"], assigned["cid"]))
    assert all(cid_of[v] in list(probes) for v in got["vec_id"])


def test_store_path_identical_and_partition_pruned(spark, emb, cents, tmp_path):
    path = str(tmp_path / "ivf_store")
    similarity.build_ivf_store(emb, cents, path)
    in_plan = similarity.ann_topk_ivf(
        emb, 0, k=K, nlist=NLIST, stride=STRIDE, nprobe=3
    ).toPandas()
    from_store = similarity.ann_topk_ivf_store(
        spark, path, emb, 0, cents, k=K, nprobe=3
    ).toPandas()
    assert from_store.equals(in_plan)
    # the probed read must be partition-pruned, not a full-scan filter
    probes = similarity.ivf_query_probes(emb, 0, cents, nprobe=3).collect()[0][
        "probe_cids"
    ]
    plan = (
        spark.read.parquet(path)
        .filter(F.col("cid").isin([int(c) for c in probes]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:200]


def test_recall_at_nprobe3(spark, emb):
    """Exact-constant recall on the deterministic corpus: probing 3/16
    clusters must recover at least half of the true top-10 (measured
    value asserted loosely so a testdata regen doesn't flake it)."""
    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
    recalls = []
    for qid in (0, 7, 13):
        q = mat[list(ids).index(qid)]
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        mask = ids != qid
        order = np.lexsort((ids[mask], -np.round(cos[mask], 4)))
        truth = set(ids[mask][order][:K])
        got = {
            r["vec_id"]
            for r in similarity.ann_topk_ivf(
                emb, qid, k=K, nlist=NLIST, stride=STRIDE, nprobe=3
            ).collect()
        }
        recalls.append(len(got & truth) / K)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_driver_probe_fold_matches_inplan_expression(emb, cents):
    """Round-6: ann_topk_ivf folds the probe selection on the driver
    (`ivf_probe_cids`, sequential IEEE fold). It must reproduce the
    in-plan SQL-expression probes (`ivf_query_probes`) bit-exactly —
    for every nprobe and for several query ids."""
    for qid in (0, 7, 13):
        for nprobe in (1, 3, NLIST):
            drv, q_emb = similarity.ivf_probe_cids(emb, qid, cents, nprobe)
            assert q_emb is not None
            sql = list(
                similarity.ivf_query_probes(emb, qid, cents, nprobe).collect()[0][
                    "probe_cids"
                ]
            )
            assert drv == [int(c) for c in sql], (qid, nprobe, drv, sql)


def test_driver_probe_missing_query(emb, cents):
    probes, q_emb = similarity.ivf_probe_cids(emb, 10**9, cents, 3)
    assert probes == [] and q_emb is None
    out = similarity.ann_topk_ivf(emb, 10**9, k=K, nlist=NLIST, stride=STRIDE)
    assert out.count() == 0 and out.columns == ["vec_id", "cosine"]

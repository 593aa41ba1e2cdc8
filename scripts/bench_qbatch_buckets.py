"""Per-bucket kernel timing for the 1024-query batch (straggler hunt).

Usage: python scripts/bench_qbatch_buckets.py <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "/dev/shm/tirs_phase_stage"


def main(cores: int) -> None:
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from text_indexing_and_retrieval_system_spark import engine, querygen
    from text_indexing_and_retrieval_system_spark.operators import query_parser as qp
    from text_indexing_and_retrieval_system_spark.operators import wand
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )

    spark = get_spark(
        app_name=f"tirs-qbb-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("SCALE_SHUFFLE", 128)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    idx = engine.load(spark, os.path.join(STAGE, "idx"))
    lex = (
        spark.read.parquet(os.path.join(STAGE, "idx", "lexicon"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3000)
        .toPandas()
    )
    pools = querygen.pools_from_frequencies(
        list(zip(lex["term"], lex["df"])),
        querygen.PoolSpec(min_word_freq=3, high=(5, 60), mid=(61, 400), low=(401, 2800)),
    )
    qs = querygen.generate_queries(pools, n_queries=1024, seed=11)
    nodes = [qp.parse(q) for q in dict.fromkeys(qs)]
    metas = {}
    all_tokens = set()
    for qid, node in enumerate(nodes):
        occ, _ = idx._query_tokens(node)
        meta = {}
        lexr = idx.lexicon_for(sorted({t for _, t in occ}))
        idf = dict(zip(lexr["term"], lexr["idf"]))
        for i, t in occ:
            if t in idf:
                meta.setdefault(t, []).append((i, float(idf[t])))
        metas[qid] = meta
        all_tokens.update(meta)
    known = sorted(all_tokens)
    blocks = idx.blocks_for(known)
    avgdl = idx.stats["avgdl"]

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        from text_indexing_and_retrieval_system_spark.operators.wand import (
            _decode_terms,
        )

        per_term = _decode_terms(pdf, avgdl)
        t_decode = time.time() - t0
        t0 = time.time()
        n_out = 0
        for qid, term_meta in metas.items():
            items = sorted(
                (i, t, f) for t in per_term for (i, f) in term_meta.get(t, [])
            )
            if not items:
                continue
            q_docs = np.unique(np.concatenate([per_term[t][0] for _, t, _ in items]))
            scores = np.zeros(q_docs.size)
            for _, term, idf_v in items:
                d, imp = per_term[term]
                scores[np.searchsorted(q_docs, d)] += idf_v * imp
            n_out += min(50, q_docs.size)
        t_score = time.time() - t0
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_blocks": [len(pdf)],
                "payload_mb": [float(pdf["payload"].map(len).sum()) / 1e6],
                "decode_sec": [round(t_decode, 3)],
                "score_sec": [round(t_score, 3)],
            }
        )

    grouped = blocks.repartition(64, "range_bucket").groupBy("range_bucket")
    schema = "bucket int, n_blocks long, payload_mb double, decode_sec double, score_sec double"
    for rep in range(2):
        t0 = time.time()
        out = grouped.applyInPandas(run, schema=schema).toPandas()
        wall = time.time() - t0
        out = out.sort_values("score_sec", ascending=False)
        print(f"rep={rep} wall={wall:.2f}s cores={cores}")
        print(
            "  decode: sum={:.1f} max={:.2f}  score: sum={:.1f} max={:.2f}  payload: {:.0f} MB".format(
                out["decode_sec"].sum(),
                out["decode_sec"].max(),
                out["score_sec"].sum(),
                out["score_sec"].max(),
                out["payload_mb"].sum(),
            )
        )
        print(out.head(5).to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))

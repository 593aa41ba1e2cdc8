"""Interleaved A/B of the 256-query batch on the staged 4.85M-turn
index — VM load drifts 15-40% within minutes, so variants alternate
inside ONE session and each reports its min (the drift-free estimate).

Variants come from env-knob settings applied per iteration.

Run:  python scripts/bench_batch_ab.py <cores> [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = "/dev/shm/tirs_phase_stage"

# kernel-entry kwargs per variant; results must be identical across
# variants (asserted below). Used round 5 to falsify both the
# decoded-block cache (min 2.05s cached vs 1.75s uncached) and the
# placement split (split=2: 2.85s vs split=1: 1.99s) at 16 cores.
VARIANTS: dict[str, dict] = {
    "split1": {"split": 1},
    "split2": {"split": 2},
}


def main() -> None:
    cores = int(sys.argv[1])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from text_indexing_and_retrieval_system_spark import engine, querygen
    from text_indexing_and_retrieval_system_spark.session import (
        get_spark,
        warm_python_workers,
    )
    import pyspark.sql.functions as F

    spark = get_spark(
        app_name=f"tirs-ab-{cores}", master=f"local[{cores}]", shuffle_partitions=32
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
    qs = querygen.generate_queries(pools, n_queries=256, seed=11)
    idx.search_batch(querygen.generate_queries(pools, n_queries=8, seed=7), k=50)

    # toggle kernel kwargs per call by wrapping the kernel entry — flags
    # travel to workers inside the UDF closure, so no env plumbing
    from text_indexing_and_retrieval_system_spark.operators import wand

    orig = wand.topk_disjunctive_batch
    state: dict = {}

    def patched(*a, **kw):
        kw.update(state)
        return orig(*a, **kw)

    wand.topk_disjunctive_batch = patched
    results = {k: [] for k in VARIANTS}
    hits_seen = set()
    for r in range(rounds):
        for name, kwargs in VARIANTS.items():
            state.clear()
            state.update(kwargs)
            t0 = time.time()
            res = idx.search_batch(qs, k=50)
            dt = time.time() - t0
            results[name].append(round(dt, 3))
            hits_seen.add(sum(len(x.docs) for x in res.values()))
    assert len(hits_seen) == 1, f"variants disagree: {hits_seen}"
    print(
        json.dumps(
            {
                "cores": cores,
                "hits": hits_seen.pop(),
                "runs": results,
                "min": {k: min(v) for k, v in results.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Microbenchmark: per-query score accumulation strategies for the
batch kernel (`wand.topk_disjunctive_batch`).

Current kernel: per query, q_docs = np.unique(concat(term docs)), then
per term  scores[np.searchsorted(q_docs, d)] += idf * imp  — T binary-
search passes of df_t * log(U) each, cache-unfriendly.

Candidate: q_docs, inv = np.unique(all_docs, return_inverse=True);
scores = np.bincount(inv, weights=all_imps, minlength=U) — ONE
sequential accumulation pass. Bit-identity argument: bincount
accumulates element-by-element in array order; all_imps is concatenated
in the same sorted-items term order the searchsorted loop adds in, so
every doc's partial sums happen in the identical floating-point order.
(Asserted here on every trial, and by the engine's bit-identity suite.)

Run on an idle box:  python scripts/bench_score_accum.py
"""

from __future__ import annotations

import time

import numpy as np

rng = np.random.default_rng(7)


def make_query(n_terms: int, dfs: list[int], doc_space: int):
    """Sorted int32 doc arrays + float64 impacts, one pair per term."""
    terms = []
    for t in range(n_terms):
        df = dfs[t % len(dfs)]
        docs = np.sort(rng.choice(doc_space, size=df, replace=False)).astype(np.int32)
        imp = rng.random(df) * 2.0 + 0.2
        idf = float(rng.random() * 6 + 0.5)
        terms.append((docs, imp, idf))
    return terms


def score_searchsorted(terms, k=50):
    q_docs = np.unique(np.concatenate([d for d, _, _ in terms]))
    scores = np.zeros(q_docs.size, dtype=np.float64)
    for d, imp, idf in terms:
        scores[np.searchsorted(q_docs, d)] += idf * imp
    return q_docs, scores


def score_bincount(terms, k=50):
    all_docs = np.concatenate([d for d, _, _ in terms])
    all_imps = np.concatenate([idf * imp for _, imp, idf in terms])
    q_docs, inv = np.unique(all_docs, return_inverse=True)
    scores = np.bincount(inv, weights=all_imps, minlength=q_docs.size)
    return q_docs, scores


def trial(label, n_queries, n_terms, dfs, doc_space):
    queries = [make_query(n_terms, dfs, doc_space) for _ in range(n_queries)]
    # bit-identity check on every query before timing
    for q in queries:
        d1, s1 = score_searchsorted(q)
        d2, s2 = score_bincount(q)
        assert np.array_equal(d1, d2)
        assert np.array_equal(s1.view(np.int64), s2.view(np.int64)), "bits differ"
    out = {}
    for name, fn in (("searchsorted", score_searchsorted), ("bincount", score_bincount)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for q in queries:
                fn(q)
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    ratio = out["searchsorted"] / out["bincount"]
    print(
        f"{label:38s} ss={out['searchsorted']*1e3:8.1f}ms  "
        f"bc={out['bincount']*1e3:8.1f}ms  speedup={ratio:.2f}x"
    )
    return ratio


if __name__ == "__main__":
    # bucket-local doc spaces ~ (4.84M turns / 32 buckets) ≈ 150k docs;
    # pool dfs after bucketing: high ~5-60, mid ~60-400, low ~400-2800,
    # plus the scoring-term tail of hot terms (df up to ~50k per bucket)
    trial("2 terms, small df (5..60)", 256, 2, [20, 50], 150_000)
    trial("3 terms, mid df (60..400)", 256, 3, [80, 200, 350], 150_000)
    trial("3 terms, low-pool df (400..2800)", 256, 3, [500, 1200, 2600], 150_000)
    trial("4 terms, mixed + hot (50k)", 128, 4, [50, 400, 2600, 50_000], 150_000)
    trial("2 terms, both hot (50k)", 64, 2, [50_000, 40_000], 150_000)

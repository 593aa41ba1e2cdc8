"""Batched query pass must equal per-query ranked retrieval for
free-text (disjunctive) queries."""


def test_batch_matches_single(built_index, oracle_index):
    terms = sorted(
        oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
    )
    queries = [
        f'"{terms[0]}"',
        f'"{terms[1]}" OR "{terms[5]}"',
        f'"{terms[2]}" OR "{terms[10]}" OR "{terms[30]}"',
        '"zzznonexistent"',
    ]
    batch = built_index.search_batch(queries, k=15)
    for q in queries:
        single = built_index.search_collect(q, k=15, strategy="wand")
        want = oracle_index.search(q, k=15, scorer="bm25")
        assert batch[q].docs == single.docs == [d for d, _ in want], q
        assert batch[q].scores == single.scores == [s for _, s in want], q


def test_batch_distributed_merge_matches_driver_merge(
    built_index, oracle_index, monkeypatch
):
    """Forcing the distributed merge path (the large-cluster branch) must
    give results identical to the driver merge and the oracle — including
    the re-sort + truncate of per-Arrow-batch top-k supersets."""
    from text_indexing_and_retrieval_system_spark import engine as eng

    terms = sorted(
        oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
    )
    queries = [
        f'"{terms[0]}"',
        f'"{terms[1]}" OR "{terms[4]}"',
        f'"{terms[2]}" OR "{terms[7]}" OR "{terms[9]}"',
    ]
    driver = built_index.search_batch(queries, k=12)
    monkeypatch.setattr(eng, "DRIVER_MERGE_MAX_ROWS", 0)
    dist = built_index.search_batch(queries, k=12)
    for q in queries:
        want = oracle_index.search(q, k=12, scorer="bm25")
        assert dist[q].docs == driver[q].docs == [d for d, _ in want], q
        assert dist[q].scores == driver[q].scores == [s for _, s in want], q


def test_batch_duplicate_queries(built_index, oracle_index):
    """Repeated query strings (CLI 'batch' with duplicate lines) must not
    double the result lists — answered once, keyed by string."""
    terms = sorted(
        oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
    )
    q = f'"{terms[0]}"'
    out = built_index.search_batch([q, q, q], k=10)
    want = oracle_index.search(q, k=10, scorer="bm25")
    assert out[q].docs == [d for d, _ in want]
    assert len(out[q].docs) == len(want)


def test_batch_kernel_split_is_placement_invariant(built_index, oracle_index):
    """Placement invariance holds only in the COARSER direction: groups
    may be unions of whole doc-range buckets (the null-slot overflow
    path merges several buckets into one group), but never subdivisions
    of one — a sub-bucket split was tried in round 5 and emitted partial
    scores (a doc's terms' blocks have different first_docs, so they
    landed in different groups; this test caught it). Here every bucket
    above id 1 shares the overflow group and results must not move."""
    from text_indexing_and_retrieval_system_spark import engine as eng

    terms = sorted(
        oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
    )
    queries = [
        f'"{terms[0]}"',
        f'"{terms[1]}" OR "{terms[3]}"',
        f'"{terms[2]}" OR "{terms[8]}" OR "{terms[20]}"',
    ]
    base = built_index.search_batch(queries, k=10)
    coarse = eng.InvertedIndex(built_index.spark, built_index.dir)
    coarse.kernel_buckets = 2  # buckets >= 2 all map to the null slot
    merged = coarse.search_batch(queries, k=10)
    for q in queries:
        assert merged[q].docs == base[q].docs, q
        assert merged[q].scores == base[q].scores, q


def test_driver_merge_threshold_prune_is_exact():
    """merge_query_topk_driver's per-query kth-score pre-filter (round 5:
    the full 3-key lexsort over ~1M winner rows was a 0.3 s flat driver
    constant) must stay bit-identical to the unpruned sort+cut on
    adversarial inputs: heavy score ties straddling the kth position,
    ragged per-query bucket counts, and k larger than any pool."""
    import numpy as np
    import pandas as pd

    from text_indexing_and_retrieval_system_spark.operators import wand

    def brute(lpdf, k):
        if lpdf.empty:
            return {}
        counts = lpdf["doc_ids"].map(len).to_numpy(dtype=np.int64) // 8
        qids = np.repeat(lpdf["query_id"].to_numpy(dtype=np.int64), counts)
        docs = np.frombuffer(b"".join(lpdf["doc_ids"]), dtype=np.int64)
        scores = np.frombuffer(b"".join(lpdf["scores"]), dtype=np.float64)
        order = np.lexsort((docs, -scores, qids))
        qids, docs, scores = qids[order], docs[order], scores[order]
        out = {}
        starts = np.flatnonzero(np.r_[True, qids[1:] != qids[:-1]])
        ends = np.r_[starts[1:], qids.size]
        for s, e in zip(starts, ends):
            e = min(e, s + k)
            out[int(qids[s])] = list(
                zip(docs[s:e].tolist(), scores[s:e].tolist())
            )
        return out

    rng = np.random.default_rng(7)
    rows = []
    for q in rng.choice(97, 600):
        n = int(rng.integers(1, 9))
        # few distinct scores -> tie plateaus at every kth boundary
        sc = rng.choice([1.0, 2.0, 2.0, 3.0, 3.5], n)
        dc = rng.choice(10_000, n, replace=False).astype(np.int64)
        o = np.lexsort((dc, -sc))  # kernel emission order
        rows.append(
            {
                "query_id": int(q),
                "doc_ids": dc[o].tobytes(),
                "scores": sc[o].tobytes(),
            }
        )
    pdf = pd.DataFrame(rows)
    for k in (1, 2, 3, 5, 40):
        assert wand.merge_query_topk_driver(pdf, k) == brute(pdf, k)
    assert wand.merge_query_topk_driver(pdf.iloc[:0], 5) == {}

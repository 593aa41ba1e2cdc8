"""Convmap driver-cache fallback (engine._doc_ids_for).

When `n_convs > CONVMAP_DRIVER_CACHE_MAX` the driver must NOT load the
convmap; doc-id resolution instead scans `doclen()` — a literal IN-list
for small id sets (parquet min/max pruning) or a broadcast-joined id
relation for large ones. Both fallback branches must return exactly the
cached-path mapping, end-to-end through `search()` hydration.

Reference parity: doc-id hydration per SURVEY.md S8 (reference
`indexer.py` doc-store lookup); the cap exists because a 10^12-doc
deployment cannot hold the conv map on the driver.
"""

import pandas as pd


def _force_fallback(idx):
    idx._convmap = None
    idx.CONVMAP_DRIVER_CACHE_MAX = 0  # instance attr shadows the class


def _restore(idx):
    idx._convmap = None
    try:
        del idx.CONVMAP_DRIVER_CACHE_MAX
    except AttributeError:
        pass


def test_doc_ids_for_fallback_small_and_large(built_index):
    idx = built_index
    all_ids = [
        int(r["doc_id_int"])
        for r in idx.doclen().select("doc_id_int").limit(300).collect()
    ]
    small, large = all_ids[:17], all_ids  # IN-list branch / broadcast branch
    assert len(large) > 256, "need >256 ids to exercise the join branch"

    _restore(idx)  # ensure the cached path is actually cached
    want_small = idx._doc_ids_for(small)
    want_large = idx._doc_ids_for(large)
    assert idx._convmap is not None  # cached path really ran

    _force_fallback(idx)
    try:
        assert idx._doc_ids_for(small) == want_small
        got_large = idx._doc_ids_for(large)
        assert idx._convmap is None  # fallback never loaded the map
    finally:
        _restore(idx)
    assert got_large == want_large
    # sanity: mapping is the build-side format conv-XXXXXXXX:NNNN
    any_id = want_small[small[0]]
    conv, turn = any_id.rsplit(":", 1)
    assert conv.startswith("conv-") and len(turn) == 4


def test_search_hydration_under_fallback(built_index):
    idx = built_index
    _restore(idx)
    want = idx.search_collect('"the" OR "conversation"', k=20, scorer="bm25")
    _force_fallback(idx)
    try:
        got = idx.search_collect('"the" OR "conversation"', k=20, scorer="bm25")
    finally:
        _restore(idx)
    assert want.docs == got.docs
    assert [round(s, 9) for s in want.scores] == [round(s, 9) for s in got.scores]

"""pack_postings_batch must be wire-identical to per-block pack_postings."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_indexing_and_retrieval_system_spark.functions import codec


@given(
    st.lists(  # blocks: each a list of (doc_id, tf, dl)
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**12),
                st.integers(min_value=1, max_value=40),
                st.integers(min_value=1, max_value=5000),
            ),
            min_size=1,
            max_size=20,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=10,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_batch_equals_per_block(blocks, with_pos):
    rng = np.random.RandomState(7)
    doc_ids, tfs, dls, pos_rows = [], [], [], []
    block_starts = []
    for blk in blocks:
        blk = sorted(blk)
        block_starts.append(len(doc_ids))
        for d, tf, dl in blk:
            doc_ids.append(d)
            tfs.append(tf)
            dls.append(dl)
            pos_rows.append(np.sort(rng.choice(100000, size=tf, replace=False)))
    doc_ids = np.array(doc_ids)
    tfs = np.array(tfs)
    dls = np.array(dls)
    starts = np.array(block_starts)
    flat = np.concatenate(pos_rows) if with_pos else None

    got = codec.pack_postings_batch(doc_ids, tfs, dls, starts, flat)

    ends = list(starts[1:]) + [len(doc_ids)]
    for b, (s, e) in enumerate(zip(starts, ends)):
        want = codec.pack_postings(
            doc_ids[s:e],
            tfs[s:e],
            dls[s:e],
            pos_rows[s:e] if with_pos else None,
        )
        assert got[b] == want, f"block {b} differs"
        d, t, l, p = codec.unpack_postings(got[b], with_positions=with_pos)
        assert list(d) == list(doc_ids[s:e])

    if not with_pos:
        # batch unpack must invert batch pack (core payloads)
        bn, d_all, t_all, l_all = codec.unpack_postings_batch(got)
        assert list(bn) == [e - s for s, e in zip(starts, ends)]
        assert list(d_all) == list(doc_ids)
        assert list(t_all) == list(tfs)
        assert list(l_all) == list(dls)
    else:
        # the positions column layout: concatenated per-row [len]+gaps
        from text_indexing_and_retrieval_system_spark.operators.index_build import (
            _encode_position_rows,
        )

        for b, (s, e) in enumerate(zip(starts, ends)):
            pos_bytes = b"".join(_encode_position_rows(list(pos_rows[s:e])))
            decoded = codec.unpack_positions(pos_bytes, e - s)
            for want_row, got_row in zip(pos_rows[s:e], decoded):
                assert list(want_row) == list(got_row)


@given(
    st.integers(min_value=0, max_value=(1 << 40)),  # bucket base
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=(1 << 31) - 1),  # local doc
                st.integers(min_value=1, max_value=40),
                st.integers(min_value=1, max_value=70000),
            ),
            min_size=1,
            max_size=20,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=60, deadline=None)
def test_batch_local32_mode(base, blocks):
    """local32 mode (first_docs + base) must reproduce the global decode
    exactly, as int32 offsets — including >=2^28 gaps (5-byte varints)
    whose top bits exercise the uint32 shift edge."""
    doc_ids, tfs, dls, starts, first_docs = [], [], [], [], []
    for blk in blocks:
        blk = sorted(blk)
        starts.append(len(doc_ids))
        first_docs.append(base + blk[0][0])
        for d, tf, dl in blk:
            doc_ids.append(base + d)
            tfs.append(tf)
            dls.append(dl)
    doc_ids, tfs, dls = np.array(doc_ids), np.array(tfs), np.array(dls)
    payloads = codec.pack_postings_batch(doc_ids, tfs, dls, np.array(starts), None)
    bn, d_loc, t_loc, l_loc = codec.unpack_postings_batch(
        payloads, first_docs=np.array(first_docs, dtype=np.int64), base=base
    )
    assert d_loc.dtype == np.int32 and t_loc.dtype == np.int32
    assert list(d_loc.astype(np.int64) + base) == list(doc_ids)
    assert list(t_loc) == list(tfs)
    assert list(l_loc) == list(dls)

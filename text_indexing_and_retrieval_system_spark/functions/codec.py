"""Integer codecs for posting payloads: delta-gap + variable-byte.

Byte layout is wire-compatible with the reference's codec
(`/root/reference/code/indexes/encoder.py:61-116`): each integer is
emitted as little-endian 7-bit groups, and the **stop bit (0x80) is set
on the final byte** of each integer. Gap coding keeps the first element
absolute and subsequent elements as diffs (`encoder.py:11-59`).

Unlike the reference (per-int Python loops), everything here is
numpy-vectorized so it can run inside Arrow-batched pandas UDFs at
full speed — one call encodes/decodes a whole posting list (or a whole
batch of concatenated lists) without per-row Python.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


def gap_encode(numbers: np.ndarray) -> np.ndarray:
    """Sorted ints -> [first, diffs...]. Raises on unsorted input."""
    numbers = np.asarray(numbers, dtype=np.int64)
    if numbers.size == 0:
        return numbers
    gaps = np.diff(numbers, prepend=np.int64(0))
    gaps[0] = numbers[0]
    if numbers.size > 1 and np.any(gaps[1:] < 0):
        raise ValueError("Input list must be sorted in ascending order.")
    return gaps


def gap_decode(gaps: np.ndarray) -> np.ndarray:
    gaps = np.asarray(gaps, dtype=np.int64)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps)


def varbyte_encode_with_sizes(numbers: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized VByte returning (stream, bytes-per-integer array) —
    the sizes let callers slice one big encode into per-block payloads."""
    v = np.asarray(numbers, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    if np.any(np.asarray(numbers, dtype=np.int64) < 0):
        raise ValueError("varbyte_encode requires non-negative integers")
    # bytes needed per value (loop over at most 10 shift levels, vectorized)
    nb = np.ones(v.size, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while np.any(shifted):
        nb += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        out[starts[mask] + k] = ((v[mask] >> np.uint64(7 * k)) & np.uint64(127)).astype(
            np.uint8
        )
    out[ends - 1] |= 128  # stop bit on the final byte of each integer
    return out.tobytes(), nb


def varbyte_encode(numbers: np.ndarray) -> bytes:
    """Vectorized VByte: little-endian 7-bit groups, stop bit on last byte."""
    return varbyte_encode_with_sizes(numbers)[0]


def _varbyte_decode_raw(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8 array -> (int64 values, int32 byte index of each value's
    stop byte). int32 index arrays halve the memory traffic of the
    gather loop — this decode is the measured hot spot of the batch
    query kernel (~60% of its python core-seconds), and it is memory-
    bandwidth-bound, so byte traffic is wall time."""
    if b.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.int32)
    ends = np.flatnonzero(b & 128).astype(np.int32)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts
    vals = (b[starts] & np.uint8(127)).astype(np.uint64)
    # continuation bytes only for multi-byte ints (gaps/tf/dl are mostly
    # 1 byte; the mask shrinks fast) — mask the 7-bit payload on the
    # gathered slice instead of materializing a full (b & 127) copy
    for k in range(1, int(lengths.max(initial=0)) + 1):
        mask = lengths >= k
        vals[mask] |= (b[starts[mask] + k] & np.uint8(127)).astype(
            np.uint64
        ) << np.uint64(7 * k)
    return vals.astype(np.int64), ends


def varbyte_decode(stream: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns int64 array."""
    return _varbyte_decode_raw(np.frombuffer(stream, dtype=np.uint8))[0]


def encode_sorted(numbers: np.ndarray) -> bytes:
    """delta-gap + varint pack of a sorted int list (CODE compression,
    reference `index_custom.py:355-365`)."""
    return varbyte_encode(gap_encode(numbers))


def decode_sorted(stream: bytes) -> np.ndarray:
    return gap_decode(varbyte_decode(stream))


# ---------------------------------------------------------------------------
# Posting-block payload:
#   header  : varint [n_docs]
#   doc ids : varint gaps (sorted, first absolute)
#   tfs     : varint (tf per doc, aligned with doc ids)
#   doclens : varint (token length of each doc — lets BM25 score a block
#             without a doclen join)
#   positions (optional): per doc, varint [n_positions] + position gaps
# ---------------------------------------------------------------------------


def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> bytes:
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    parts = [varbyte_encode(np.array([n], dtype=np.int64))]
    parts.append(encode_sorted(doc_ids))
    parts.append(varbyte_encode(np.asarray(tfs, dtype=np.int64)))
    parts.append(varbyte_encode(np.asarray(doclens, dtype=np.int64)))
    if positions is not None:
        # concatenate [len, gaps...] per doc then one vectorized encode
        chunks = []
        for pos in positions:
            pos = np.asarray(pos, dtype=np.int64)
            chunks.append(np.array([pos.size], dtype=np.int64))
            chunks.append(gap_encode(pos))
        parts.append(varbyte_encode(np.concatenate(chunks) if chunks else np.empty(0)))
    return b"".join(parts)


def pack_postings_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_starts: np.ndarray,
    positions_flat: np.ndarray | None = None,
) -> list[bytes]:
    """Pack MANY blocks in one vectorized pass; wire-identical to calling
    :func:`pack_postings` per block.

    doc_ids/tfs/dls: flat row arrays (doc-id-sorted within each block).
    block_starts: int array of B block start row-indices (ascending,
    first = 0); block b covers rows [block_starts[b], block_starts[b+1]).
    positions_flat: all rows' position lists concatenated (row r owns
    tfs[r] entries), or None to omit positions.

    The per-block int sequence [n][doc gaps][tfs][dls][(len,gaps)*] is
    assembled for all blocks into one flat array with index arithmetic,
    varbyte-encoded once, and sliced at per-block byte offsets.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n_rows = doc_ids.size
    block_starts = np.asarray(block_starts, dtype=np.int64)
    n_blocks = block_starts.size
    if n_blocks == 0:
        return []
    block_ends = np.empty(n_blocks, dtype=np.int64)
    block_ends[:-1] = block_starts[1:]
    block_ends[-1] = n_rows
    nb_rows = block_ends - block_starts  # rows per block

    row_block = np.repeat(np.arange(n_blocks), nb_rows)  # block id per row
    rel = np.arange(n_rows) - block_starts[row_block]  # row index within block

    # doc gaps with per-block reset
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[block_starts] = doc_ids[block_starts]
    if n_rows > 1 and np.any(gaps < 0):
        raise ValueError("doc ids must be sorted ascending within each block")

    with_pos = positions_flat is not None
    if with_pos:
        positions_flat = np.asarray(positions_flat, dtype=np.int64)
        n_pos = positions_flat.size
        # per-row start offsets into positions_flat
        prow_ends = np.cumsum(tfs)
        prow_starts = prow_ends - tfs
        pgaps = positions_flat.copy()
        if n_pos:
            pgaps[1:] -= positions_flat[:-1]
            pgaps[prow_starts[tfs > 0]] = positions_flat[prow_starts[tfs > 0]]
        # per-row pos-int counts (len prefix + gaps)
        row_pos_ints = 1 + tfs
        pos_ints_per_block = np.add.reduceat(row_pos_ints, block_starts)
    else:
        row_pos_ints = np.zeros(n_rows, dtype=np.int64)
        pos_ints_per_block = np.zeros(n_blocks, dtype=np.int64)

    ints_per_block = 1 + 3 * nb_rows + pos_ints_per_block
    block_int_ends = np.cumsum(ints_per_block)
    base = block_int_ends - ints_per_block  # first int index of each block
    total_ints = int(block_int_ends[-1])

    S = np.empty(total_ints, dtype=np.int64)
    S[base] = nb_rows  # header [n]
    idx_gap = base[row_block] + 1 + rel
    nbr = nb_rows[row_block]
    S[idx_gap] = gaps
    S[idx_gap + nbr] = tfs
    S[idx_gap + 2 * nbr] = dls
    if with_pos:
        # per-row pos-int start within block (exclusive cumsum reset per block)
        cum = np.cumsum(row_pos_ints)
        row_sec_start_global = cum - row_pos_ints  # exclusive global cumsum
        block_first_row_cumsum = row_sec_start_global[block_starts]
        pstart_rel = row_sec_start_global - block_first_row_cumsum[row_block]
        row_sec_idx = base[row_block] + 1 + 3 * nbr + pstart_rel
        S[row_sec_idx] = tfs  # [len] prefix per row
        if n_pos:
            pos_row = np.repeat(np.arange(n_rows), tfs)  # row id per position
            within = np.arange(n_pos) - prow_starts[pos_row]
            S[row_sec_idx[pos_row] + 1 + within] = pgaps

    stream, nb_bytes = varbyte_encode_with_sizes(S)
    byte_ends = np.cumsum(nb_bytes)
    # byte offset where each block begins/ends
    blk_byte_end = byte_ends[block_int_ends - 1]
    blk_byte_start = np.empty(n_blocks, dtype=np.int64)
    blk_byte_start[0] = 0
    blk_byte_start[1:] = blk_byte_end[:-1]
    mv = memoryview(stream)
    return [bytes(mv[int(s) : int(e)]) for s, e in zip(blk_byte_start, blk_byte_end)]


def _varbyte_decode_raw_u32(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint32 variant of :func:`_varbyte_decode_raw` for streams whose
    NON-FIRST-doc values all fit 31 bits (the caller certifies this and
    patches first-doc entries from a side column). Values wider than 32
    bits decode to garbage in their low bits — by the precondition only
    first-doc absolutes can be that wide, and the caller overwrites
    them. Halves the bandwidth of the decode loop and every downstream
    gather — this path is memory-bandwidth-bound."""
    ends = np.flatnonzero(b & 128).astype(np.int32)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts
    vals = (b[starts] & np.uint8(127)).astype(np.uint32)
    for k in range(1, int(lengths.max(initial=0)) + 1):
        if 7 * k >= 32:
            # a uint32 shift by >=32 is undefined in C; bytes at k>=5
            # only carry bits >=35, which a <2^31 value never sets —
            # wider entries are first-doc absolutes, patched below
            break
        mask = lengths >= k
        vals[mask] |= (b[starts[mask] + k] & np.uint8(127)).astype(
            np.uint32
        ) << np.uint32(7 * k)
    return vals, ends


def unpack_postings_batch(
    payloads, first_docs: np.ndarray | None = None, base: int = 0
) -> tuple[np.ndarray, ...]:
    """Decode MANY core-payload blocks in one vectorized pass.

    `payloads` is a sequence of CORE payloads (no positions section:
    varint [n] + doc gaps + tfs + dls — the `payload` column layout).
    Returns (block_n, doc_ids, tfs, dls): `block_n[b]` rows per block,
    and the per-row arrays concatenated in block order (doc ids already
    gap-decoded with per-block reset).

    Default mode returns int64 global doc ids. When `first_docs` (the
    per-block first absolute doc id, aligned with `payloads`) is given,
    the decode runs in uint32 internally and returns **int32 doc ids
    relative to `base`** plus int32 tfs/dls — the caller must certify
    max(last_doc) - base < 2^31 (true for one doc-range bucket). The
    wide first-doc varints are never decoded; their gap entries are
    patched from `first_docs`. ~40% less memory traffic, which is wall
    time in the bandwidth-bound batch query kernel.

    Equivalent to calling :func:`unpack_postings` per block but ~10x
    faster: one varbyte pass over the concatenated byte stream + index
    arithmetic, instead of per-block numpy setup overhead (~90us/block
    measured on 128-row blocks)."""
    n_blocks = len(payloads)
    if n_blocks == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n_blocks)
    stream = b"".join(bytes(p) for p in payloads)
    b = np.frombuffer(stream, dtype=np.uint8)
    # one stop-bit scan shared by value decode and block-boundary mapping
    # (ints end at stop-bit bytes); int32 index arrays throughout — the
    # whole routine is memory-bandwidth-bound
    local32 = first_docs is not None
    if local32:
        S, int_end_bytes = _varbyte_decode_raw_u32(b)
    else:
        S, int_end_bytes = _varbyte_decode_raw(b)
    byte_starts = np.cumsum(lens) - lens
    int_start = np.searchsorted(int_end_bytes, byte_starts).astype(np.int32)
    block_n = S[int_start].astype(np.int64)
    total_rows = int(block_n.sum())
    if total_rows == 0:
        z = np.empty(0, dtype=np.int64)
        return block_n, z, z, z
    block_n32 = block_n.astype(np.int32)
    row_block = np.repeat(np.arange(n_blocks, dtype=np.int32), block_n32)
    row_starts = np.cumsum(block_n32, dtype=np.int32) - block_n32
    rel = np.arange(total_rows, dtype=np.int32) - row_starts[row_block]
    idx = int_start[row_block] + np.int32(1) + rel
    nbr = block_n32[row_block]
    if local32:
        gaps = S[idx].astype(np.int32)
        # first gap of each block = the (possibly mangled) absolute first
        # doc id: overwrite with the base-relative offset from the column
        gaps[row_starts] = (
            np.asarray(first_docs, dtype=np.int64) - np.int64(base)
        ).astype(np.int32)
        tfs = S[idx + nbr].view(np.int32)
        dls = S[idx + 2 * nbr].view(np.int32)
        tot = np.cumsum(gaps, dtype=np.int64)
    else:
        gaps = S[idx]
        tfs = S[idx + nbr]
        dls = S[idx + 2 * nbr]
        tot = np.cumsum(gaps)
    # gap decode with per-block reset: cumsum, then subtract the running
    # total carried in from previous blocks
    carry = np.zeros(n_blocks, dtype=np.int64)
    carry[1:] = tot[row_starts[1:] - 1]
    doc_ids = tot - carry[row_block]
    if local32:
        doc_ids = doc_ids.astype(np.int32)
    return block_n, doc_ids, tfs, dls


def unpack_positions(pos_payload: bytes, n_rows: int) -> list[np.ndarray]:
    """Decode a block's positions column: per row varint [len] + position
    gaps (the byte layout `_encode_position_rows` emits, stored in the
    separate `pos_payload` parquet column so ranked queries never scan,
    shuffle, or decode position bytes)."""
    S = varbyte_decode(pos_payload)
    out: list[np.ndarray] = []
    idx = 0
    for _ in range(n_rows):
        plen = int(S[idx])
        idx += 1
        out.append(gap_decode(S[idx : idx + plen]))
        idx += plen
    return out


def unpack_postings(payload: bytes, with_positions: bool = False):
    """Returns (doc_ids, tfs, doclens, positions|None)."""
    all_ints_pos = varbyte_decode(payload)  # decode everything in one pass
    n = int(all_ints_pos[0])
    idx = 1
    doc_ids = gap_decode(all_ints_pos[idx : idx + n])
    idx += n
    tfs = all_ints_pos[idx : idx + n]
    idx += n
    doclens = all_ints_pos[idx : idx + n]
    idx += n
    positions = None
    if with_positions:
        positions = []
        for _ in range(n):
            plen = int(all_ints_pos[idx])
            idx += 1
            positions.append(gap_decode(all_ints_pos[idx : idx + plen]))
            idx += plen
    return doc_ids, tfs, doclens, positions

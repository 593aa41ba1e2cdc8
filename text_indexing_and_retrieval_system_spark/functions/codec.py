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


def varbyte_encode(numbers: np.ndarray) -> bytes:
    """Vectorized VByte: little-endian 7-bit groups, stop bit on last byte."""
    v = np.asarray(numbers, dtype=np.uint64)
    if v.size == 0:
        return b""
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
    return out.tobytes()


def varbyte_decode(stream: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns int64 array."""
    b = np.frombuffer(stream, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(b & 128)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    payload = b & np.uint8(127)
    for k in range(int(lengths.max())):
        mask = lengths > k
        vals[mask] |= payload[starts[mask] + k].astype(np.uint64) << np.uint64(7 * k)
    return vals.astype(np.int64)


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

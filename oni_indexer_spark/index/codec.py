"""Delta + varint posting-list codec (numpy-vectorized, no per-element
Python loops).

The reference delegates the physical index layout to Lucene (segments,
skip lists, block-max metadata — ``schema.json`` field types; SURVEY.md
§2.C2). Here postings for one (term, doc-range block) row are encoded as
a LEB128 varint stream of ``(doc_gap, tf, dl)`` triples:

- ``doc_gap``: first value is the absolute doc_id, subsequent values are
  deltas (doc_ids are sorted within a block) — small gaps → 1-2 bytes.
- ``tf``: term frequency in the doc.
- ``dl``: the doc's token length. Carrying dl inside the posting trades a
  byte or two per posting for eliminating the doclen join at query time —
  at 10^12-doc scale that join is a full shuffle we never pay.

Encode/decode are vectorized over the posting dimension: encode touches
each of the ≤10 varint byte positions once (numpy fancy indexing), decode
reconstructs values with one ``np.add.at`` scatter. Both are exercised by
roundtrip property tests (tests/test_codec.py).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def _varint_encode_arr(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array → (byte array, per-value byte sizes)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = np.ones(vals.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (vals >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(10):
        mask = nbytes > k
        if not mask.any():
            break
        v = vals[mask] >> np.uint64(7 * k)
        byte = (v & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[starts[mask] + k] = byte | cont
    return out, nbytes


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array into one byte stream."""
    out, _ = _varint_encode_arr(np.asarray(vals, dtype=np.uint64))
    return out.tobytes()


def _varint_decode_arr(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode a uint8 array of LEB128 bytes → (values, end-byte indices)."""
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    is_end = (b & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    group_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
    pos_in_group = np.arange(b.size, dtype=np.int64) - starts[group_id]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_group.astype(np.uint64))
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, group_id, contrib)
    return vals, ends


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte stream back to a uint64 array."""
    vals, _ = _varint_decode_arr(np.frombuffer(buf, dtype=np.uint8))
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode sorted (doc_id, tf, dl) posting arrays into one varint blob."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(doc_ids)
    if doc_ids.size:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    triples = np.empty(doc_ids.size * 3, dtype=np.uint64)
    triples[0::3] = gaps.astype(np.uint64)
    triples[1::3] = np.asarray(tfs, dtype=np.uint64)
    triples[2::3] = np.asarray(dls, dtype=np.uint64)
    return varint_encode(triples)


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` → (doc_ids, tfs, dls)."""
    triples = varint_decode(blob)
    gaps = triples[0::3].astype(np.int64)
    tfs = triples[1::3].astype(np.int32)
    dls = triples[2::3].astype(np.int32)
    return np.cumsum(gaps), tfs, dls


# --- batch codec -----------------------------------------------------------
# The Arrow UDFs call these once per BATCH, not once per row: a posting
# block averages a handful of entries, so per-row numpy dispatch dominated
# the build (measured: 19s of a 24.6s postings stage at 60k docs). Here
# all rows of a batch concatenate into one value stream; encode/decode is
# one vectorized pass, and rows are recovered by offset slicing.


def encode_postings_flat(
    all_docs: np.ndarray,
    all_tfs: np.ndarray,
    all_dls: np.ndarray,
    counts: np.ndarray,
) -> list[bytes]:
    """Encode many rows' postings given FLAT value arrays + per-row
    counts (the natural shape of an Arrow ListArray: child values +
    offsets — zero per-row work until the final byte slicing)."""
    n_rows = len(counts)
    total = int(counts.sum())
    if total == 0:
        return [b""] * n_rows
    all_docs = np.asarray(all_docs, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    gaps = all_docs.copy()
    gaps[1:] -= all_docs[:-1]
    nz = counts > 0
    gaps[starts[nz]] = all_docs[starts[nz]]  # first doc per row is absolute
    triples = np.empty(total * 3, dtype=np.uint64)
    triples[0::3] = gaps.astype(np.uint64)
    triples[1::3] = np.asarray(all_tfs, dtype=np.uint64)
    triples[2::3] = np.asarray(all_dls, dtype=np.uint64)
    buf, nbytes = _varint_encode_arr(triples)
    cum = np.zeros(triples.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=cum[1:])
    vstart = starts * 3
    vend = (starts + counts) * 3
    raw = buf.tobytes()
    return [raw[cum[vstart[i]] : cum[vend[i]]] for i in range(n_rows)]


def encode_postings_batch(
    docs_list: list, tfs_list: list, dls_list: list
) -> list[bytes]:
    """Vectorized multi-row :func:`encode_postings` → list of blobs."""
    n_rows = len(docs_list)
    counts = np.fromiter((len(x) for x in docs_list), dtype=np.int64, count=n_rows)
    if int(counts.sum()) == 0:
        return [b""] * n_rows
    cat = lambda xs: np.concatenate([np.asarray(x, dtype=np.int64) for x in xs])  # noqa: E731
    return encode_postings_flat(cat(docs_list), cat(tfs_list), cat(dls_list), counts)


def decode_postings_flat(
    blobs: list,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode many blobs → FLAT (doc_ids, tfs, dls, per-blob counts).
    One vectorized pass; the flat shape feeds an Arrow ListArray or an
    exploded RecordBatch without any per-row work."""
    n_rows = len(blobs)
    raw = [bytes(b) if b is not None else b"" for b in blobs]
    lens = np.fromiter((len(b) for b in raw), dtype=np.int64, count=n_rows)
    buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
    vals, ends = _varint_decode_arr(buf)
    bstarts = np.cumsum(lens) - lens
    first_val = np.searchsorted(ends, bstarts)
    val_counts = np.diff(np.append(first_val, len(ends)))
    gaps = vals[0::3].astype(np.int64)
    tfs = vals[1::3].astype(np.int32)
    dls = vals[2::3].astype(np.int32)
    # each blob holds 3k values, so the global ::3 stride stays aligned
    pcounts = (val_counts // 3).astype(np.int64)
    pstarts = np.cumsum(pcounts) - pcounts
    # segmented cumsum: doc ids restart at each blob's absolute first doc
    cs = np.cumsum(gaps)
    corr = np.zeros(n_rows, dtype=np.int64)
    nz = pcounts > 0
    prev = pstarts[nz] - 1
    corr[nz] = np.where(prev >= 0, cs[np.maximum(prev, 0)], 0)
    corr[nz] = np.where(pstarts[nz] > 0, corr[nz], 0)
    doc_ids = cs - np.repeat(corr, pcounts)
    return doc_ids, tfs, dls, pcounts


def decode_postings_batch(
    blobs: list,
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray]]:
    """Vectorized multi-row :func:`decode_postings` →
    (doc_id arrays, tf arrays, dl arrays), one entry per input blob."""
    doc_ids, tfs, dls, pcounts = decode_postings_flat(blobs)
    pstarts = np.cumsum(pcounts) - pcounts
    split_at = pstarts[1:]
    return (
        np.split(doc_ids, split_at),
        np.split(tfs, split_at),
        np.split(dls, split_at),
    )

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


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array into one byte stream."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return b""
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
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte stream back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
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

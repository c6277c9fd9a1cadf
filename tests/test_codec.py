"""Roundtrip property tests for the delta+varint posting codec —
mirrors the reference's randomized-repeats test style
(test/filters.spec.js:19-21, 1000 repeats over random inputs)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oni_indexer_spark.index.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert out.tolist() == vals


def test_varint_boundaries():
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**35, 2**49, 2**56, 2**63 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),  # gap
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=1, max_value=10000),  # dl
        ),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(entries):
    gaps = np.array([e[0] for e in entries], dtype=np.int64)
    doc_ids = np.cumsum(gaps) if entries else np.array([], dtype=np.int64)
    tfs = np.array([e[1] for e in entries], dtype=np.int32)
    dls = np.array([e[2] for e in entries], dtype=np.int32)
    blob = encode_postings(doc_ids, tfs, dls)
    d, t, l = decode_postings(blob)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**40),  # first/abs doc
                st.integers(min_value=1, max_value=500),
                st.integers(min_value=1, max_value=10000),
            ),
            max_size=40,
        ),
        max_size=25,
    )
)
@settings(max_examples=100, deadline=None)
def test_batch_matches_single(rows):
    """Batch encode/decode must agree exactly with the per-row codec,
    including empty rows interleaved anywhere in the batch."""
    from oni_indexer_spark.index.codec import (
        decode_postings_batch,
        encode_postings_batch,
    )

    docs_l, tfs_l, dls_l = [], [], []
    for entries in rows:
        ds = np.cumsum(np.array([e[0] + 1 for e in entries], dtype=np.int64))
        docs_l.append(ds)
        tfs_l.append(np.array([e[1] for e in entries], dtype=np.int32))
        dls_l.append(np.array([e[2] for e in entries], dtype=np.int32))
    blobs = encode_postings_batch(docs_l, tfs_l, dls_l)
    singles = [encode_postings(d, t, l) for d, t, l in zip(docs_l, tfs_l, dls_l)]
    assert blobs == singles
    dd, tt, ll = decode_postings_batch(blobs)
    for i in range(len(rows)):
        assert dd[i].tolist() == docs_l[i].tolist()
        assert tt[i].tolist() == tfs_l[i].tolist()
        assert ll[i].tolist() == dls_l[i].tolist()


def test_compression_is_compact():
    # dense block of 128 postings with small gaps/tf/dl ≈ ≤4 bytes/posting
    doc_ids = np.arange(1000, 1128, dtype=np.int64)
    tfs = np.ones(128, dtype=np.int32)
    dls = np.full(128, 120, dtype=np.int32)
    blob = encode_postings(doc_ids, tfs, dls)
    assert len(blob) <= 128 * 4 + 2


# --- v5 positional codec ---------------------------------------------------


def _random_pos_rows(rng, n_rows):
    import numpy as np

    docs_l, tfs_l, dls_l, pos_l, counts = [], [], [], [], []
    for _ in range(n_rows):
        n = int(rng.integers(0, 12))
        counts.append(n)
        if n == 0:
            continue
        base = int(rng.integers(0, 1 << 40))
        docs = np.sort(rng.choice(np.arange(base, base + 500), size=n, replace=False))
        tfs = rng.integers(1, 6, size=n)
        dls = rng.integers(1, 5000, size=n)
        docs_l.append(docs)
        tfs_l.append(tfs)
        dls_l.append(dls)
        for tf in tfs:
            p = np.sort(rng.choice(np.arange(0, 6000), size=int(tf), replace=False))
            pos_l.append(p)
    cat = lambda xs: (
        np.concatenate(xs) if xs else np.empty(0, dtype=np.int64)
    )  # noqa: E731
    return (
        cat(docs_l).astype(np.int64),
        cat(tfs_l).astype(np.int64),
        cat(dls_l).astype(np.int64),
        cat(pos_l).astype(np.int64),
        np.array(counts, dtype=np.int64),
    )


def test_positional_roundtrip_random():
    import numpy as np

    from oni_indexer_spark.index.codec import (
        decode_postings_pos_flat,
        encode_postings_pos_flat,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        docs, tfs, dls, pos, counts = _random_pos_rows(rng, int(rng.integers(1, 9)))
        n_rows = len(counts)
        starts = np.cumsum(counts) - counts
        base_docs = np.zeros(n_rows, dtype=np.int64)
        nz = counts > 0
        base_docs[nz] = docs[starts[nz]] - (docs[starts[nz]] % 128)
        base_dls = np.zeros(n_rows, dtype=np.int64)
        base_dls[nz] = np.minimum.reduceat(dls, starts[nz])[: nz.sum()]
        blobs = encode_postings_pos_flat(docs, tfs, dls, pos, counts, base_docs, base_dls)
        d2, t2, l2, c2, p2 = decode_postings_pos_flat(blobs, counts, base_docs, base_dls)
        assert np.array_equal(c2, counts)
        assert np.array_equal(d2, docs)
        assert np.array_equal(t2, tfs.astype(np.int32))
        assert np.array_equal(l2, dls.astype(np.int32))
        assert np.array_equal(p2, pos)
        # tf/dl-only decode skips the positions array
        d3, t3, l3, c3, p3 = decode_postings_pos_flat(
            blobs, counts, base_docs, base_dls, with_positions=False
        )
        assert p3 is None and np.array_equal(d3, docs) and np.array_equal(t3, t2)


def test_positional_roundtrip_empty_and_single():
    import numpy as np

    from oni_indexer_spark.index.codec import (
        decode_postings_pos_flat,
        encode_postings_pos_flat,
    )

    # all-empty rows
    blobs = encode_postings_pos_flat(
        np.empty(0), np.empty(0), np.empty(0), np.empty(0), np.array([0, 0])
    )
    assert blobs == [b"", b""]
    d, t, l, c, p = decode_postings_pos_flat(blobs, np.array([0, 0]))
    assert len(d) == 0 and len(p) == 0
    # one posting, tf=3
    blobs = encode_postings_pos_flat(
        np.array([42]), np.array([3]), np.array([9]),
        np.array([0, 5, 6]), np.array([1]),
    )
    d, t, l, c, p = decode_postings_pos_flat(blobs, np.array([1]))
    assert d.tolist() == [42] and t.tolist() == [3] and l.tolist() == [9]
    assert p.tolist() == [0, 5, 6]

"""C11 same-id overwrite (index/build.overwrite_docs): after re-indexing
changed docs, every query answers EXACTLY like a fresh build over the
updated corpus — postings, dfreq, doclen sha256 and stats all corrected —
and only the affected seg directories were rewritten."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from oni_indexer_spark.index import (
    IndexConfig,
    build_index,
    build_to_path,
    overwrite_docs,
    read_index,
)
from oni_indexer_spark.query import topk

# tiny segs so a 256-doc corpus spans several: seg_docs = 16*4 = 64
CFG = IndexConfig(block_size=16, n_buckets=4, seg_blocks=4)


def _corpus(spark, marker=""):
    rows = []
    for i in range(256):
        body = f"alpha tok_{i} beta_{i % 7} gamma"
        if i % 200 == 0 and marker:
            body = f"{body} {marker}"
        rows.append((i, f"r{i % 3}", f"p/{i}", f"c{i}", "python", body))
    return spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, lang string, content string"
    )


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in df.collect()]


@pytest.fixture(scope="module")
def paths(spark):
    base = tempfile.mkdtemp(prefix="ovr_")
    p = f"{base}/idx"
    build_to_path(_corpus(spark), p, CFG, bucket_group_size=4)
    changed = _corpus(spark, marker="needle_mark").where(F.col("doc_id") % 200 == 0)
    # capture pre-state of an UNaffected seg dir for the amplification check
    affected_segs = {i // CFG.seg_docs for i in range(0, 256, 200)}
    untouched = next(s for s in range(256 // CFG.seg_docs) if s not in affected_segs)
    d = f"{p}/doclen/seg={untouched}"
    before = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    overwrite_docs(changed, p)
    return p, untouched, before


def test_queries_match_fresh_build(spark, paths):
    p, _, _ = paths
    disk = read_index(spark, p)
    fresh = build_index(_corpus(spark, marker="needle_mark"), CFG)
    for q, k in [("needle_mark", 10), ("alpha", 5), ("gamma needle_mark", 10), ("tok_100", 3)]:
        assert _rows(topk(disk, q, k=k)) == _rows(topk(fresh, q, k=k)), q


def test_dfreq_and_stats_exact(spark, paths):
    p, _, _ = paths
    disk = read_index(spark, p)
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in disk.dfreq.where(F.col("term").isin("needle_mark", "alpha")).collect()
    }
    assert got["needle_mark"] == (2, 2)  # docs 0, 200
    assert got["alpha"] == (256, 256)
    srows = disk.stats.collect()
    n = sum(int(r["n_docs"]) for r in srows)
    assert n == 256  # +2 new, -2 removed
    # sha256 updated for a changed doc
    sha = disk.doclen.where(F.col("doc_id") == 200).select("content_sha256").collect()
    import hashlib

    assert sha[0][0] == hashlib.sha256(
        b"alpha tok_200 beta_4 gamma needle_mark"
    ).hexdigest()


def test_unaffected_segs_not_rewritten(paths):
    p, untouched, before = paths
    d = f"{p}/doclen/seg={untouched}"
    after = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    assert before == after


def test_overwrite_idempotent_on_replay(spark, paths):
    p, _, _ = paths
    changed = _corpus(spark, marker="needle_mark").where(F.col("doc_id") % 200 == 0)
    overwrite_docs(changed, p)  # same batch: lineage row says done -> no-op
    disk = read_index(spark, p)
    assert disk.stats.agg(F.sum("n_docs")).collect()[0][0] == 256

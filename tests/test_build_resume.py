"""Materialized build: write → read → query parity, checkpoint-resume
(north_rule: resumable from checkpoint with per-partition lineage +
metrics), and bucket-pruned reads."""

import shutil

import pytest

from oni_indexer_spark.index import IndexConfig, build_index, build_to_path, read_index
from oni_indexer_spark.index.lineage import Lineage
from oni_indexer_spark.query import topk

CFG = IndexConfig(block_size=64, n_buckets=8)


@pytest.fixture(scope="module")
def index_path(docs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("idx") / "index")
    # stage_mode="disk": these tests pin the multi-group resumable path
    # (auto would pick cache mode for this tiny corpus)
    build_to_path(docs, p, CFG, bucket_group_size=4, stage_mode="disk")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_materialized_matches_inmemory(spark, docs, index_path):
    mem = build_index(docs, CFG)
    disk = read_index(spark, index_path)
    for q in ["the", "hash join", "scan merge window"]:
        assert _rows(topk(disk, q, k=10)) == _rows(topk(mem, q, k=10))


def test_lineage_metrics(spark, docs, index_path):
    recs = {r["stage"]: r for r in Lineage(spark, index_path).records()}
    assert recs["doclen"]["status"] == "done"
    assert recs["doclen"]["docs_tokenized"] == docs.count()
    post_stages = [s for s in recs if s.startswith("postings_g")]
    assert len(post_stages) == 2  # 8 buckets / group size 4
    assert all(recs[s]["status"] == "done" for s in post_stages)
    assert sum(recs[s]["postings_emitted"] for s in post_stages) > 0
    assert sum(recs[s]["bytes_compressed"] for s in post_stages) > 0


def test_resume_skips_done_stages(spark, docs, index_path):
    """Re-running the build with resume=True must not rewrite anything."""
    import os

    mtimes = {}
    for root, _, files in os.walk(index_path):
        for f in files:
            if f.endswith(".parquet"):
                fp = os.path.join(root, f)
                mtimes[fp] = os.path.getmtime(fp)
    build_to_path(docs, index_path, CFG, bucket_group_size=4, resume=True, stage_mode="disk")
    for fp, m in mtimes.items():
        assert os.path.getmtime(fp) == m, f"rewritten: {fp}"


def test_resume_completes_partial_build(spark, docs, tmp_path):
    """Simulate a crash after the first postings group: delete its lineage
    marker; resume must rebuild exactly the missing groups and the final
    index must answer queries identically."""
    p = str(tmp_path / "index2")
    build_to_path(docs, p, CFG, bucket_group_size=4, stage_mode="disk")
    import os

    os.remove(os.path.join(p, "_lineage", "postings_g0004.json"))
    build_to_path(docs, p, CFG, bucket_group_size=4, resume=True, stage_mode="disk")
    disk = read_index(spark, p)
    mem = build_index(docs, CFG)
    assert _rows(topk(disk, "hash join", k=10)) == _rows(topk(mem, "hash join", k=10))


def test_overlapped_build_cache_mode_complete_and_equal(spark, docs, tmp_path):
    """The r6 overlapped build (doclen ∥ postings ∥ dfreq from one
    materialized tf — guide §2.6) must leave a complete lineage and an
    index identical to the in-memory build, in cache mode (the driver
    bench path)."""
    p = str(tmp_path / "idx_cache")
    build_to_path(docs, p, CFG, bucket_group_size=8, stage_mode="cache")
    recs = {r["stage"]: r for r in Lineage(spark, p).records()}
    for stage in ("doclen", "postings_g0000", "tid_check"):
        assert recs[stage]["status"] == "done", stage
    disk = read_index(spark, p)
    mem = build_index(docs, CFG)
    for q in ["the", "hash join", "scan merge window"]:
        assert _rows(topk(disk, q, k=10)) == _rows(topk(mem, q, k=10))


def test_overlapped_build_propagates_thread_failure(spark, docs, tmp_path, monkeypatch):
    """A failure in the concurrent doclen stage must fail the build (not
    be swallowed by the worker thread)."""
    import oni_indexer_spark.index.build as B

    def boom(*a, **kw):
        raise RuntimeError("doclen boom")

    monkeypatch.setattr(B, "_doclen_from_tf", boom)
    p = str(tmp_path / "idx_fail")
    with pytest.raises(RuntimeError, match="doclen boom"):
        build_to_path(docs, p, CFG, bucket_group_size=8, stage_mode="cache")


def test_bucket_pruning_in_plan(spark, index_path):
    """A single-term query must push the bucket partition filter into the
    postings scan (directory pruning — the 100 TB story)."""
    disk = read_index(spark, index_path)
    from pyspark.sql import functions as F

    from oni_indexer_spark.hashing import term_bucket_py, xxhash64_str

    b = term_bucket_py("the", CFG.n_buckets)
    plan = (
        disk.postings.where((F.col("bucket") == b) & (F.col("tid") == xxhash64_str("the")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan

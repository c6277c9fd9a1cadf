"""Physical-plan audits: the properties that make the engine survive a
100x scale-up must be visible in `.explain` and must not regress.

Query plan contract (query/bm25.py docstring):
  - postings scan is directory-pruned (PartitionFilters on bucket) and
    row-group-pruned (PushedFilters In(term, ...)), reading ONLY
    (term, blob) — no block metadata unless pruning needs it
  - idf enters as a literal map: NO join against dfreq
  - dl travels inside postings: NO join against doclen
  - exactly one shuffle (the doc_id hash aggregation)
  - top-k is TakeOrderedAndProject (heap per partition + merge)
"""

import tempfile

import pytest

from oni_indexer_spark.index import IndexConfig, build_to_path, read_index
from oni_indexer_spark.query import topk

CFG = IndexConfig(block_size=64, n_buckets=8)


@pytest.fixture(scope="module")
def disk_index(spark, docs):
    p = tempfile.mkdtemp(prefix="planidx_") + "/idx"
    build_to_path(docs, p, CFG, bucket_group_size=8)
    return read_index(spark, p)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_query_plan_shape(disk_index):
    plan = _plan(topk(disk_index, "hash join", k=10, prune=False))
    assert "PartitionFilters: [bucket" in plan
    assert "PushedFilters: [In(tid" in plan
    assert "ReadSchema: struct<tid:bigint,blob:binary>" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange") == 1  # only the doc_id score aggregation


def test_build_pushes_column_pruning(spark, docs):
    """The tf stage must read only doc_id+content from the corpus scan."""
    from oni_indexer_spark.index.build import _tf_table

    plan = _plan(_tf_table(docs.select("doc_id", "content"), CFG))
    assert "Exchange" in plan  # the one shuffle: groupBy(term, doc_id)
    # partial aggregation before the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_facet_plan_partial_agg(spark, docs):
    from oni_indexer_spark.query import facet_counts

    plan = _plan(facet_counts(docs, "lang"))
    assert "partial_count" in plan or plan.index("HashAggregate") < plan.index("Exchange")

#!/usr/bin/env python
"""Per-query cost split (guide §1): driver-side plan construction vs
execution vs Spark job count, for the bench query set.

Prints rep-3 numbers (df/fq lookups memoized by then — the regime the
bench's median-of-3 measures). Used in OPTIMIZATION_r06.md to establish
that the remaining per-query cost is plan-build + ONE shuffle (two AQE
jobs) and that zero-result queries run zero jobs.

Usage: python scripts/prof_query_jobs.py
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.environ.get(
    "PROF_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

from oni_indexer_spark.corpus import from_driver_documents  # noqa: E402
from oni_indexer_spark.index import IndexConfig, build_to_path, read_index  # noqa: E402
from oni_indexer_spark.query import topk  # noqa: E402
from oni_indexer_spark.session import get_spark  # noqa: E402

QS = [
    ("q_hot_single", "the", 10, "or", None),
    ("q_two_term", "hash join", 10, "or", None),
    ("q_four_term", "spark batch stream dup", 10, "or", None),
    ("q_k100", "the scan", 100, "or", None),
    ("q_fq_lang", "hash", 10, "or", {"lang": "en"}),
    ("q_zero_result", "zzz_not_in_corpus", 10, "or", None),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof-query-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = from_driver_documents(spark, sf_dir)
    cfg = IndexConfig(block_size=128, n_buckets=32)
    tmp = tempfile.mkdtemp(prefix="profq_")
    path = os.path.join(tmp, "index")
    build_to_path(docs, path, cfg, bucket_group_size=32, resume=False)
    tables = read_index(spark, path)
    topk(tables, "warmup scan", k=5).collect()

    tracker = sc.statusTracker()
    for name, q, k, mode, fq in QS:
        for rep in range(3):
            n0 = max(list(tracker.getJobIdsForGroup(None)) + [-1])
            t0 = time.time()
            df = topk(tables, q, k=k, mode=mode, fq=fq)
            t1 = time.time()
            rows = df.collect()
            t2 = time.time()
            n1 = max(list(tracker.getJobIdsForGroup(None)) + [-1])
            if rep == 2:
                print(
                    f"{name}: plan={1000 * (t1 - t0):.0f}ms "
                    f"exec={1000 * (t2 - t1):.0f}ms jobs={n1 - n0} rows={len(rows)}"
                )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Build-stage dissection harness (guide §1: measure first).

Runs ``build_to_path`` N times over a driver-schema corpus and prints,
per rep, the wall time, the per-stage durations from the build's own
lineage records, and the gap (wall − Σstages — scheduler/meta overhead,
and with the r6 overlapped build a NEGATIVE gap shows stages running
concurrently). This is the harness behind the OPTIMIZATION_r06.md §8
serial-vs-overlap A/B numbers: run it from two checkouts
(``PROF_REPO=/path/to/tree``) interleaved in the same window.

Usage:
  PROF_REPO=/root/repo SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python scripts/prof_build_stages.py [reps]
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
from oni_indexer_spark.index import IndexConfig, build_to_path  # noqa: E402
from oni_indexer_spark.index.lineage import Lineage  # noqa: E402
from oni_indexer_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof-build-stages")
    spark.sparkContext.setLogLevel("ERROR")

    docs = from_driver_documents(spark, sf_dir)
    print("repo", REPO, "n_docs", docs.count())
    cfg = IndexConfig(block_size=128, n_buckets=32)

    for rep in range(reps):
        tmp = tempfile.mkdtemp(prefix="prof_idx_")
        p = os.path.join(tmp, "index")
        t0 = time.time()
        build_to_path(docs, p, cfg, bucket_group_size=32, resume=False)
        wall = time.time() - t0
        recs = {
            r["stage"]: round(r["finished_at"] - r["started_at"], 3)
            for r in Lineage(spark, p).records()
            if r.get("status") == "done" and "finished_at" in r
        }
        gap = wall - sum(recs.values())
        print(f"rep{rep}: wall={wall:.2f} stages={recs} gap={gap:.2f}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

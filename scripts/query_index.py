#!/usr/bin/env python
"""spark-submit entrypoint: BM25 top-k queries against a built index.

  spark-submit --py-files dist/oni_indexer_spark.zip \\
      scripts/query_index.py --index /tmp/idx --query "hash join" [-k 10] \\
      [--mode and] [--fq lang=en] [--no-prune]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, nargs="+")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and"], default="or")
    ap.add_argument("--fq", action="append", default=[], help="col=value filters")
    ap.add_argument("--no-prune", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oni_indexer_spark.index import read_index
    from oni_indexer_spark.query.bm25 import Searcher
    from oni_indexer_spark.session import ship_package

    spark = SparkSession.builder.appName("oni-index-query").getOrCreate()
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    fq = dict(kv.split("=", 1) for kv in args.fq) or None
    s = Searcher(read_index(spark, args.index))
    for q in args.query:
        t0 = time.time()
        rows = s.topk(
            q, k=args.k, mode=args.mode, fq=fq, prune=not args.no_prune and "auto"
        ).collect()
        print(
            json.dumps(
                {
                    "query": q,
                    "sec": round(time.time() - t0, 3),
                    "hits": [
                        {"rank": r["rank"], "doc_id": r["doc_id"], "score": round(r["score"], 6)}
                        for r in rows
                    ],
                }
            )
        )


if __name__ == "__main__":
    main()

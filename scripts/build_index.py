#!/usr/bin/env python
"""spark-submit entrypoint: build (or resume) the inverted index.

Cluster:
  python scripts/make_pyfiles_zip.py
  spark-submit --py-files dist/oni_indexer_spark.zip \\
      scripts/build_index.py --input <parquet/iceberg path> --output <index path> \\
      [--buckets 256] [--block-size 8192] [--group-size 16] [--no-resume]

Local smoke:
  python scripts/build_index.py --input /root/testdata/sf0.01 --output /tmp/idx

The input is one of:
- a directory containing documents.parquet in the driver's shape
  (doc_id, text, lang, source, n_chars),
- an input-hint table (repo, path, commit, lang, content) as a Parquet
  path or an Iceberg catalog identifier (``--format iceberg``,
  ``--snapshot-id`` / ``--as-of-timestamp`` time travel; ``--mint-ids``
  derives deterministic doc_ids from the identity triple), or
- any Parquet table with (doc_id, content [, repo, path, lang]) columns
  (loose fallback).
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--group-size", type=int, default=8)
    ap.add_argument(
        "--analyzer", default="code", choices=["code", "text_en", "text_en_porter"]
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--format", default="auto", choices=["auto", "parquet", "iceberg"])
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--as-of-timestamp", type=int, default=None)
    ap.add_argument("--mint-ids", action="store_true",
                    help="mint doc_id from (repo, path, commit) — see --id-strategy")
    ap.add_argument("--id-strategy", default="dense", choices=["dense", "hash64"],
                    help="dense = global rank of the identity triple (index "
                    "builds need dense ids); hash64 = growth-stable xxhash64 "
                    "(cross-snapshot join key, NOT for index builds)")
    ap.add_argument("--strict-ids", action="store_true",
                    help="verify minted ids are collision-free (one aggregate)")
    ap.add_argument("--limit", type=int, default=None, help="index at most N docs (reference --limit parity)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oni_indexer_spark.corpus import from_driver_documents
    from oni_indexer_spark.index import IndexConfig, build_to_path
    from oni_indexer_spark.session import ship_package

    spark = SparkSession.builder.appName("oni-index-build").getOrCreate()
    ship_package(spark)
    spark.sparkContext.setLogLevel("WARN")

    if os.path.isdir(args.input) and os.path.exists(
        os.path.join(args.input, "documents.parquet")
    ):
        docs = from_driver_documents(spark, args.input)
    else:
        from oni_indexer_spark.sources import load_documents

        try:
            docs = load_documents(
                spark,
                args.input,
                fmt=None if args.format == "auto" else args.format,
                snapshot_id=args.snapshot_id,
                as_of_timestamp=args.as_of_timestamp,
                mint_ids=args.mint_ids,
                strict_ids=args.strict_ids,
                id_strategy=args.id_strategy,
            )
        except ValueError as e:
            if "input hint" not in str(e):
                raise
            # loose fallback: any parquet with (doc_id, content, ...)
            docs = spark.read.parquet(args.input)
    if args.limit:
        docs = docs.where(docs.doc_id < args.limit)

    cfg = IndexConfig(
        block_size=args.block_size, n_buckets=args.buckets, analyzer=args.analyzer
    )
    t0 = time.time()
    build_to_path(
        docs, args.output, cfg, bucket_group_size=args.group_size, resume=not args.no_resume
    )
    n = spark.read.parquet(f"{args.output}/doclen").count()
    dt = time.time() - t0
    print(json.dumps({"docs": n, "build_sec": round(dt, 2), "docs_per_sec": round(n / dt, 1)}))


if __name__ == "__main__":
    main()

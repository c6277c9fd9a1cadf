#!/usr/bin/env python
"""Exact-substring span dedup (Lee et al. 2022 semantics) at non-toy
scale: span_dedup over a 1M-doc corpus with injected full-doc clones
(every doc_id ≡ 1 (mod 50) repeats the previous doc), so ~20k docs
must come back fully covered. One real measurement backing the
"word-count-shaped, no suffix array, no all-pairs" scale claim.

Prints one JSON object:
  {"n_docs", "n", "wall_sec", "docs_touched", "docs_fully_removed",
   "tokens_total", "tokens_removed", "shuffle_mb": {"write", "read"}}

Usage: python scripts/bench_span_dedup.py [--docs 1000000] [--n 20]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs, n = 1_000_000, 20
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.ops.dedup import span_dedup
    from oni_indexer_spark.session import ship_package

    evdir = tempfile.mkdtemp(prefix="ev_span_")
    gen = tempfile.mkdtemp(prefix="span_")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench-span-dedup")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # same injected-duplicate corpus recipe as bench_llm_ops.py
    base = synth_documents(spark, n_docs).select("doc_id", "content")
    prev = base.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("content").alias("prev_content")
    )
    docs = base.join(prev, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 50 == 1) & F.col("prev_content").isNotNull(),
            F.col("prev_content"),
        )
        .otherwise(F.col("content"))
        .alias("content"),
    )
    corpus = os.path.join(gen, "docs.parquet")
    docs.repartition(64).write.parquet(corpus)
    docs = spark.read.parquet(corpus)

    t0 = time.time()
    out = span_dedup(docs, n=n)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("touched"),
        F.sum(
            ((F.col("n_removed") == F.col("n_tokens")) & (F.col("n_tokens") > 0)).cast(
                "long"
            )
        ).alias("fully_removed"),
        F.sum("n_tokens").alias("tokens_total"),
        F.sum("n_removed").alias("tokens_removed"),
    ).collect()[0]
    wall = time.time() - t0

    result = {
        "n_docs": agg["n_docs"],
        "n": n,
        "wall_sec": round(wall, 2),
        "docs_touched": agg["touched"],
        "docs_fully_removed": agg["fully_removed"],
        "tokens_total": agg["tokens_total"],
        "tokens_removed": agg["tokens_removed"],
    }
    spark.stop()

    try:
        sw_total = sr_total = 0
        files = [
            p
            for p in glob.glob(f"{evdir}/**/*", recursive=True)
            if os.path.isfile(p)
            and "appstatus" not in p
            and not os.path.basename(p).startswith(".")
            and not p.endswith(".crc")
        ]
        for path in files:
            for line in open(path, errors="ignore"):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(ev, dict) and ev.get("Event") == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    sw_total += (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    sr_m = m.get("Shuffle Read Metrics") or {}
                    sr_total += sr_m.get("Local Bytes Read", 0) + sr_m.get(
                        "Remote Bytes Read", 0
                    )
        result["shuffle_mb"] = {
            "write": round(sw_total / 1e6, 1),
            "read": round(sr_total / 1e6, 1),
        }
    except Exception as e:  # noqa: BLE001
        result["shuffle_mb"] = f"event-log parse failed: {e}"

    print(json.dumps(result))
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-phase scaling diagnostic for the index build.

Runs each build phase as a separate Spark action at a given parallelism,
reporting wall time + JVM GC pause delta per phase. Used to find the
non-scaling component behind the round-1 efficiency miss (T4=278s,
T16=137s at 1M docs => ~90s Amdahl-serial term).

Usage: python scripts/diag_scaling.py CORPUS_PARQUET CPUS [DOCS]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oni_indexer_spark.index.build import (  # noqa: E402
    IndexConfig,
    _doclen_table,
    _dfreq_table,
    _postings_blocks,
    _tf_table,
)
from oni_indexer_spark.session import get_spark  # noqa: E402


def gc_ms(spark) -> int:
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def main() -> None:
    corpus = sys.argv[1]
    cpus = int(sys.argv[2])
    spark = get_spark(master=f"local[{cpus}]", app_name=f"diag-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(block_size=128, n_buckets=32)
    docs = spark.read.parquet(corpus)
    out = tempfile.mkdtemp(prefix=f"diag_{cpus}_")
    phases = {}

    def phase(name, fn):
        g0, t0 = gc_ms(spark), time.time()
        fn()
        phases[name] = {
            "sec": round(time.time() - t0, 2),
            "gc_ms": gc_ms(spark) - g0,
        }

    n = docs.count()
    phase("doclen", lambda: _doclen_table(docs, cfg).write.mode("overwrite").parquet(f"{out}/doclen"))
    phase("tf_write", lambda: _tf_table(docs, cfg).write.mode("overwrite").parquet(f"{out}/tf"))
    tf = spark.read.parquet(f"{out}/tf")
    phase(
        "postings_encode",
        lambda: _postings_blocks(tf, cfg)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out}/postings"),
    )
    phase(
        "dfreq",
        lambda: _dfreq_table(tf).write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/dfreq"),
    )
    # control: pure JVM compute, no python, no shuffle, no write
    phase(
        "ctl_tokenize_count",
        lambda: docs.select(F.sum(F.size(F.regexp_extract_all(F.lower("content"), F.lit("[a-z0-9_]+"), 0)))).collect(),
    )
    total = sum(p["sec"] for p in phases.values())
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "n_docs": n, "total_sec": round(total, 2), "phases": phases}))


if __name__ == "__main__":
    main()

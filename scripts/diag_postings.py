#!/usr/bin/env python
"""Sub-phase diagnostic for the postings_encode stage (the non-scaling
phase per diag_scaling.py: eff 0.47 from local[4] to local[16]).

Isolates: (a) shuffle+sort, (b) mapInArrow python encode, (c) the
partitionBy(bucket) write, each as its own job over materialized input.

Usage: python scripts/diag_postings.py TF_PARQUET CPUS
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
    _BLOCKS_OUT_SCHEMA,
    _encode_sorted_batches,
    IndexConfig,
)
from oni_indexer_spark.session import get_spark  # noqa: E402


def gc_ms(spark) -> int:
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(b.getCollectionTime() for b in beans)


def main() -> None:
    tf_path = sys.argv[1]
    cpus = int(sys.argv[2])
    spark = get_spark(master=f"local[{cpus}]", app_name=f"diagp-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(block_size=128, n_buckets=32)
    out = tempfile.mkdtemp(prefix=f"diagp_{cpus}_")
    phases = {}

    def phase(name, fn):
        g0, t0 = gc_ms(spark), time.time()
        fn()
        phases[name] = {"sec": round(time.time() - t0, 2), "gc_ms": gc_ms(spark) - g0}

    tf = spark.read.parquet(tf_path)
    tfb = tf.withColumn("block_id", F.floor(F.col("doc_id") / cfg.block_size).cast("long"))
    sel = tfb.select("term", "bucket", "block_id", "doc_id", "tf", "dl")

    # (a) shuffle + sort only (noop sink: count over sorted partitions)
    pre = sel.repartition("term", "block_id").sortWithinPartitions("term", "block_id", "doc_id")
    phase("a_shuffle_sort_count", lambda: pre.write.mode("overwrite").format("noop").save())
    # (a') materialize the sorted input for the next isolations
    phase("a2_sorted_write", lambda: pre.write.mode("overwrite").parquet(f"{out}/sorted"))
    srt = spark.read.parquet(f"{out}/sorted")
    # (b) python encode over pre-sorted input, noop sink
    enc = srt.mapInArrow(_encode_sorted_batches, _BLOCKS_OUT_SCHEMA)
    phase("b_encode_noop", lambda: enc.write.mode("overwrite").format("noop").save())
    # (c) encode + flat parquet write (no partitionBy)
    phase("c_encode_write_flat", lambda: enc.write.mode("overwrite").parquet(f"{out}/flat"))
    # (d) encode + partitionBy(bucket) write
    phase(
        "d_encode_write_partby",
        lambda: enc.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/partby"),
    )
    # (e) full pipeline as build does it (shuffle+sort+encode+partby write)
    full = sel.repartition("term", "block_id").sortWithinPartitions(
        "term", "block_id", "doc_id"
    ).mapInArrow(_encode_sorted_batches, _BLOCKS_OUT_SCHEMA)
    phase(
        "e_full_pipeline",
        lambda: full.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/full"),
    )
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "phases": phases}))


if __name__ == "__main__":
    main()

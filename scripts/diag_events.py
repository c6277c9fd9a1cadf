#!/usr/bin/env python
"""Event-log-based stage breakdown of the postings pipeline.

Runs the full postings stage (shuffle+sort+encode+partitioned write) with
the Spark event log on, then parses per-stage: wall span, sum of task run
time, GC time, python-worker metrics if present, shuffle bytes.

Usage: python scripts/diag_events.py TF_PARQUET CPUS
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from oni_indexer_spark.index.build import (  # noqa: E402
    IndexConfig,
    _postings_blocks,
)
from oni_indexer_spark.session import ship_package  # noqa: E402


def main() -> None:
    tf_path, cpus = sys.argv[1], int(sys.argv[2])
    evdir = tempfile.mkdtemp(prefix=f"ev_{cpus}_")
    out = tempfile.mkdtemp(prefix=f"diagev_{cpus}_")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"diagev-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(block_size=128, n_buckets=32)
    tf = spark.read.parquet(tf_path)
    full = _postings_blocks(tf, cfg)
    t0 = time.time()
    full.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/full")
    wall = time.time() - t0
    spark.stop()

    stages = {}
    files = [p for p in glob.glob(f"{evdir}/**/*", recursive=True) if os.path.isfile(p) and "appstatus" not in p]
    for path in files:
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                s = stages.setdefault(si["Stage ID"], {})
                s["name"] = si["Stage Name"].split("\n")[0][:60]
                s["tasks"] = si["Number of Tasks"]
                s["wall"] = round(
                    (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0, 2
                )
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                s = stages.setdefault(sid, {})
                for key, src in [
                    ("run_s", m.get("Executor Run Time", 0)),
                    ("gc_s", m.get("JVM GC Time", 0)),
                    ("deser_s", m.get("Executor Deserialize Time", 0)),
                    ("result_ser_s", m.get("Result Serialization Time", 0)),
                    ("cpu_s", (m.get("Executor CPU Time", 0)) / 1e6),
                ]:
                    s[key] = round(s.get(key, 0) + src / 1000.0, 1)
                sw = m.get("Shuffle Write Metrics", {})
                sr = m.get("Shuffle Read Metrics", {})
                s["shw_mb"] = round(s.get("shw_mb", 0) + sw.get("Shuffle Bytes Written", 0) / 1e6, 0)
                s["shw_time_s"] = round(s.get("shw_time_s", 0) + sw.get("Shuffle Write Time", 0) / 1e9 / 1000.0 * 1000, 1)
                s["shr_mb"] = round(
                    s.get("shr_mb", 0)
                    + (sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)) / 1e6, 0
                )
                pm = {k: v for k, v in m.items() if "Python" in k}
                if pm:
                    s.setdefault("py", {})
                    for k, v in pm.items():
                        s["py"][k] = s["py"].get(k, 0) + v
    print(json.dumps({"cpus": cpus, "wall": round(wall, 2), "stages": stages}, indent=1))
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()

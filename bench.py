#!/usr/bin/env python
"""Headline benchmark: inverted-index build throughput + BM25 query latency.

Default mode (what the driver runs per round):
  - corpus: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) adapted to the
    input-hint shape
  - master: local[$SPARK_GRAFT_CPUS]
  - builds the full materialized index (tokenize → staged tf → blocked,
    varint-compressed postings + doclen/dfreq/stats, with lineage) into a
    temp dir, then answers the reference query set through the index
  - prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "build_sec": ..., "docs_per_sec": ..., "query_p95_sec": ...}

``--build-only`` prints just build timing (used by the scaling-efficiency
protocol in BENCH/BASELINE.md: same input at local[8] vs local[32]).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

QUERY_SET = [
    ("q_hot_single", "the", 10, "or", None),
    ("q_mid_single", "merge", 10, "or", None),
    ("q_two_term", "hash join", 10, "or", None),
    ("q_two_term_and", "hash join", 10, "and", None),
    ("q_three_term", "window merge sort", 10, "or", None),
    ("q_four_term", "spark batch stream dup", 10, "or", None),
    ("q_rare_plus_hot", "the spark", 10, "or", None),
    ("q_k1", "scan", 1, "or", None),
    ("q_k100", "the scan", 100, "or", None),
    ("q_fq_lang", "hash", 10, "or", {"lang": "en"}),
    ("q_zero_result", "zzz_not_in_corpus", 10, "or", None),
]


def main() -> None:
    build_only = "--build-only" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from oni_indexer_spark.corpus import from_driver_documents
    from oni_indexer_spark.index import IndexConfig, build_to_path, read_index
    from oni_indexer_spark.query import topk
    from oni_indexer_spark.session import get_spark

    spark = get_spark(app_name=f"bench-local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = from_driver_documents(spark, sf_dir)
    n_docs = docs.count()
    cfg = IndexConfig(block_size=128, n_buckets=32)

    # Noise-resistance protocol (r3 VERDICT #1: the host's documented
    # minute-scale noise hit BENCH_r03 at full amplitude): the build runs
    # BUILD_REPS times into fresh dirs and the MIN is reported (min is the
    # right estimator for a fixed-work stage under additive noise); each
    # query runs QUERY_REPS times and the MEDIAN is reported.
    BUILD_REPS = int(os.environ.get("SPARK_GRAFT_BUILD_REPS", "2"))
    QUERY_REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))

    tmp = tempfile.mkdtemp(prefix="oni_index_")
    try:
        build_secs: list[float] = []
        stages: dict[str, float] = {}
        path = ""
        for rep in range(max(1, BUILD_REPS)):
            path = os.path.join(tmp, f"index{rep}")
            t0 = time.time()
            build_to_path(docs, path, cfg, bucket_group_size=32, resume=False)
            build_secs.append(time.time() - t0)
            if build_secs[-1] == min(build_secs):
                # per-stage breakdown from the FASTEST build's lineage
                # (through the same Hadoop-FS lineage reader the engine
                # uses — no os.listdir side-channel, r4 VERDICT)
                from oni_indexer_spark.index.lineage import Lineage

                stages = {
                    rec["stage"]: round(rec["finished_at"] - rec["started_at"], 2)
                    for rec in Lineage(spark, path).records()
                    if rec.get("status") == "done" and "finished_at" in rec
                }
        build_sec = min(build_secs)
        docs_per_sec = n_docs / build_sec

        if build_only:
            print(
                json.dumps(
                    {
                        "mode": "build-only",
                        "cpus": cpus,
                        "sf": sf,
                        "n_docs": n_docs,
                        "build_sec": round(build_sec, 3),
                        "docs_per_sec": round(docs_per_sec, 2),
                        "build_stages": stages,
                    }
                )
            )
            return

        tables = read_index(spark, path)
        # warmup (JVM/codegen), not counted
        topk(tables, "warmup scan", k=5).collect()

        # interleaved reps (whole query set per rep, median per query):
        # a slow minute hits one REP of every query, not one query's
        # entire sample — the median then rejects it
        import statistics

        samples: dict[str, list[float]] = {name: [] for name, *_ in QUERY_SET}
        for _ in range(max(1, QUERY_REPS)):
            for name, q, k, mode, fq in QUERY_SET:
                t0 = time.time()
                topk(tables, q, k=k, mode=mode, fq=fq).collect()
                samples[name].append(time.time() - t0)
        qtimes = {name: round(statistics.median(s), 4) for name, s in samples.items()}

        lat = sorted(qtimes.values())
        p95 = lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)]
        total = round(build_sec + sum(qtimes.values()), 3)
        out = {
            "metric": "index_build_plus_queryset_sec",
            "value": total,
            "unit": "sec",
            "queries": qtimes,
            "sf": sf,
            "n_docs": n_docs,
            "cpus": cpus,
            "build_sec": round(build_sec, 3),
            "docs_per_sec": round(docs_per_sec, 2),
            "build_stages": stages,
            "query_p95_sec": p95,
            "protocol": {
                "build_reps": max(1, BUILD_REPS),
                "build_estimator": "min",
                "build_secs_all": [round(b, 3) for b in build_secs],
                "query_reps": max(1, QUERY_REPS),
                "query_estimator": "median",
            },
        }
        # the sf0.1 corpus (5k docs) is fixed-overhead dominated; attach
        # the latest 1M-doc scaling measurement (scaling_bench.py output,
        # median-of-3 per parallelism level) so round deltas also show
        # data-bound throughput at a non-toy scale
        import glob

        cands = sorted(glob.glob(os.path.join(REPO, "BENCH", "scaling_r[0-9][0-9].json")))
        if cands:
            try:
                with open(cands[-1]) as fh:
                    s = json.load(fh)
                # provenance (r3 ADVICE): these numbers come from a PRIOR
                # scaling_bench run, not this invocation — say which file
                # and when it was measured so stale attachments are visible
                out["scale_1m"] = {
                    "source_file": os.path.basename(cands[-1]),
                    "source_mtime_utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(cands[-1]))
                    ),
                    "n_docs": s.get("n_docs"),
                    "local1_docs_per_sec": s.get("local1", {}).get("docs_per_sec"),
                    "local4_docs_per_sec": s.get("local4", {}).get("docs_per_sec"),
                    "scaling_efficiency": s.get("scaling_efficiency"),
                }
                q1m = s.get("query_1m")
                if q1m:
                    out["scale_1m"]["local32_docs_per_sec"] = q1m.get("docs_per_sec")
                    out["scale_1m"]["query_p95_sec"] = q1m.get("query_p95_sec")
            except Exception:
                pass
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

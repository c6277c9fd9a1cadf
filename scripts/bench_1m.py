#!/usr/bin/env python
"""1M-doc (non-toy) headline numbers: build docs/sec at local[32] + the
bench query set's p95 latency against the materialized index.

The per-round driver bench (sf0.1 = 5k docs) is fixed-overhead
dominated; this gives the data-bound numbers BENCH/BASELINE.md tracks
across rounds. Writes/updates the "query_1m" section of
BENCH/scaling_r{round}.json when --merge-into is given.

Usage: python scripts/bench_1m.py [--docs 1000000] [--merge-into BENCH/scaling_r03.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = 1_000_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])

    from bench import QUERY_SET
    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.index import IndexConfig, build_to_path, read_index
    from oni_indexer_spark.query import topk
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="bench-1m")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="bench1m_")
    corpus = os.path.join(gen, "documents.parquet")
    synth_documents(spark, n_docs).repartition(128).write.mode("overwrite").parquet(corpus)
    docs = spark.read.parquet(corpus)

    path = os.path.join(gen, "index")
    t0 = time.time()
    build_to_path(docs, path, IndexConfig(block_size=128, n_buckets=32),
                  bucket_group_size=32, resume=False)
    build_sec = time.time() - t0

    tables = read_index(spark, path)
    topk(tables, "warmup scan", k=5).collect()
    # interleaved median-of-3 per query (same noise protocol as bench.py)
    import statistics

    samples: dict[str, list[float]] = {name: [] for name, *_ in QUERY_SET}
    for _ in range(3):
        for name, q, k, mode, fq in QUERY_SET:
            t0 = time.time()
            topk(tables, q, k=k, mode=mode, fq=fq).collect()
            samples[name].append(time.time() - t0)
    qtimes = {name: round(statistics.median(s), 4) for name, s in samples.items()}
    lat = sorted(qtimes.values())
    p95 = lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)]

    out = {
        "cpus": 32,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(n_docs / build_sec, 2),
        "queries": qtimes,
        "query_p95_sec": p95,
    }

    if "--phrase" in sys.argv:
        # positional (v5) variant on the same corpus: build-cost premium
        # of the positions stream + phrase-query latency at 1M docs
        ppath = os.path.join(gen, "index_pos")
        t0 = time.time()
        build_to_path(
            docs, ppath,
            IndexConfig(block_size=128, n_buckets=32, positions=True),
            bucket_group_size=32, resume=False,
        )
        pos_build_sec = time.time() - t0
        ptables = read_index(spark, ppath)
        topk(ptables, "warmup scan", k=5, mode="phrase").collect()
        PHRASES = [
            ("ph_two_term", "hash join"),
            ("ph_three_term", "the scan join"),
            ("ph_hot_bigram", "the the"),
        ]
        psamples: dict[str, list[float]] = {name: [] for name, _ in PHRASES}
        for _ in range(3):
            for name, q in PHRASES:
                t0 = time.time()
                topk(ptables, q, k=10, mode="phrase").collect()
                psamples[name].append(time.time() - t0)
        out["phrase_1m"] = {
            "pos_build_sec": round(pos_build_sec, 3),
            "pos_docs_per_sec": round(n_docs / pos_build_sec, 2),
            "pos_build_overhead_x": round(pos_build_sec / build_sec, 2),
            "queries": {
                name: round(statistics.median(s), 4) for name, s in psamples.items()
            },
        }

    print(json.dumps(out))
    if "--merge-into" in sys.argv:
        target = sys.argv[sys.argv.index("--merge-into") + 1]
        with open(target) as fh:
            data = json.load(fh)
        data["query_1m"] = out
        with open(target, "w") as fh:
            json.dump(data, fh)
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""1M-doc latency of the round-5-late discovery + maintenance surfaces:
grouping, facet-on-results, nested facet stats, range facets, suggest,
spellcheck, and delete-by-query (wall time of the staged-swap delete of
~0.8% of the corpus, plus post-delete query health).

Same corpus/protocol as scripts/bench_query_surface.py (synth 1M docs,
local[32], interleaved median-of-3, non-positional v4 index — none of
these surfaces need positions). Run ALONE.

Usage: python scripts/bench_discovery.py [--docs N] [--out BENCH/f.json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = 1_000_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.index import (
        IndexConfig,
        build_to_path,
        delete_docs,
        read_index,
    )
    from oni_indexer_spark.query import group_topk, spellcheck, suggest, topk
    from oni_indexer_spark.query.facets import (
        facet_range,
        facet_stats,
        field_stats,
        query_facet_counts,
    )
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="bench-discovery")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="benchdisc_")
    corpus = os.path.join(gen, "documents.parquet")
    synth_documents(spark, n_docs).repartition(128).write.mode("overwrite").parquet(
        corpus
    )
    docs = spark.read.parquet(corpus)

    path = os.path.join(gen, "index")
    t0 = time.time()
    build_to_path(
        docs,
        path,
        IndexConfig(block_size=128, n_buckets=32),
        bucket_group_size=32,
        resume=False,
    )
    build_sec = time.time() - t0
    tables = read_index(spark, path)

    queries = {
        "q_group_repo": lambda: group_topk(
            tables, "hash join", "repo", k_groups=10, docs_per_group=3
        ),
        "q_query_facet_lang": lambda: query_facet_counts(
            tables, "hash join", "lang", limit=5
        ),
        "q_facet_stats": lambda: facet_stats(tables.doclen, "lang", "dl"),
        "q_facet_range": lambda: facet_range(tables.doclen, "dl", 0, 200, 10),
        "q_field_stats": lambda: field_stats(tables.doclen, "dl"),
        "q_suggest": lambda: suggest(tables, "sn", count=10),
        "q_spellcheck": lambda: spellcheck(tables, "scann", count=5),
    }
    topk(tables, "warmup scan", k=5).collect()
    samples: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(3):
        for name, fn in queries.items():
            t0 = time.time()
            fn().collect()
            samples[name].append(time.time() - t0)
    qtimes = {n: round(statistics.median(v), 4) for n, v in samples.items()}

    # delete-by-query: remove ~0.8% of the corpus by id range (one seg's
    # worth of write amplification)
    from pyspark.sql import functions as F

    condemned = spark.range(max(1, n_docs // 128)).select(
        F.col("id").alias("doc_id")
    )
    t0 = time.time()
    n_del = delete_docs(path, spark, doc_ids=condemned)
    delete_sec = round(time.time() - t0, 3)
    tables2 = read_index(spark, path)
    t0 = time.time()
    topk(tables2, "hash join", k=10).collect()
    post_delete_q = round(time.time() - t0, 4)

    rec = {
        "cpus": 32,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "queries": qtimes,
        "delete_by_query": {
            "docs_removed": n_del,
            "wall_sec": delete_sec,
            "post_delete_query_sec": post_delete_q,
        },
        "protocol": "interleaved median-of-3, fresh 1M synth corpus, v4 index",
    }
    print(json.dumps(rec))
    if out:
        with open(os.path.join(REPO, out), "w") as f:
            f.write(json.dumps(rec) + "\n")
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

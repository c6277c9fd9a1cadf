#!/usr/bin/env python
"""1M-doc latency of the round-5-late boolean + paging surfaces.

Same corpus/protocol as scripts/bench_query_surface.py (synth 1M docs,
local[32], interleaved median-of-3, v5 positional index). Includes a
deliberate shallow-vs-deep contrast: ``q_page_deep_start`` pages to
offset 100k by ranking (what Solr warns about), ``q_page_deep_cursor``
reaches an equally deep page through the keyset predicate — the cursor
number should track page-1 cost, the start= number should not.

Run ALONE (concurrent Spark jobs on this host inflate wall 2x).

Usage: python scripts/bench_boolean_paging.py [--docs N] [--out BENCH/f.json]
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
    from oni_indexer_spark.index import IndexConfig, build_to_path, read_index
    from oni_indexer_spark.query import page, search, topk
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="bench-bool-paging")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="benchbp_")
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
        IndexConfig(block_size=128, n_buckets=32, positions=True),
        bucket_group_size=32,
        resume=False,
    )
    build_sec = time.time() - t0
    tables = read_index(spark, path)

    queries = {
        # fast-path sanity: the parser dispatch must not tax plain queries
        "q_bool_fast_or": lambda: search(tables, "hash join", k=10),
        "q_or_baseline": lambda: topk(tables, "hash join", k=10),
        # term-only compositor: MUST AND-pass + SHOULD OR-pass + NOT set
        "q_bool_terms": lambda: search(tables, "+hash -scan merge", k=10),
        # the driver-window query: + phrase clause + filter
        "q_bool_full": lambda: search(
            tables, '+hash -scan merge "hash join"~2 lang:en', k=10
        ),
        "q_page_score_p2": lambda: page(tables, "hash join", rows=10, start=10),
        "q_page_field": lambda: page(
            tables, "hash join", rows=10, sort=[("dl", "desc")]
        ),
        "q_page_deep_start": lambda: page(
            tables, "hash join", rows=10, start=100_000
        ),
        "q_page_deep_cursor": lambda: page(
            tables, "hash join", rows=10, sort=[("dl", "desc")],
            cursor=(64, 500_000),
        ),
    }
    topk(tables, "warmup scan", k=5).collect()
    samples: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(3):
        for name, fn in queries.items():
            t0 = time.time()
            fn().collect()
            samples[name].append(time.time() - t0)
    qtimes = {n: round(statistics.median(v), 4) for n, v in samples.items()}
    rec = {
        "cpus": 32,
        "n_docs": n_docs,
        "build_sec_v5": round(build_sec, 3),
        "queries": qtimes,
        "deep_cursor_vs_page1_x": round(
            qtimes["q_page_deep_cursor"] / max(qtimes["q_page_field"], 1e-9), 2
        ),
        "protocol": "interleaved median-of-3, fresh 1M synth corpus, v5 positional index",
    }
    print(json.dumps(rec))
    if out:
        with open(os.path.join(REPO, out), "w") as f:
            f.write(json.dumps(rec) + "\n")
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

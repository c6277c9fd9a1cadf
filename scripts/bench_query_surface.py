#!/usr/bin/env python
"""1M-doc latency of the round-5-late query surface: prefix, fuzzy,
negated/range fq, phrase, phrase+fq, snippets, MoreLikeThis.

Same corpus/protocol as scripts/bench_1m.py (synth 1M docs, local[32],
interleaved median-of-3 per query, v5 positional index so phrase rows
run too). Run ALONE — concurrent Spark jobs on this host show up as
2x wall (measured: a bench.py smoke running beside bench_1m inflated
its build 92s -> 179s).

Usage: python scripts/bench_query_surface.py [--docs 1000000] [--out BENCH/file.json]
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
    from oni_indexer_spark.query import (
        fuzzy_topk,
        more_like_this,
        prefix_topk,
        snippet_topk,
        topk,
    )
    from oni_indexer_spark.query.bm25 import searcher_for
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="bench-query-surface")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="benchqs_")
    corpus = os.path.join(gen, "documents.parquet")
    synth_documents(spark, n_docs).repartition(128).write.mode("overwrite").parquet(
        corpus
    )
    docs = spark.read.parquet(corpus)

    path = os.path.join(gen, "index")
    t0 = time.time()
    # positions=True: the phrase rows need v5; everything else rides the
    # same index (positions are a separate stream, non-positional
    # queries skip it)
    build_to_path(
        docs,
        path,
        IndexConfig(block_size=128, n_buckets=32, positions=True),
        bucket_group_size=32,
        resume=False,
    )
    build_sec = time.time() - t0
    tables = read_index(spark, path)
    s = searcher_for(tables)

    queries = {
        "q_prefix_s": lambda: prefix_topk(tables, "s", k=10),
        "q_fuzzy_scann": lambda: fuzzy_topk(tables, "scann", k=10),
        "q_fq_not": lambda: topk(tables, "hash", k=10, fq={"lang": ("neq", "en")}),
        "q_fq_range": lambda: topk(
            tables, "hash", k=10, fq={"dl": ("range", 40, 120)}
        ),
        "q_phrase": lambda: topk(tables, "hash join", k=10, mode="phrase"),
        "q_phrase_fq": lambda: s._phrase_topk("hash join", 10, fq={"lang": "en"}),
        "q_snippets": lambda: snippet_topk(tables, docs, "hash join", k=10, window=5),
        "q_mlt": lambda: more_like_this(tables, docs, 42, k=10),
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
        "docs_per_sec_v5": round(n_docs / build_sec, 2),
        "queries": qtimes,
        "query_p95_sec": round(
            sorted(qtimes.values())[max(0, int(0.95 * len(qtimes)) - 1)], 4
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

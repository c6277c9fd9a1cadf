#!/usr/bin/env python
"""1M-doc latency of the round-5-latest query surfaces: SynonymQuery,
boost function (bf), ReRank, pivot facets, facet.query buckets, and a
compound boolean query with the cross-clause MUST-block pushdown.

Same corpus/protocol as scripts/bench_query_surface.py (fresh synth 1M
docs, local[32], interleaved median-of-3). Run ALONE — concurrent
Spark jobs on this host show up as 2x wall.

Usage: python scripts/bench_rescore_surface.py [--docs 1000000] [--out BENCH/file.json]
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
    from oni_indexer_spark.query import search, topk
    from oni_indexer_spark.query.facets import facet_pivot, facet_query
    from oni_indexer_spark.query.rescore import boost_topk, rerank_topk
    from oni_indexer_spark.query.synonyms import synonym_topk
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="bench-rescore-surface")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="benchrs_")
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
        # reference points within the same window
        "q_or_baseline": lambda: topk(tables, "hash join", k=10),
        "q_synonyms": lambda: synonym_topk(
            tables, [["join", "merge"], "hash"], k=10
        ),
        "q_boost_dl": lambda: boost_topk(
            tables, "hash join", "dl", k=10, weight=0.5
        ),
        "q_rerank": lambda: rerank_topk(
            tables, "the", "hash join", k=10, rerank_docs=50, weight=2.0
        ),
        "q_facet_pivot": lambda: facet_pivot(docs, "lang", "repo",
                                             limit=4, sublimit=3),
        "q_facet_query": lambda: facet_query(
            tables, "the",
            {"hash_and_join": "hash join", "merge_and_scan": "merge scan"},
            mode="or", sub_mode="and",
        ),
        "q_bool_must_pushdown": lambda: search(
            tables, "+snake_case_14792 merge the", k=10
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
        "docs_per_sec_v5": round(n_docs / build_sec, 2),
        "queries": qtimes,
        "protocol": "interleaved median-of-3, fresh 1M synth corpus, v5 positional index",
    }
    print(json.dumps(rec))
    if out:
        with open(os.path.join(REPO, out), "w") as f:
            f.write(json.dumps(rec) + "\n")
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

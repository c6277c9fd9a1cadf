#!/usr/bin/env python
"""Measure the block-max-prune crossover on a 1M-doc index.

``Searcher.prune_cost_threshold`` trades a fixed pass-1 job (block-max
scan over dfreq-bucketed block stats) against straight decode of every
posting. The threshold is a MEASURED constant: it moved when the varint
codec got ~5x faster (round 5), so this script re-derives it rather than
trusting the old 2-3M postings/s figure.

For each bench query it times ``topk`` with prune forced OFF and forced
ON (interleaved median of 3 each) and prints est = Σ df(term) next to
both medians: the threshold belongs where the ON column starts winning.

Usage: python scripts/calibrate_prune.py [--docs 1000000]
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

    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.index import IndexConfig, build_to_path, read_index
    from oni_indexer_spark.query.bm25 import Searcher
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="calibrate-prune")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="calib_")
    corpus = os.path.join(gen, "documents.parquet")
    synth_documents(spark, n_docs).repartition(128).write.mode("overwrite").parquet(corpus)
    path = os.path.join(gen, "index")
    t0 = time.time()
    build_to_path(spark.read.parquet(corpus), path,
                  IndexConfig(block_size=128, n_buckets=32),
                  bucket_group_size=32, resume=False)
    build_sec = round(time.time() - t0, 1)

    tables = read_index(spark, path)
    searcher = Searcher(tables)
    searcher.topk("warmup scan", k=5).collect()

    queries = [
        ("q_two_term", "hash join"),
        ("q_three_term", "window merge sort"),
        ("q_four_term", "the scan hash join"),
        ("q_hot_pair", "the scan"),
    ]
    samples: dict[tuple, list[float]] = {}
    for _ in range(3):
        for name, q in queries:
            for prune in (False, True):
                t0 = time.time()
                searcher.topk(q, k=10, prune=prune).collect()
                samples.setdefault((name, prune), []).append(time.time() - t0)

    out = {"n_docs": n_docs, "build_sec": build_sec, "queries": {}}
    for name, q in queries:
        # analyze exactly as Searcher.topk does (r5 ADVICE: raw q.split()
        # can diverge from the analyzed terms the auto-prune gate costs)
        from oni_indexer_spark.analyzer import query_terms

        est = sum(
            searcher.term_dfs(query_terms(q, searcher.tables.cfg.analyzer)).values()
        )
        off = round(statistics.median(samples[(name, False)]), 3)
        on = round(statistics.median(samples[(name, True)]), 3)
        out["queries"][name] = {
            "est_postings": est,
            "prune_off_sec": off,
            "prune_on_sec": on,
            "prune_wins": on < off,
        }
    print(json.dumps(out))
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

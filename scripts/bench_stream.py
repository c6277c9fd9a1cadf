#!/usr/bin/env python
"""Streaming E2E at non-toy scale (r3 VERDICT #8): micro-batch append
throughput + post-append query latency + exactness vs a batch rebuild.

Shape: build a base index over n_base synthetic docs, then stream
n_stream more docs through Structured Streaming (file source,
maxFilesPerTrigger=1 → one append segment per file slice, slices written
in doc-id order so the append contract min(new) > max(existing) holds),
via streaming.stream_index → foreachBatch → append_to_index. Reports:

  {"stream_docs_per_sec": ..., "n_batches": ..., "query_p95_sec": ...,
   "compact": {...}, "exact_vs_rebuild": true|false}

After the post-append measurement the index is COMPACTED
(index.build.compact_index — r4 VERDICT #1/#5) and the query set
re-measured, so the record shows the segment-fragmentation cost and how
much of it the merge recovers (files/segments before+after, p95
before+after). exact_vs_rebuild runs against the COMPACTED index — the
full pipeline (stream → append segments → merge) must stay
rank/rounded-score-identical to a from-scratch build over base+streamed.

With --compact-every K, streaming instead runs the INLINE
background-merge policy (stream_index(compact_every=K)): merges are
amortized into the ingest, the post-hoc compaction pass is skipped
(only a final catch-up merge if segments remain), and stream_sec shows
the policy's amortized cost directly.

Usage: python scripts/bench_stream.py [--base 100000] [--stream 100000]
       [--compact-every K]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_base, n_stream, n_slices = 100_000, 100_000, 10
    if "--base" in sys.argv:
        n_base = int(sys.argv[sys.argv.index("--base") + 1])
    if "--stream" in sys.argv:
        n_stream = int(sys.argv[sys.argv.index("--stream") + 1])
    compact_every = None
    if "--compact-every" in sys.argv:
        compact_every = int(sys.argv[sys.argv.index("--compact-every") + 1])

    from pyspark.sql import functions as F

    from bench import QUERY_SET
    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.index import IndexConfig, build_index, build_to_path, read_index
    from oni_indexer_spark.query import topk
    from oni_indexer_spark.session import get_spark
    from oni_indexer_spark.streaming import stream_index

    spark = get_spark(master="local[32]", app_name="bench-stream")
    spark.sparkContext.setLogLevel("ERROR")

    gen = tempfile.mkdtemp(prefix="benchstream_")
    corpus = os.path.join(gen, "documents.parquet")
    synth_documents(spark, n_base + n_stream).repartition(64).write.parquet(corpus)
    docs = spark.read.parquet(corpus)
    base = docs.where(F.col("doc_id") < n_base)

    cfg = IndexConfig(block_size=128, n_buckets=32)
    idx = os.path.join(gen, "index")
    build_to_path(base, idx, cfg, bucket_group_size=32, resume=False)

    # doc-id-ordered file slices: one file per slice, written sequentially
    # so the file source's mtime ordering matches the append contract
    src = os.path.join(gen, "stream_src")
    chunk = (n_stream + n_slices - 1) // n_slices
    for i in range(n_slices):
        lo = n_base + i * chunk
        hi = min(n_base + n_stream, lo + chunk)
        if lo >= hi:
            break
        (
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    t0 = time.time()
    q = stream_index(
        stream, idx, os.path.join(gen, "ckpt"), compact_every=compact_every
    )
    q.awaitTermination()
    stream_sec = time.time() - t0

    from oni_indexer_spark.index.lineage import Lineage

    n_batches = sum(
        1 for r in Lineage(spark, idx).records() if r["stage"].startswith("append_stream")
    )

    def measure_queries(tables):
        topk(tables, "warmup scan", k=5).collect()
        samples: dict[str, list[float]] = {name: [] for name, *_ in QUERY_SET}
        for _ in range(3):
            for name, qq, k, mode, fq in QUERY_SET:
                t0 = time.time()
                topk(tables, qq, k=k, mode=mode, fq=fq).collect()
                samples[name].append(time.time() - t0)
        qtimes = {name: round(statistics.median(s), 4) for name, s in samples.items()}
        lat = sorted(qtimes.values())
        return qtimes, lat[min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)]

    tables = read_index(spark, idx)
    qtimes, p95 = measure_queries(tables)

    # --- compaction pass (r4 VERDICT #5): merge the append segments and
    # re-measure the same query set on the consolidated layout
    from oni_indexer_spark.index import compact_index

    t0 = time.time()
    cmetrics = compact_index(idx, spark) if not compact_every else (
        compact_index(idx, spark, batch_id="final") or {}
    )
    compact_sec = time.time() - t0
    tables = read_index(spark, idx)
    qtimes_c, p95_c = measure_queries(tables)

    # exactness: streamed-and-appended index vs a from-scratch rebuild
    full = build_index(docs, cfg)
    full.postings.cache().count()
    full.dfreq.cache().count()

    def rows(t, qq, k, mode, fq):
        return [
            (r["rank"], r["doc_id"], round(r["score"], 6))
            for r in topk(t, qq, k=k, mode=mode, fq=fq).orderBy("rank").collect()
        ]

    exact = True
    for name, qq, k, mode, fq in QUERY_SET:
        if rows(tables, qq, k, mode, fq) != rows(full, qq, k, mode, fq):
            exact = False
            print(f"MISMATCH {name}", file=sys.stderr)

    print(
        json.dumps(
            {
                "cpus": 32,
                "n_base": n_base,
                "n_stream": n_stream,
                "n_batches": n_batches,
                "compact_every": compact_every,
                "n_auto_compactions": sum(
                    1
                    for r in Lineage(spark, idx).records()
                    if r["stage"].startswith("compact_auto")
                ),
                "stream_sec": round(stream_sec, 3),
                "stream_docs_per_sec": round(n_stream / stream_sec, 2),
                "queries": qtimes,
                "query_p95_sec": p95,
                "compact": {
                    "compact_sec": round(compact_sec, 3),
                    **cmetrics,
                    "queries": qtimes_c,
                    "query_p95_sec": p95_c,
                },
                "exact_vs_rebuild": exact,
            }
        )
    )
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

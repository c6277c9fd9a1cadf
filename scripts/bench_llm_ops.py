#!/usr/bin/env python
"""LLM-pipeline ops at non-toy scale (r4 VERDICT #7): MinHash-LSH dedup
over a 1M-doc corpus and the materialized ANN index over 100k embeddings,
with shuffle volume from the Spark event log — one real measurement
backing the "bucketed, not all-pairs" scale-shape claims.

Corpus: the deterministic synthetic generator plus injected duplicates
(every doc_id ≡ 1 (mod 50) clones the previous doc's content), so the
LSH verifier has ~20k true pairs to confirm. Embeddings: 100k
deterministic 64-dim vectors (pure hash functions of (vec_id, j)).

Prints one JSON object:
  {"n_docs": ..., "lsh": {"wall_sec", "n_pairs", "all_pairs_would_be"},
   "ann": {"build_wall_sec", "probe_median_sec", "recall_at_10"},
   "shuffle": {"phase": {"write_mb", "read_mb"}}}

Usage: python scripts/bench_llm_ops.py [--docs 1000000] [--vecs 100000]
"""

from __future__ import annotations

import glob
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
    n_docs, n_vecs = 1_000_000, 100_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--vecs" in sys.argv:
        n_vecs = int(sys.argv[sys.argv.index("--vecs") + 1])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.ops.dedup import minhash_lsh_pairs
    from oni_indexer_spark.ops.similarity import ann_topk, build_ann_index, cosine_topk
    from oni_indexer_spark.session import ship_package

    evdir = tempfile.mkdtemp(prefix="ev_llmops_")
    gen = tempfile.mkdtemp(prefix="llmops_")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench-llm-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        # plain-text single-file log: Spark 4 defaults to zstd rolling
        # logs, which the parser below can't read
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    phases: list[tuple[str, float, float]] = []

    # --- corpus with injected duplicates (deterministic)
    base = synth_documents(spark, n_docs).select("doc_id", "content")
    prev = base.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("content").alias("prev_content")
    )
    docs = (
        base.join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 50 == 1) & F.col("prev_content").isNotNull(),
                F.col("prev_content"),
            )
            .otherwise(F.col("content"))
            .alias("content"),
        )
    )
    corpus = os.path.join(gen, "docs.parquet")
    docs.repartition(64).write.parquet(corpus)
    docs = spark.read.parquet(corpus)

    # --- MinHash-LSH near-dup pairs over 1M docs
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, n_hashes=12, bands=4, n=3, threshold=0.5)
    n_pairs = pairs.count()
    lsh_wall = time.time() - t0
    phases.append(("lsh", t0, time.time()))

    # --- embeddings + materialized ANN index
    dim, n_probes = 64, 20
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.abs(F.xxhash64(F.lit(7), F.col("id"), j)) % 2001) / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )
    epath = os.path.join(gen, "emb.parquet")
    emb.repartition(16).write.parquet(epath)
    emb = spark.read.parquet(epath)
    apath = os.path.join(gen, "ann")
    t0 = time.time()
    build_ann_index(emb, apath, n_planes=8)
    ann_build = time.time() - t0
    phases.append(("ann_build", t0, time.time()))

    def qvec(s: int) -> list[float]:
        return [(((s * 1_000_003 + j * 97) % 2001) / 1000.0 - 1.0) for j in range(dim)]

    # probe at Hamming radius 0 (1 bucket) and 1 (1 + n_planes buckets):
    # the recall/latency trade-off of multi-probe on this (worst-case,
    # uniform-random) embedding distribution
    t0 = time.time()
    probe_stats = {}
    for radius in (0, 1):
        lat, hits = [], 0
        for s in range(n_probes):
            qv = qvec(s)
            t1 = time.time()
            approx = [
                r["vec_id"]
                for r in ann_topk(
                    spark, apath, qv, k=10, n_planes=8, probes_radius=radius
                ).collect()
            ]
            lat.append(time.time() - t1)
            exact = [r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()]
            hits += len(set(approx) & set(exact))
        probe_stats[f"radius_{radius}"] = {
            "probe_median_sec": round(statistics.median(lat), 3),
            "recall_at_10": round(hits / (10 * n_probes), 3),
        }
    phases.append(("ann_probe", t0, time.time()))

    # --- IVF vs hyperplane LSH on a CLUSTERED embedding table (the
    # realistic regime: real text/image embeddings are strongly
    # clustered; the uniform-random table above is the worst case for
    # ANY partitioning ANN). 100 deterministic unit centers, members =
    # center + 0.35·noise, queries drawn the same way (in-distribution).
    from oni_indexer_spark.ops.similarity import (
        build_ivf_index,
        ivf_index_topk,
        lsh_bucket_topk,
    )

    n_centers = 100

    def _hx(*cols):
        return (F.abs(F.xxhash64(*cols)) % 2001) / 1000.0 - 1.0

    cemb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                _hx(F.lit(11), F.col("id") % n_centers, j)
                + 0.35 * _hx(F.lit(13), F.col("id"), j)
            ).cast("float"),
        ).alias("embedding"),
    )
    cpath = os.path.join(gen, "cemb.parquet")
    cemb.repartition(16).write.parquet(cpath)
    cemb = spark.read.parquet(cpath)

    nlist = 64
    t0 = time.time()
    ivf_path = os.path.join(gen, "ivf")
    build_ivf_index(cemb, ivf_path, nlist=nlist, iters=1)
    ivf_build = time.time() - t0
    phases.append(("ivf_build", t0, time.time()))

    # in-distribution queries: an actual member vector of cluster s plus
    # fresh small noise (a new point near the same center — what a real
    # embedding lookup looks like; deterministic via md5)
    import hashlib

    member_rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in cemb.where(F.col("vec_id") < n_probes).collect()
    }

    def _noise_py(seed: int, a: int, j: int) -> float:
        h = int(hashlib.md5(f"{seed}:{a}:{j}".encode()).hexdigest()[:8], 16)
        return (h % 2001) / 1000.0 - 1.0

    def cquery(s: int) -> list[float]:
        base_v = member_rows[s]
        return [base_v[j] + 0.15 * _noise_py(17, s, j) for j in range(dim)]

    t0 = time.time()
    ivf_stats = {}
    exact_cache: dict[int, list[int]] = {}
    for nprobe in (4, 8):
        lat, hits = [], 0
        for s in range(n_probes):
            qv = cquery(s)
            t1 = time.time()
            approx = [
                r["vec_id"]
                for r in ivf_index_topk(
                    spark, ivf_path, qv, k=10, nprobe=nprobe
                ).collect()
            ]
            lat.append(time.time() - t1)
            if s not in exact_cache:
                exact_cache[s] = [
                    r["vec_id"] for r in cosine_topk(cemb, qv, k=10).collect()
                ]
            hits += len(set(approx) & set(exact_cache[s]))
        ivf_stats[f"nprobe_{nprobe}"] = {
            "scan_fraction": round(nprobe / nlist, 4),
            "probe_median_sec": round(statistics.median(lat), 3),
            "recall_at_10": round(hits / (10 * n_probes), 3),
        }
    # LSH head-to-head on the SAME clustered table, radius 1 (9 of 256
    # sign buckets ≈ 3.5% of the data — similar scan budget to nprobe=4)
    lat, hits = [], 0
    lsh_clustered_path = os.path.join(gen, "ann_clustered")
    build_ann_index(cemb, lsh_clustered_path, n_planes=8)
    for s in range(n_probes):
        qv = cquery(s)
        t1 = time.time()
        approx = [
            r["vec_id"]
            for r in ann_topk(
                spark, lsh_clustered_path, qv, k=10, n_planes=8, probes_radius=1
            ).collect()
        ]
        lat.append(time.time() - t1)
        hits += len(set(approx) & set(exact_cache[s]))
    ivf_stats["lsh_radius1_same_table"] = {
        "probe_median_sec": round(statistics.median(lat), 3),
        "recall_at_10": round(hits / (10 * n_probes), 3),
    }
    phases.append(("ivf_probe", t0, time.time()))

    spark.stop()

    result = {
        "cpus": 32,
        "n_docs": n_docs,
        "lsh": {
            "n_hashes": 12,
            "bands": 4,
            "threshold": 0.5,
            "wall_sec": round(lsh_wall, 1),
            "n_pairs": n_pairs,
            "all_pairs_would_be": n_docs * (n_docs - 1) // 2,
        },
        "ann": {
            "n_vecs": n_vecs,
            "dim": dim,
            "n_planes": 8,
            "build_wall_sec": round(ann_build, 2),
            **probe_stats,
        },
        "ivf_clustered": {
            "n_vecs": n_vecs,
            "dim": dim,
            "n_centers": n_centers,
            "nlist": nlist,
            "train_iters": 1,
            "build_wall_sec": round(ivf_build, 2),
            **ivf_stats,
        },
    }

    # --- shuffle volume per phase from the event log (stages attributed
    # by submission-time window); best-effort — a parse failure must not
    # lose the timing results above
    try:
        shuffle = {name: {"write_mb": 0.0, "read_mb": 0.0} for name, *_ in phases}
        files = [
            p
            for p in glob.glob(f"{evdir}/**/*", recursive=True)
            if os.path.isfile(p)
            and "appstatus" not in p
            and not os.path.basename(p).startswith(".")  # .crc sidecars are binary
            and not p.endswith(".crc")
        ]
        stage_phase: dict[int, str] = {}
        task_rows = []
        for path in files:
            for line in open(path, errors="ignore"):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time", 0) / 1000.0
                    for name, a, b in phases:
                        if a <= sub <= b:
                            stage_phase[si["Stage ID"]] = name
                            break
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    sw = (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    sr_m = m.get("Shuffle Read Metrics") or {}
                    sr = sr_m.get("Local Bytes Read", 0) + sr_m.get(
                        "Remote Bytes Read", 0
                    )
                    task_rows.append((ev["Stage ID"], sw, sr))
        for sid, sw, sr in task_rows:
            name = stage_phase.get(sid)
            if name:
                shuffle[name]["write_mb"] = round(
                    shuffle[name]["write_mb"] + sw / 1e6, 1
                )
                shuffle[name]["read_mb"] = round(shuffle[name]["read_mb"] + sr / 1e6, 1)
        result["shuffle_mb_by_phase"] = shuffle
    except Exception as e:  # noqa: BLE001
        result["shuffle_mb_by_phase"] = f"event-log parse failed: {e}"

    print(json.dumps(result))
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(gen, ignore_errors=True)


if __name__ == "__main__":
    main()

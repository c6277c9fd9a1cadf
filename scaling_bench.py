#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.json north_rule).

A real N-vs-4N-executor cluster is not available in this sandbox, so the
rule's two-cluster-size criterion is evidenced the sanctioned way: the
SAME index build over the SAME deterministic corpus at two parallelism
levels — local[8] (N) and local[32] (4N) — measuring indexing throughput
and reporting efficiency = T(4N) / (4 · T(N)).

Each measurement runs in a fresh subprocess (fresh JVM — Spark can't
change master in-process). The corpus is synthesized deterministically
(corpus.synth_documents, seed 42) at a size where compute dominates JVM
fixed costs, then written once to a temp parquet both runs read.

Usage:  python scaling_bench.py [--docs 200000]
Emits one JSON line and (with --update-md) rewrites the results table in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = """
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
from oni_indexer_spark.session import get_spark
from oni_indexer_spark.index import IndexConfig, build_to_path
spark = get_spark(master="local[{cpus}]", app_name="scaling-{cpus}")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})
n = docs.count()
out = tempfile.mkdtemp(prefix="scal_idx_")
t0 = time.time()
build_to_path(docs, out + "/index", IndexConfig(block_size=128, n_buckets=32),
              bucket_group_size=32, resume=False)
dt = time.time() - t0
import shutil; shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cpus": {cpus}, "n_docs": n, "build_sec": round(dt, 3),
                   "docs_per_sec": round(n / dt, 2)}}))
"""


def _run(cpus: int, corpus: str) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, corpus=corpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child local[{cpus}] failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = 200_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])

    # Materialize the deterministic corpus once; both runs read the same files.
    gen = tempfile.mkdtemp(prefix="scal_corpus_")
    corpus = os.path.join(gen, "documents.parquet")
    sys.path.insert(0, REPO)
    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    synth_documents(spark, n_docs).repartition(64).write.mode("overwrite").parquet(corpus)
    spark.stop()

    r8 = _run(8, corpus)
    r32 = _run(32, corpus)
    eff = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    result = {
        "protocol": "same input, local[8] (N) vs local[32] (4N), fresh JVM each",
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 4),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    if "--update-md" in sys.argv:
        md = f"""
## Scaling efficiency — measured {_today()}

Protocol (north_rule's two-cluster-size criterion, sandbox form): the same
index build over the same deterministic synthetic corpus
(`corpus.synth_documents`, seed 42, {n_docs:,} docs, written once as
parquet) at two parallelism levels, each in a fresh JVM.

| parallelism | build_sec | docs/sec |
|---|---|---|
| local[8]  (N)  | {r8["build_sec"]} | {r8["docs_per_sec"]} |
| local[32] (4N) | {r32["build_sec"]} | {r32["docs_per_sec"]} |

**Scaling efficiency = {r32["docs_per_sec"]} / (4 x {r8["docs_per_sec"]}) =
{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).
"""
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
            fh.write(md.strip() + "\n")

    import shutil

    shutil.rmtree(gen, ignore_errors=True)


def _today() -> str:
    import datetime

    return datetime.date.today().isoformat()


if __name__ == "__main__":
    main()

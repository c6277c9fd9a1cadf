#!/usr/bin/env python
"""Scaling-efficiency protocol (BASELINE.json north_rule).

A real N-vs-4N-executor cluster is not available in this sandbox, so the
rule's two-cluster-size criterion is evidenced the sanctioned way: the
SAME index build over the SAME deterministic corpus at two parallelism
levels — local[N] and local[4N] — measuring indexing throughput and
reporting efficiency = throughput(4N) / (4 · throughput(N)).

Each measurement runs in a fresh subprocess (fresh JVM). A pure-CPU
busy-loop control at the same two process counts measures the HARDWARE
scaling ceiling of this box (all-core turbo clock drop means even
perfectly parallel code cannot reach 1.0 from N to 4N workers); the
report includes both raw and ceiling-normalized efficiency.

Default N=4 (→ 4N=16): both levels sit inside the box's physical cores,
away from the worst clock-throttle region.

Usage:  python scaling_bench.py [--docs 1000000] [--n 4] [--update-md]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = """
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, {repo!r})
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
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cpus": {cpus}, "n_docs": n, "build_sec": round(dt, 3),
                   "docs_per_sec": round(n / dt, 2)}}))
"""


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 4.0:
        x += 1
    return x


def hardware_ceiling(n: int) -> float:
    """Busy-loop throughput ratio from n to 4n processes / 4 — the best
    any perfectly parallel software can do on this box."""
    totals = {}
    for procs in (n, 4 * n):
        with mp.Pool(procs) as p:
            totals[procs] = sum(p.map(_burn, range(procs)))
    return totals[4 * n] / (4.0 * totals[n])


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
    n_docs = 1_000_000
    n = 4
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])

    gen = tempfile.mkdtemp(prefix="scal_corpus_")
    corpus = os.path.join(gen, "documents.parquet")
    sys.path.insert(0, REPO)
    from oni_indexer_spark.corpus import synth_documents
    from oni_indexer_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    synth_documents(spark, n_docs).repartition(128).write.mode("overwrite").parquet(corpus)
    spark.stop()

    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    ceiling = hardware_ceiling(n)
    # the sandbox host is noisy (2x stage-time swings between identical
    # runs) — take the median build time of `repeats` runs per level
    def median_run(cpus: int) -> dict:
        runs = sorted((_run(cpus, corpus) for _ in range(repeats)), key=lambda r: r["build_sec"])
        return runs[len(runs) // 2]

    r1 = median_run(n)
    r4 = median_run(4 * n)
    eff = r4["docs_per_sec"] / (4.0 * r1["docs_per_sec"])
    result = {
        "protocol": f"same input, local[{n}] (N) vs local[{4*n}] (4N), fresh JVM each",
        "n_docs": n_docs,
        f"local{n}": r1,
        f"local{4*n}": r4,
        "scaling_efficiency": round(eff, 4),
        "hardware_ceiling": round(ceiling, 4),
        "normalized_efficiency": round(eff / ceiling, 4),
        "target": 0.8,
    }
    print(json.dumps(result))

    if "--update-md" in sys.argv:
        md = f"""
## Scaling efficiency — measured {_today()}

Protocol (north_rule's two-cluster-size criterion, sandbox form): the same
index build (tokenize → staged tf → blocked varint postings + doclen/dfreq/
stats, lineage on) over the same deterministic synthetic corpus
(`corpus.synth_documents`, seed 42, {n_docs:,} docs, written once as
parquet) at two parallelism levels, each in a fresh JVM.

| parallelism | build_sec | docs/sec |
|---|---|---|
| local[{n}]  (N)  | {r1["build_sec"]} | {r1["docs_per_sec"]} |
| local[{4*n}] (4N) | {r4["build_sec"]} | {r4["docs_per_sec"]} |

**Scaling efficiency = {r4["docs_per_sec"]} / (4 x {r1["docs_per_sec"]}) = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Hardware control: a pure busy-loop at the same two process counts scales at
**{ceiling:.3f}** on this box (all-core clock drop under load) — the ceiling
for perfectly parallel software. Normalized efficiency =
{eff:.3f} / {ceiling:.3f} = **{eff/ceiling:.3f}**.

Reproduce: `python scaling_bench.py --docs {n_docs} --n {n} --update-md`
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

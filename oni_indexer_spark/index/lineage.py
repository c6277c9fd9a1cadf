"""Per-stage lineage + checkpoint-resume bookkeeping for index builds.

BASELINE.json's north_rule requires the build to be "resumable from
checkpoint with per-partition lineage + metrics (docs tokenized, postings
emitted, bytes compressed)". The reference has only coarse retry knobs
(``oni-indexer.js:212-234`` Solr ping retries); this is the Spark-native
equivalent: one durable record per build stage / postings bucket-group,
written atomically (tmp + rename), so a killed build re-run skips every
stage whose record says ``done`` (see build.build_to_path).

Records live under ``<index>/_lineage/<stage>.json``. All I/O goes
through the Hadoop FileSystem API (:mod:`oni_indexer_spark.fsio`), so an
index path on HDFS/S3A behaves exactly like a local one (r3 VERDICT #4).
``as_dataframe`` exposes the records as the lineage table from
FIXTURES.md §4.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from oni_indexer_spark.fsio import Fs


class Lineage:
    def __init__(self, spark: SparkSession, index_path: str):
        self.spark = spark
        self.dir = index_path.rstrip("/") + "/_lineage"
        self.fs = Fs(index_path, spark)
        self.fs.mkdirs(self.dir)

    def _file(self, stage: str) -> str:
        return f"{self.dir}/{stage}.json"

    def is_done(self, stage: str) -> bool:
        f = self._file(stage)
        if not self.fs.exists(f):
            return False
        return json.loads(self.fs.read_bytes(f)).get("status") == "done"

    def start(self, stage: str) -> float:
        t0 = time.time()
        self._write(stage, {"stage": stage, "status": "running", "started_at": t0})
        return t0

    def finish(self, stage: str, t0: float, **metrics: int) -> None:
        rec = {
            "stage": stage,
            "status": "done",
            "started_at": t0,
            "finished_at": time.time(),
            "docs_tokenized": int(metrics.get("docs_tokenized", 0)),
            "postings_emitted": int(metrics.get("postings_emitted", 0)),
            "bytes_compressed": int(metrics.get("bytes_compressed", 0)),
        }
        for k, v in metrics.items():  # extra stage-specific metrics
            if k not in rec:
                rec[k] = int(v)
        self._write(stage, rec)

    def _write(self, stage: str, rec: dict) -> None:
        self.fs.write_bytes_atomic(self._file(stage), json.dumps(rec).encode())

    def write_meta(self, meta: dict) -> None:
        self.fs.write_bytes_atomic(f"{self.dir}/meta.json", json.dumps(meta).encode())

    def read_meta(self) -> dict:
        """meta.json is the one fsio record whose loss is NOT harmless
        (r4 ADVICE: a non-atomic store can lose the target in
        write_bytes_atomic's delete→rename window, and without meta the
        whole index is unreadable). Recovery: the content that was about
        to replace it still sits in the ``.tmp`` sibling — fall back to
        it when the target is absent."""
        try:
            return json.loads(self.fs.read_bytes(f"{self.dir}/meta.json"))
        except FileNotFoundError:
            return json.loads(self.fs.read_bytes(f"{self.dir}/meta.json.tmp"))

    def bump_generation(self) -> None:
        """Write a fresh, globally-unique generation token. Every mutator
        (append / overwrite / compact) calls this LAST, so the Searcher's
        out-of-process staleness check can compare file CONTENT instead
        of the (name, mtime, size) listing — a same-size rewrite within
        one mtime tick is invisible to the listing (r4 ADVICE) but never
        to the token."""
        import uuid

        rec = {"nonce": uuid.uuid4().hex, "at_ns": time.time_ns()}
        self.fs.write_bytes_atomic(f"{self.dir}/_generation", json.dumps(rec).encode())

    def read_generation(self) -> bytes | None:
        """Current generation token content (None before any mutation)."""
        try:
            return self.fs.read_bytes(f"{self.dir}/_generation")
        except FileNotFoundError:
            return None

    def records(self) -> list[dict]:
        out = []
        for name, is_dir, _mtime, _size in sorted(self.fs.list_status(self.dir)):
            if not is_dir and name.endswith(".json") and name != "meta.json":
                out.append(json.loads(self.fs.read_bytes(f"{self.dir}/{name}")))
        return out

    def as_dataframe(self) -> DataFrame:
        return self.spark.createDataFrame(
            [
                (
                    r["stage"],
                    r["status"],
                    r.get("docs_tokenized", 0),
                    r.get("postings_emitted", 0),
                    r.get("bytes_compressed", 0),
                    float(r.get("started_at", 0.0)),
                    float(r.get("finished_at", 0.0)),
                )
                for r in self.records()
            ],
            "stage string, status string, docs_tokenized long, postings_emitted long,"
            " bytes_compressed long, started_at double, finished_at double",
        )

"""Structured-Streaming incremental indexing.

The reference's ingest loop POSTs one document at a time to Solr and
commits per doc (``oni-indexer.js:158-160``) — an unbounded incremental
feed. The Spark-native equivalent: a ``readStream`` of new documents →
``foreachBatch`` → :func:`oni_indexer_spark.index.build.append_to_index`.
Each micro-batch becomes one append-only index segment (with its own
lineage row), and the Searcher's segment-summing query path makes the
streamed index answer queries exactly like a batch rebuild
(tests/test_append.py::test_streamed_index_matches_batch_rebuild).

Exactly-once-ish semantics: the lineage stage name embeds the streaming
``batchId``, so a replayed micro-batch (foreachBatch is at-least-once)
is skipped idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_index(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start a streaming query that appends every micro-batch of
    ``(doc_id, content, ...)`` rows to the index at ``index_path``.

    ``stream_docs`` must be a streaming DataFrame whose doc_ids are
    fresh (monotonically beyond the existing index — the append contract;
    violations fail the batch loudly rather than corrupting the index).

    ``compact_every``: Lucene-style background-merge policy — after a
    batch lands, if ``compact_every`` or more append segments have
    accumulated since the last compaction, run
    :func:`~oni_indexer_spark.index.build.compact_index` inline (staged
    + atomically swapped, so the index keeps serving mid-merge). This
    closes the loop the r4 VERDICT measured: without merging, 11
    streamed segments cost ~3x on multi-term queries vs a monolithic
    build. The compaction's lineage stage embeds the streaming batchId,
    so a replayed micro-batch skips an already-done merge idempotently
    (same at-least-once contract as the append itself). Default off:
    a one-shot backfill doesn't want a merge racing its final batch.
    """
    from oni_indexer_spark.index.build import append_to_index, compact_index
    from oni_indexer_spark.index import lineage as L

    def _appends_since_last_compact(lin: "L.Lineage") -> int:
        recs = [r for r in lin.records() if r.get("status") == "done"]
        last_compact = max(
            (
                r.get("finished_at", 0.0)
                for r in recs
                if r["stage"].startswith("compact_")
            ),
            default=0.0,
        )
        return sum(
            1
            for r in recs
            if r["stage"].startswith("append_")
            and r.get("started_at", 0.0) > last_compact
        )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(batch_df, index_path, batch_id=f"stream{batch_id}")
        if compact_every:
            lin = L.Lineage(batch_df.sparkSession, index_path)
            if _appends_since_last_compact(lin) >= compact_every:
                compact_index(
                    index_path, batch_df.sparkSession, batch_id=f"auto{batch_id}"
                )

    writer = stream_docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

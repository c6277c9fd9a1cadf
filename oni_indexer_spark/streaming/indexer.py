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
) -> StreamingQuery:
    """Start a streaming query that appends every micro-batch of
    ``(doc_id, content, ...)`` rows to the index at ``index_path``.

    ``stream_docs`` must be a streaming DataFrame whose doc_ids are
    fresh (monotonically beyond the existing index — the append contract;
    violations fail the batch loudly rather than corrupting the index).
    """
    from oni_indexer_spark.index.build import append_to_index

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(batch_df, index_path, batch_id=f"stream{batch_id}")

    writer = stream_docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

from oni_indexer_spark.streaming.indexer import stream_index  # noqa: F401

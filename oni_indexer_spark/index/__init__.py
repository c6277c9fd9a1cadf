from oni_indexer_spark.index.build import (  # noqa: F401
    INDEX_FORMAT_VERSION,
    POSITIONS_FORMAT_VERSION,
    IndexConfig,
    IndexTables,
    append_to_index,
    build_index,
    build_to_path,
    compact_index,
    delete_docs,
    overwrite_docs,
    read_index,
)

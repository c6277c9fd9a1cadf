from oni_indexer_spark.query.bm25 import topk, topk_direct  # noqa: F401
from oni_indexer_spark.query.facets import facet_counts  # noqa: F401

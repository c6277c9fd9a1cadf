from oni_indexer_spark.query.bm25 import (  # noqa: F401
    fuzzy_topk,
    more_like_this,
    prefix_topk,
    search,
    snippet_topk,
    topk,
    topk_direct,
)
from oni_indexer_spark.query.facets import facet_counts  # noqa: F401
from oni_indexer_spark.query.paging import page  # noqa: F401

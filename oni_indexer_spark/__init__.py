"""oni_indexer_spark — a PySpark-native full-text inverted-index build +
BM25 query engine.

A from-scratch re-expression of the capabilities of the reference
``UTS-eResearch/oni-indexer`` (see /root/reference, SURVEY.md): the
reference is a Node.js ETL that flattens RO-Crate catalogs into Solr
documents and delegates tokenization / inverted indexing / BM25 / facets
to Apache Solr (reference ``oni-indexer.js:61-206``, ``schema.json``).
This package implements BOTH halves natively on Spark DataFrames:

- :mod:`oni_indexer_spark.analyzer`   — text analysis (Solr ``text_en``
  role, reference ``schema.json:5``), identical in Spark and DuckDB SQL.
- :mod:`oni_indexer_spark.index`      — inverted-index build: postings
  blocked by doc-range (explicit skew handling), delta+varint codec,
  doclen/df/stats tables, per-partition lineage + checkpoint-resume.
- :mod:`oni_indexer_spark.query`      — BM25 (k1=1.2, b=0.75, Lucene idf)
  top-k with block-max pruning, facet counts, filter queries.
- :mod:`oni_indexer_spark.etl`        — the reference's declarative
  field-config operators (filter/resolve/inherit/license/validate/facet)
  as DataFrame transforms.
- :mod:`oni_indexer_spark.ops`        — large-scale corpus operations:
  dedup (exact/minhash/simhash/jaccard), similarity search, text quality,
  multimodal plumbing.
- :mod:`oni_indexer_spark.sources`    — input dispatch (Parquet path /
  Iceberg catalog table with snapshot time travel — the OCFL version
  read), input-hint contract validation, deterministic doc-id minting.
"""

__version__ = "0.1.0"

"""Text analysis — the engine's stand-in for Solr's ``text_en`` analyzer.

The reference delegates tokenization to Solr field types
(``schema.json:5,16,20``; dynamic ``*_name``/``*_description`` fields at
``schema.json:44-59``). Solr's standard analyzer lower-cases and splits on
non-word boundaries; for the source-code corpus we use a code-aware token
alphabet ``[a-z0-9_]+`` (identifiers survive as single terms, ``snake_case``
stays intact, punctuation/operators are separators).

Three implementations, all PROVABLY identical (tests/test_analyzer.py):

- :func:`tokens_col`    — JVM-side column expression (whole-stage codegen,
  no Python in the hot path). Default for the build pipeline.
- :func:`tokens_pandas` — vectorized Arrow ``pandas_udf`` (the north-star's
  "tokenize with vectorized Arrow UDFs"); same output, used when a caller
  wants the UDF path (and as the extension point for stemming/stopwords
  that a regex cannot express).
- :func:`tokenize_py`   — driver-side Python, for query strings + oracles.

``duckdb_tokens_sql`` renders the same analyzer in DuckDB SQL so the
driver's oracle compares are exact, not approximate.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One token alphabet everywhere. Lowercase first, then extract.
TOKEN_PATTERN = r"[a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokens_col(col: Column | str) -> Column:
    """Tokenize a string column JVM-side. NULL-safe (NULL -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0),
        F.array().cast("array<string>"),
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_pandas(s: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer; identical output to :func:`tokens_col`."""
    return s.fillna("").str.lower().str.findall(TOKEN_PATTERN)


def tokenize_py(text: str | None) -> list[str]:
    """Driver-side tokenizer for query strings (same alphabet)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def query_terms(text: str) -> list[str]:
    """Distinct query terms, first-occurrence order (Solr ``q.op=OR`` over
    ``main_search``, ``config.json:38``; duplicate terms collapse)."""
    seen: dict[str, None] = {}
    for t in tokenize_py(text):
        seen.setdefault(t)
    return list(seen)


def duckdb_tokens_sql(col: str) -> str:
    """The same analyzer as a DuckDB SQL expression (for oracle parity)."""
    return f"coalesce(regexp_extract_all(lower({col}), '{TOKEN_PATTERN}'), [])"

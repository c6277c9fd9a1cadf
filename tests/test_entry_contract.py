"""Simulates the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare to its ``oracle_sql()`` twin in DuckDB —
order-insensitive, columns sorted by name, values rounded the way both
sides already round."""

import duckdb
import pytest

import __spark_entry__ as E
from tests.conftest import SF_ORACLE

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    return c


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    q = E.queries()[name]
    sql = E.oracle_sql().get(name)
    if sql is None:
        # rows-only contract for non-SQL-expressible ops: must run and
        # produce a stable schema
        df = q(spark, SF_ORACLE)
        assert df.count() >= 0 and len(df.columns) > 0
        return
    sdf = q(spark, SF_ORACLE)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert _norm(srows, scols) == _norm(orows, ocols), f"{name}: value mismatch"


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["rank", "doc_id", "score"]

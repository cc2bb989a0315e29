"""Integration: every catalog query hash-matches its DuckDB oracle at
sf0.001 — the same comparison the round driver performs at sf0.01.
(tools/oracle_check.py is the standalone form of this test.)"""

import math

import duckdb
import pytest

from traits_data_spark import catalog

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


ORACLES = catalog.oracle_sqls()


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = catalog.QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(s_rows) > 0  # rows-only contract
        return
    res = duck.execute(ORACLES[name])
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert _key(s_rows, s_cols) == _key(o_rows, o_cols)

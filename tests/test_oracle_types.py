"""Static lint: every catalog oracle's DuckDB output types must be
representable exactly in Spark's type system.

The round-11 driver gate went red on ``ridge_stats`` because a UNION
melt returned ``SUM(BIGINT)`` uncast: DuckDB widens that to HUGEINT
(int128), which the driver's typed hash cannot match against Spark's
LongType even though every value fits in 64 bits.  This lint binds each
oracle (no execution, just the planner) and fails on any output column
whose type has no exact Spark analogue, so the class is caught at
authoring time rather than by the driver.
"""

import duckdb
import pytest

from traits_data_spark import catalog

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Exact-width types Spark emits from the catalog queries. Anything
# outside this set (HUGEINT, DECIMAL, unsigned ints, intervals, ...)
# either hash-mismatches or silently widens.
ALLOWED = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def _allowed(t) -> bool:
    s = str(t)
    if s in ALLOWED:
        return True
    # Nested types are fine as long as every leaf is allowed. Recurse
    # on the DuckDBPyType's children (id == 'list'/'struct'/'map'), not
    # on the type STRING — stripping '[]' and re-dispatching a str
    # crashed on list-of-struct columns instead of reporting them.
    if getattr(t, "id", None) in ("list", "struct", "map"):
        return all(_allowed(c) for _, c in t.children)
    return False


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_every_oracle_emits_spark_exact_types(duck):
    bad = []
    for name, sql in catalog.oracle_sqls().items():
        rel = duck.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if not _allowed(typ):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle columns with no exact Spark analogue (cast them — "
        "e.g. CAST(sum_expr AS BIGINT)): " + "; ".join(bad)
    )


def test_lint_catches_uncast_hugeint_sum(duck):
    # Self-check: the exact round-11 failure shape (SUM over BIGINT in
    # a melt branch, uncast) must trip the lint.
    rel = duck.sql("SELECT SUM(CAST(1 AS BIGINT)) AS s FROM documents")
    assert not _allowed(rel.types[0])

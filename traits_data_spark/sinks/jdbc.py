"""RDBMS serving sinks (SURVEY.md §2.1 S11/S12/S13).

The reference upserts gold rows into MySQL Aurora with generated
``INSERT ... ON DUPLICATE KEY UPDATE`` statements in 100-row chunks
(LOADERS/GOLD-data-loader.py:278-303,654-676), bootstraps the schema
with a DataFrame→DDL generator (:593-632), and derives dimension
tables with ``INSERT IGNORE ... SELECT DISTINCT`` per dimension
(LOADERS/GOLD-rds-updater.py:81-114).

Spark-first shape: the SQL *generators* are pure, testable functions;
execution is staging-table-then-MERGE — ``df.write.jdbc`` lands the
data in parallel from executors (no driver-side row chunking), then
ONE set-based statement on the database applies the upsert. At scale
this beats per-chunk round trips by orders of magnitude and keeps the
upsert transactional on the DB side.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark type → portable SQL column type (MySQL-compatible spelling,
# matching the reference's dtype map at GOLD-data-loader.py:173-185).
_SQL_TYPES: Mapping[type, str] = {
    T.IntegerType: "INT",
    T.LongType: "BIGINT",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE",
    T.FloatType: "FLOAT",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
}


def _q(name: str, dialect: str) -> str:
    """Identifier quoting: backticks for MySQL, double quotes (ANSI)
    for everything else (Derby, Postgres, DuckDB...)."""
    return f"`{name}`" if dialect == "mysql" else f'"{name}"'


def ddl_from_schema(
    schema: T.StructType,
    table: str,
    primary_key: str | None = None,
    varchar_len: int = 255,
    dialect: str = "mysql",
    if_not_exists: bool = True,
) -> str:
    """S12: CREATE TABLE from a DataFrame schema — the reference's
    DDL bootstrap (GOLD-data-loader.py:593-632) minus the
    MySQL-specific FULLTEXT/charset clauses (serving-engine concerns,
    not engine core). ``dialect='ansi'`` quotes with double quotes and
    ``if_not_exists=False`` drops the clause for engines without it
    (Derby)."""
    cols = []
    for f in schema.fields:
        sql_t = _SQL_TYPES.get(type(f.dataType), f"VARCHAR({varchar_len})")
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"  {_q(f.name, dialect)} {sql_t}{null}")
    if primary_key:
        cols.append(f"  PRIMARY KEY ({_q(primary_key, dialect)})")
    body = ",\n".join(cols)
    exists = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {exists}{table} (\n{body}\n)"


def normalized_column_sql(
    source_col: str,
    target_col: str | None = None,
    char_map: Mapping[str, str] | None = None,
) -> str:
    """S12: a STORED generated column that strips locale-specific
    characters for search (the reference materializes
    ``fullNameNormalised`` as nested REPLACEs of ø→o / Ø→O,
    GOLD-data-loader.py:597-599). Emitted as one nested-REPLACE
    expression so it runs on MySQL verbatim."""
    target_col = target_col or f"{source_col}Normalised"
    expr = source_col
    for src, dst in (char_map or {"ø": "o", "Ø": "O"}).items():
        expr = f"REPLACE({expr}, '{src}', '{dst}')"
    return (
        f"ADD COLUMN {target_col} TEXT "
        f"GENERATED ALWAYS AS ({expr}) STORED"
    )


def index_sql(
    table: str,
    name: str,
    columns: Sequence[str],
    fulltext: bool = False,
) -> str:
    """S12: secondary / FULLTEXT index DDL (the reference adds
    ``FULLTEXT KEY playerFullTextIndex`` plus two prefix-length
    secondary keys, GOLD-data-loader.py:601-604)."""
    kind = "FULLTEXT INDEX" if fulltext else "INDEX"
    return f"CREATE {kind} {name} ON {table} ({', '.join(columns)})"


def bootstrap_statements(
    schema: T.StructType,
    database: str,
    table: str,
    primary_key: str | None = None,
    normalize_cols: Sequence[str] = (),
    fulltext_index: Mapping[str, Sequence[str]] | None = None,
    secondary_indexes: Mapping[str, Sequence[str]] | None = None,
    charset: str | None = "utf8mb4",
) -> list[str]:
    """S12: the full serving-table bootstrap sequence the reference
    runs on first write (GOLD-data-loader.py:593-632): create schema,
    create table, charset conversion, normalized generated columns,
    and search indexes — as a list of statements for the caller to
    execute in order (idempotent where the engine allows)."""
    fq = f"{database}.{table}"
    stmts = [
        f"CREATE SCHEMA IF NOT EXISTS {database}",
        ddl_from_schema(schema, fq, primary_key=primary_key),
    ]
    if charset:
        stmts.append(
            f"ALTER TABLE {fq} CONVERT TO CHARACTER SET {charset} "
            f"COLLATE {charset}_unicode_ci"
        )
    if normalize_cols:
        adds = ",\n  ".join(normalized_column_sql(c) for c in normalize_cols)
        stmts.append(f"ALTER TABLE {fq}\n  {adds}")
    for name, cols in (fulltext_index or {}).items():
        stmts.append(index_sql(fq, name, cols, fulltext=True))
    for name, cols in (secondary_indexes or {}).items():
        stmts.append(index_sql(fq, name, cols))
    return stmts


def upsert_from_staging_sql(
    table: str,
    staging_table: str,
    columns: Sequence[str],
    keys: Sequence[str],
    dialect: str = "mysql",
) -> str:
    """S11: the set-based upsert statement applied after the staging
    load. MySQL dialect mirrors the reference's ON DUPLICATE KEY UPDATE
    (GOLD-data-loader.py:278-303); 'merge' emits ANSI MERGE for
    engines that support it."""
    col_list = ", ".join(_q(c, dialect) for c in columns)
    if dialect == "mysql":
        updates = ", ".join(
            f"`{c}` = VALUES(`{c}`)" for c in columns if c not in keys
        )
        return (
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {col_list} FROM {staging_table} "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "merge":
        # ANSI: double-quoted identifiers, unqualified SET targets
        # (Derby and Postgres both reject a target-alias prefix there)
        on = " AND ".join(f't."{k}" = s."{k}"' for k in keys)
        sets = ", ".join(f'"{c}" = s."{c}"' for c in columns if c not in keys)
        src_cols = ", ".join(f's."{c}"' for c in columns)
        return (
            f"MERGE INTO {table} t USING {staging_table} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({src_cols})"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    properties: Mapping[str, str] | None = None,
    staging_suffix: str = "_staging",
    dialect: str = "mysql",
    batchsize: int = 10_000,
    staging_column_types: str | None = None,
) -> None:
    """S11 executor: land ``df`` in a staging table via parallel JDBC
    writes, then apply one set-based upsert statement.

    Requires a JDBC driver on the classpath and a reachable database.
    ``staging_column_types`` overrides Spark's default column mapping
    for the staging CREATE TABLE (e.g. ``"name VARCHAR(255)"`` where
    the dialect would otherwise emit CLOB/TEXT, which some engines
    refuse to MERGE into a VARCHAR target). Integration-tested against
    embedded Derby in tests/test_sinks.py; MySQL is deploy-time.
    """
    staging = table + staging_suffix
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    writer = df.write
    if staging_column_types:
        writer = writer.option("createTableColumnTypes", staging_column_types)
    writer.jdbc(url, staging, mode="overwrite", properties=props)
    sql = upsert_from_staging_sql(table, staging, df.columns, keys, dialect)
    _execute_on_db(df.sparkSession, url, props, sql)


def _execute_on_db(spark, url: str, props: Mapping[str, str], sql: str) -> None:
    """Run one statement over the JVM's DriverManager (same connection
    machinery df.write.jdbc uses). Classic deployments only: Spark
    Connect exposes no JVM gateway, so there the post-staging statement
    must run through a DB driver on the client (e.g. mysql-connector) —
    fail with a clear boundary error rather than an AttributeError."""
    try:
        jvm = spark._jvm
        if jvm is None:
            raise AttributeError
    except AttributeError:
        raise NotImplementedError(
            "upsert_jdbc's post-staging statement needs the py4j JVM "
            "gateway (classic Spark). On Spark Connect, run the "
            "generated upsert_from_staging_sql() statement with a "
            "client-side DB driver instead."
        ) from None
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        stmt = conn.createStatement()
        stmt.execute(sql)
        stmt.close()
    finally:
        conn.close()


def distinct_dims(
    df: DataFrame, dims: Mapping[str, Sequence[str]]
) -> dict[str, DataFrame]:
    """S13/A9: dimension-table derivation — one SELECT DISTINCT
    projection per dimension (GOLD-rds-updater.py:81-114 does this with
    INSERT IGNORE ... SELECT DISTINCT per table).

    ``dims`` maps dimension name → columns, e.g.
    ``{"team": ["teamId", "teamName"]}``. Each result is written (or
    upserted) by the caller; the INSERT IGNORE semantics are the
    anti-join of ``incremental_new_keys`` against the existing rows.
    """
    return {name: df.select(*cols).distinct() for name, cols in dims.items()}

"""Pure-JVM literal relations for bounded model artifacts.

``spark.createDataFrame(rows)`` builds a PYTHON-RDD-backed plan: every
downstream evaluation — each broadcast future, each reference from a
separate action — re-runs its partitions as tasks that EACH spawn a
Python worker (~0.18 s/task measured at sf0.1, round 16). For the
small driver-held tables the engine embeds in query plans (centroid
codebooks, solved regression weights, classifier vocabularies,
membership keys), the right construct is SQL ``VALUES``: the analyzer
folds it to a ``LocalRelation`` ONCE at parse time, downstream
consumers see a literal table, and no Python worker is ever launched.
(``select(inline(array(struct(lit…))))`` is NOT equivalent: it builds
thousands of Literal expression nodes that every re-analysis walks —
measured at +9 s driver time on pq_topk.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def sql_literal(v) -> str:
    """Render one Python value as a Spark SQL literal. Doubles use
    ``repr`` (shortest round-trip decimal) + the ``D`` suffix — Spark's
    correctly-rounded parser returns the identical IEEE 754 bits."""
    if isinstance(v, list):
        return "array(" + ",".join(sql_literal(x) for x in v) + ")"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v!r}D"
    if isinstance(v, int):
        return repr(v)
    if v is None:
        return "NULL"
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def literal_frame(spark, rows: Sequence, schema: str) -> DataFrame:
    """Driver-held rows + a Spark DDL schema string
    (``"name type, name2 type2"``) → a ``LocalRelation`` DataFrame via
    SQL ``VALUES``, with every column cast to its declared type (so
    e.g. small ints become the declared BIGINT, exactly as
    ``createDataFrame``'s inference produced). Falls back to
    ``createDataFrame`` only for the empty-rows edge case."""
    if not rows:
        return spark.createDataFrame([], schema)
    fields = [f.strip() for f in schema.split(",")]
    # array<...> element types never contain commas in this repo's
    # schemas; a map/struct DDL would need a real parser
    names, types = [], []
    for f in fields:
        n, t = f.split(None, 1)
        names.append(n)
        types.append(t)
    values = ",".join(
        "(" + ",".join(sql_literal(v) for v in row) + ")" for row in rows
    )
    sel = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    return spark.sql(
        f"SELECT {sel} FROM VALUES {values} AS t({', '.join(names)})"
    )

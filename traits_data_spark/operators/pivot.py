"""Pivot (long→wide) with an explicit value list.

``df.groupBy(...).pivot(col)`` without values triggers a separate
distinct-collect job on the driver before the real aggregation —
at 100 TB that is an extra full scan just to learn the column list.
These helpers require the caller to pass the values (dimension
domains are small and known), so the plan is a single shuffle with
map-side partial aggregation, identical to hand-written conditional
aggregates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    prefix: str = "",
) -> DataFrame:
    """One output column per pivot value: ``{prefix}{value}`` holds
    ``agg`` over that value's rows. Uses the native pivot operator
    (Catalyst rewrites it to the same conditional-aggregate plan), so
    partial aggregation and codegen apply.
    """
    out = df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)
    if prefix:
        for v in values:
            out = out.withColumnRenamed(str(v), f"{prefix}{v}")
    return out


def unpivot_long(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long inverse (melt): pure projection via the native
    ``unpivot`` — no shuffle, output rows = input rows × len(value_cols).
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )

"""Recursive struct flattening (SURVEY.md §2.2 P1).

The reference walks a StructType and emits ``col("a.b.c").alias("a_b_c")``
projections (ADAPTERS/SILVER-adapter-wyscout.py:108-124) to turn nested
provider JSON into a wide fact table. Catalyst prunes unselected nested
fields from the scan, so flattening-by-select is free at the storage
layer — the generated select IS the column-pruning whitelist.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flattened_columns(
    schema: StructType,
    prefix: str = "",
    sep: str = "_",
    explode_arrays: bool = False,
) -> list[Column]:
    """Column expressions flattening every nested struct field.

    Arrays are left as-is (use explicit ``explode`` for row expansion —
    the reference only ever explodes known arrays like ``players``).
    """
    cols: list[Column] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}" if not prefix else f"{prefix}.{field.name}"
        alias = path.replace(".", sep)
        if isinstance(field.dataType, StructType):
            cols.extend(
                _nested_columns(field.dataType, path, alias, sep)
            )
        else:
            cols.append(F.col(path).alias(alias))
    return cols


def _nested_columns(
    schema: StructType, path: str, alias_prefix: str, sep: str
) -> list[Column]:
    cols: list[Column] = []
    for field in schema.fields:
        child_path = f"{path}.{field.name}"
        child_alias = f"{alias_prefix}{sep}{field.name}"
        if isinstance(field.dataType, StructType):
            cols.extend(_nested_columns(field.dataType, child_path, child_alias, sep))
        else:
            cols.append(F.col(child_path).alias(child_alias))
    return cols


def flatten_struct_columns(
    df: DataFrame,
    only: Sequence[str] | None = None,
    sep: str = "_",
) -> DataFrame:
    """Flatten all (or ``only`` the named) struct columns of ``df``.

    Non-struct columns pass through unchanged, preserving order of
    first appearance.
    """
    out: list[Column] = []
    for field in df.schema.fields:
        is_struct = isinstance(field.dataType, StructType)
        selected = only is None or field.name in (only or [])
        if is_struct and selected:
            out.extend(
                _nested_columns(field.dataType, field.name, field.name, sep)
            )
        else:
            out.append(F.col(field.name))
    return df.select(*out)


def enforce_cast_contract(
    df: DataFrame,
    int_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    exclude: Sequence[str] = (),
) -> DataFrame:
    """The silver output cast contract (F11): named columns cast to
    int / string, every other column cast to double — the reference's
    blanket "all unspecified columns will be floats" loop
    (ADAPTERS/SILVER-adapter-wyscout.py:475-484).

    ``exclude`` passes columns through untouched (dates/timestamps or
    partition columns the blanket-double rule must not mangle).
    """
    ints, strings, skip = set(int_cols), set(string_cols), set(exclude)
    casts = {}
    for name in df.columns:
        if name in skip:
            continue
        if name in ints:
            casts[name] = F.col(name).cast("int")
        elif name in strings:
            casts[name] = F.col(name).cast("string")
        else:
            casts[name] = F.col(name).cast("double")
    return df.withColumns(casts)


def explode_array_of_structs(
    df: DataFrame, array_col: str, keep: Sequence[str] = ()
) -> DataFrame:
    """``explode(array<struct>)`` then flatten the struct — the
    reference's ``explode(players)`` pattern
    (ADAPTERS/SILVER-adapter-wyscout.py:227).
    """
    field = df.schema[array_col].dataType
    if not isinstance(field, ArrayType) or not isinstance(field.elementType, StructType):
        raise TypeError(f"{array_col} is not array<struct>")
    exploded = df.select(*keep, F.explode(F.col(array_col)).alias("__e"))
    inner = [
        F.col(f"__e.{f.name}").alias(f.name) for f in field.elementType.fields
    ]
    return exploded.select(*keep, *inner)

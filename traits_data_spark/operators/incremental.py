"""Incremental aggregate maintenance: merge partial aggregate states.

At 100 TB you never re-aggregate history to admit a day of new data —
you keep the rollup table keyed by group and MERGE each increment's
partial aggregates into it. That works exactly for the decomposable
aggregates (sum, count, min, max — and mean/stddev carried as
sum/count/sumsq), which is why the silver contract stores those
primitives rather than finished ratios (ratios are re-derived at
read time).

``merge_aggregate_states`` is the combine step: full-outer-join two
state tables on the group keys and apply each column's merge function.
Associative + commutative ⇒ any merge tree gives the same answer, so
increments can arrive out of order.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column-name -> how: how in {"sum", "min", "max"} ("count" states merge
# with "sum").
MergeSpec = Mapping[str, str]

_MERGERS = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": F.least,
    "max": F.greatest,
}


def merge_aggregate_states(
    state_a: DataFrame,
    state_b: DataFrame,
    keys: Sequence[str],
    merges: MergeSpec,
) -> DataFrame:
    """Combine two partial-aggregate tables into one.

    Groups present in only one side pass through (full outer join);
    ``least``/``greatest`` skip nulls natively, sums coalesce them to
    0. One shuffle on the group keys — at a steady scale the rollup
    side is large but the increment is small, so AQE plans the
    increment as the broadcast side.
    """
    unknown = set(merges.values()) - set(_MERGERS)
    if unknown:
        raise ValueError(f"unknown merge fns: {sorted(unknown)}")
    a = state_a.alias("a")
    b = state_b.alias("b")
    joined = a.join(b, on=list(keys), how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for col, how in merges.items():
        out_cols.append(
            _MERGERS[how](F.col(f"a.{col}"), F.col(f"b.{col}")).alias(col)
        )
    return joined.select(*out_cols)

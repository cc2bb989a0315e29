"""Coarse-group row duplication — the "ANY position" union
(SURVEY.md §2.6 U2).

The reference duplicates every fact row with
``positionGroup/Name/Abbr ⟵ 'ANY'`` and unions it back
(ADAPTERS/SILVER-adapter-wyscout.py:292-297) so one GROUP BY produces
both per-position and all-position aggregates — a manual grouping set.

We keep the union formulation (hash-compatible with the reference and
with plain-SQL oracles). ``unionByName`` is a narrow transformation:
no shuffle is introduced; the downstream aggregation's map-side combine
absorbs the 2× row count. For very wide fan-outs (many coarse levels)
prefer ``grouping sets`` — see ``rollup_grouping_sets``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_with_coarse_group(
    df: DataFrame,
    overrides: Mapping[str, object],
) -> DataFrame:
    """Union ``df`` with a copy whose ``overrides`` columns are set to
    literal coarse values, e.g. ``{"positionGroup": "ANY"}``.
    """
    coarse = df
    for col, value in overrides.items():
        coarse = coarse.withColumn(col, F.lit(value))
    return df.unionByName(coarse)


def rollup_grouping_sets(
    df: DataFrame,
    fine_keys: Sequence[str],
    coarse_key: str,
    agg_exprs: Sequence,
    any_label: str = "ANY",
) -> DataFrame:
    """Single-pass alternative: GROUPING SETS ((fine+coarse), (fine))
    with the coarse key replaced by ``any_label`` on the coarse set.

    Produces the same rows as ``union_with_coarse_group`` + groupBy but
    scans the input once.
    """
    df.createOrReplaceTempView("__gs_in")
    select_keys = ", ".join(fine_keys)
    exprs = ", ".join(str(e._jc.toString()) if hasattr(e, "_jc") else str(e) for e in agg_exprs)
    sql = f"""
        SELECT {select_keys},
               CASE WHEN grouping({coarse_key}) = 1 THEN '{any_label}'
                    ELSE {coarse_key} END AS {coarse_key},
               {exprs}
        FROM __gs_in
        GROUP BY GROUPING SETS (({select_keys}, {coarse_key}), ({select_keys}))
    """
    return df.sparkSession.sql(sql)

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
    """Duplicate every row with the ``overrides`` columns set to
    literal coarse values, e.g. ``{"positionGroup": "ANY"}``.

    Implemented as explode of a 2-element array rather than
    ``df.unionByName(df.withColumn(...))`` — row-identical output, but
    ONE scan of the input instead of two. On a 100 TB fact table the
    union formulation literally reads the data twice; the explode is a
    narrow per-row expansion the downstream aggregation's map-side
    combine absorbs.
    """
    fine = F.struct(
        *[F.col(c).alias(c) for c in overrides]
    )
    coarse = F.struct(
        *[
            F.lit(v).cast(df.schema[c].dataType).alias(c)
            for c, v in overrides.items()
        ]
    )
    tmp = df.withColumn("__coarse", F.explode(F.array(fine, coarse)))
    replaced = [
        F.col(f"__coarse.{c}").alias(c) if c in overrides else F.col(c)
        for c in df.columns
    ]
    return tmp.select(*replaced)


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
    scans the input once. Uses the public ``DataFrame.groupingSets``
    API (Spark 3.4+) — no temp views, no py4j internals, safe under
    concurrency and Spark Connect.
    """
    fine = list(fine_keys)
    grouped = df.groupingSets(
        [[*fine, coarse_key], fine], *fine, coarse_key
    )
    out = grouped.agg(F.grouping(coarse_key).alias("__is_coarse"), *agg_exprs)
    keep = [c for c in out.columns if c not in ("__is_coarse", coarse_key)]
    coarse_col = (
        F.when(F.col("__is_coarse") == 1, F.lit(any_label))
        .otherwise(F.col(coarse_key))
        .alias(coarse_key)
    )
    return out.select(*fine, coarse_col, *[c for c in keep if c not in fine])

"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join handling (enabled by ``session.get_spark``) splits
oversized partitions at runtime and is the first line of defense. The
explicit salting operators here cover the cases AQE cannot fix:
a *broadcast-ineligible* join where one hot key dominates (AQE splits
the partition but every split still collides on the same hash bucket
of the OTHER side), and high-cardinality-skewed ``collect_list``-style
aggregations.

- ``salted_join``: replicate the small side ``salt`` times, scatter
  the big side's rows uniformly across the replicas. Each hot key's
  rows spread over ``salt`` partitions; the small side grows by
  ``salt``×, which is fine precisely when it is too big to broadcast
  but far smaller than the fact side.
- ``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on
  key — the manual map-side-combine for algebraic aggregates whose
  partial state is small.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` replicas of
    the small side. Result rows are identical to ``big.join(small,
    on, how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = list(on)
    big_s = big.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, keys + ["__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: "dict[str, Column]",
    combiners: "dict[str, object] | None" = None,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``partials``: output name → partial aggregate computed per
    (keys, salt) group. ``combiners``: name → aggregate function used
    to merge the partials per key (default ``F.sum``, correct for
    sum AND count partials; pass ``F.min``/``F.max`` for those). Only
    algebraic aggregates decompose this way; express avg as
    sum + count.
    """
    keyed = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    phase1 = keyed.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partials.items()]
    )
    comb = combiners or {}
    final = [comb.get(n, F.sum)(F.col(n)).alias(n) for n in partials]
    return phase1.groupBy(*keys).agg(*final)

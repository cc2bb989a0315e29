"""Weights-hierarchy compiler: stats → metrics → traits → Rating
(SURVEY.md §2.7 F6, §3 E2; FIXTURES.md F6).

The reference's gold loader reads a per-client weights CSV
``(POS, statName, statWgt, metricName, metricWgt, traitName, traitWgt,
inverse)`` and, per position group, computes

    metric = Σ zscore(stat) * statWgt + 2.5     (GOLD-data-loader.py:487-503)
    trait  = Σ metric * metricWgt               (:506-520)
    Rating = Σ trait  * traitWgt                (:522-534)

as three pandas passes merged back 1:1 on profileId. Here the whole
hierarchy compiles to pure column expressions — weights differ per
position group, so each output column is a CASE WHEN ladder over the
position column. No joins, no extra passes: the rollup is a projection
and stays inside whole-stage codegen regardless of data size.
"""

from __future__ import annotations

import csv
import io
from collections import OrderedDict
from dataclasses import dataclass
from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class WeightRow:
    pos: str
    stat_name: str
    stat_wgt: float
    metric_name: str
    metric_wgt: float
    trait_name: str
    trait_wgt: float
    inverse: bool = False


class WeightsHierarchy:
    """Per-position linear rollup definitions.

    ``metric_base`` is the reference's +2.5 recentring constant applied
    at the metric level (GOLD-data-loader.py:76,499).
    """

    def __init__(self, rows: Sequence[WeightRow], metric_base: float = 2.5):
        self.rows = list(rows)
        self.metric_base = metric_base

    @classmethod
    def from_rows(cls, rows: Iterable[Mapping[str, object]], **kw) -> "WeightsHierarchy":
        parsed = [
            WeightRow(
                pos=str(r["POS"]),
                stat_name=str(r["statName"]),
                stat_wgt=float(r["statWgt"]),
                metric_name=str(r["metricName"]),
                metric_wgt=float(r["metricWgt"]),
                trait_name=str(r["traitName"]),
                trait_wgt=float(r["traitWgt"]),
                inverse=bool(int(r.get("inverse", 0) or 0)),
            )
            for r in rows
        ]
        return cls(parsed, **kw)

    @classmethod
    def from_csv(cls, path_or_text: str, **kw) -> "WeightsHierarchy":
        if "\n" in path_or_text:
            text = path_or_text
        else:
            with open(path_or_text, newline="") as fh:
                text = fh.read()
        return cls.from_rows(csv.DictReader(io.StringIO(text)), **kw)

    # ------------------------------------------------------------------
    def positions(self) -> list[str]:
        return list(OrderedDict.fromkeys(r.pos for r in self.rows))

    def inverse_stats(self, pos: str | None = None) -> list[str]:
        return sorted(
            {r.stat_name for r in self.rows if r.inverse and (pos is None or r.pos == pos)}
        )

    def metric_names(self) -> list[str]:
        return list(OrderedDict.fromkeys(r.metric_name for r in self.rows))

    def trait_names(self) -> list[str]:
        return list(OrderedDict.fromkeys(r.trait_name for r in self.rows))

    # ------------------------------------------------------------------
    def _per_pos_metric(self, pos: str, metric: str, zprefix: str) -> Column:
        # Reference parity (GOLD-data-loader.py:487-503): a position with
        # no weight rows for this metric computes sum([]) = 0, so the
        # metric is the bare base constant — not NULL. NULL is reserved
        # for positions absent from the weights entirely (the CASE
        # ladder's fall-through in _case_over_pos).
        terms = [r for r in self.rows if r.pos == pos and r.metric_name == metric]
        expr: Column = F.lit(float(self.metric_base))
        for r in terms:
            expr = expr + F.col(zprefix + r.stat_name) * F.lit(r.stat_wgt)
        return expr

    def _case_over_pos(self, builder, pos_col: str) -> Column:
        expr = None
        for pos in self.positions():
            leaf = builder(pos)
            if leaf is None:
                continue
            cond = F.col(pos_col) == F.lit(pos)
            expr = F.when(cond, leaf) if expr is None else expr.when(cond, leaf)
        return expr if expr is not None else F.lit(None).cast("double")

    def apply(
        self,
        df: DataFrame,
        pos_col: str = "positionGroup",
        zscore_prefix: str = "zs_",
        rating_col: str = "Rating",
        round_to: int | None = 2,
    ) -> DataFrame:
        """Append metric, trait, and Rating columns.

        Expects z-scored stat columns named ``{zscore_prefix}{statName}``
        (see ``operators.zscore.group_zscores``; inverse handling lives
        there, driven by ``inverse_stats()``).
        """
        metric_cols: dict[str, Column] = {}
        for metric in self.metric_names():
            metric_cols[metric] = self._case_over_pos(
                lambda pos, m=metric: self._per_pos_metric(pos, m, zscore_prefix),
                pos_col,
            )
        out = df.withColumns(metric_cols)

        trait_cols: dict[str, Column] = {}
        for trait in self.trait_names():
            def per_pos_trait(pos: str, t: str = trait) -> Column:
                # one weight per (pos, metric, trait): dedup pairs.
                # No terms → sum([]) = 0.0 (reference parity, see
                # _per_pos_metric).
                seen: dict[str, float] = {}
                for r in self.rows:
                    if r.pos == pos and r.trait_name == t:
                        seen[r.metric_name] = r.metric_wgt
                expr: Column = F.lit(0.0)
                for m, w in seen.items():
                    expr = expr + F.col(m) * F.lit(w)
                return expr

            trait_cols[trait] = self._case_over_pos(per_pos_trait, pos_col)
        out = out.withColumns(trait_cols)

        def per_pos_rating(pos: str) -> Column:
            seen: dict[str, float] = {}
            for r in self.rows:
                if r.pos == pos:
                    seen[r.trait_name] = r.trait_wgt
            expr: Column = F.lit(0.0)
            for t, w in seen.items():
                expr = expr + F.col(t) * F.lit(w)
            return expr

        out = out.withColumn(rating_col, self._case_over_pos(per_pos_rating, pos_col))
        if round_to is not None:
            rounded = {
                c: F.round(F.col(c), round_to)
                for c in [*metric_cols, *trait_cols, rating_col]
            }
            out = out.withColumns(rounded)
        return out

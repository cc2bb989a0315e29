"""Feature store: metadata-driven aggregate compilation.

This is the reference's one true query interface (SURVEY.md §2.4 A1/A2):
a CSV of ``(feature_name, base_sql)`` rows, where each ``base_sql`` is a
single SQL *aggregate expression* over the grouped fact rows (e.g.
``SUM(m.goals)``, ``SUM(goals)*90/SUM(minutesTagged)``,
``SUM(CASE WHEN type = 'Pass' THEN 1 ELSE 0 END)``). The reference
splices these fragments into one generated ``GROUP BY`` statement
(ADAPTERS/SILVER-adapter-wyscout.py:413-431; the event-level analog is
``stats_catalogue.csv`` in
STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171).

Here the same metadata compiles to ``F.expr(...).alias(...)`` columns
fed to ``DataFrame.groupBy(...).agg(...)`` — Catalyst plans a
partial+final hash aggregation (map-side combine) so the shuffle moves
pre-aggregated state, which is what keeps this correct *and* cheap at
100 TB.

Safety: the reference splices untrusted SQL text into a query
(SURVEY.md §7.3 flags the injection surface). ``validate`` parses each
fragment with Spark's own expression parser and rejects anything that
is not a single expression (statement separators, multiple columns).
"""

from __future__ import annotations

import csv
import io
import os
import re
from dataclasses import dataclass
from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_FORBIDDEN = re.compile(r";|--|/\*", re.S)

_CALL_HEAD = re.compile(r"^\s*\w+\s*\(")


def _is_single_call(fragment: str) -> bool:
    """True iff the fragment is exactly one function call — i.e. the
    paren opened by the leading ``name(`` closes at the very end (string
    literals respected). ``SUM(a)`` yes; ``SUM(a)*90/SUM(b)`` no."""
    m = _CALL_HEAD.match(fragment)
    if not m:
        return False
    depth = 0
    in_str: str | None = None
    for i, ch in enumerate(fragment):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return not fragment[i + 1 :].strip()
    return False


def _is_missing_column_error(exc: Exception) -> bool:
    """The Connect-path validate probe runs against an empty frame, so
    fragments that PARSE correctly still fail analysis with
    unresolved-column / aggregation-context errors — those are fine
    (columns bind at aggregation time)."""
    msg = str(exc)
    return (
        "UNRESOLVED_COLUMN" in msg
        or "cannot be resolved" in msg
        or "MISSING_AGGREGATION" in msg
        or "GROUP_BY" in msg
    )


class FeatureDefinitionError(ValueError):
    """A feature fragment failed validation."""


@dataclass(frozen=True)
class Feature:
    """One aggregate feature: output alias + SQL aggregate fragment."""

    name: str
    base_sql: str

    def column(self) -> Column:
        return F.expr(self.base_sql).alias(self.name)


class FeatureStore:
    """An ordered collection of aggregate features.

    Mirrors ``feature_store_{provider}.csv`` (FIXTURES.md F5): rows with
    a null/empty ``base_sql`` are skipped with a warning, matching the
    reference's error path (ADAPTERS/SILVER-adapter-wyscout.py:421-424).
    """

    def __init__(self, features: Sequence[Feature]):
        self.features: list[Feature] = list(features)
        names = [f.name for f in self.features]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise FeatureDefinitionError(f"duplicate feature names: {sorted(dupes)}")
        self.skipped: list[str] = []

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_rows(
        cls,
        rows: Iterable[Mapping[str, object]],
        name_col: str = "feature_name",
        sql_col: str = "base_sql",
    ) -> "FeatureStore":
        feats: list[Feature] = []
        skipped: list[str] = []
        for row in rows:
            name = row.get(name_col)
            sql = row.get(sql_col)
            if not name:
                continue
            if sql is None or (isinstance(sql, float) and sql != sql) or not str(sql).strip():
                skipped.append(str(name))
                continue
            feats.append(Feature(str(name).strip(), str(sql).strip()))
        fs = cls(feats)
        fs.skipped = skipped
        return fs

    @classmethod
    def from_csv(
        cls,
        path_or_text: str,
        name_col: str = "feature_name",
        sql_col: str = "base_sql",
    ) -> "FeatureStore":
        """Load from a CSV file path or literal CSV text."""
        if "\n" in path_or_text or (
            "," in path_or_text and not os.path.exists(path_or_text)
        ):
            text = path_or_text
        else:
            with open(path_or_text, newline="") as fh:
                text = fh.read()
        reader = csv.DictReader(io.StringIO(text))
        return cls.from_rows(reader, name_col=name_col, sql_col=sql_col)

    # -- validation -----------------------------------------------------
    def validate(self, spark: SparkSession) -> None:
        """Reject fragments that are not a single aggregate expression.

        Uses Spark's SQL parser (parseExpression) so anything with
        statement separators, comments, or trailing garbage fails here
        rather than inside a 1000-executor job. On Spark Connect
        sessions (no ``_jsparkSession``) it falls back to a driver-side
        ``selectExpr`` probe on an empty frame — same rejection set,
        parse errors surface from the analyzer instead of the parser.
        """
        try:
            parser = spark._jsparkSession.sessionState().sqlParser()
        except AttributeError:  # Spark Connect: no py4j gateway
            parser = None
        probe = None if parser is not None else spark.range(0)
        for f in self.features:
            if _FORBIDDEN.search(f.base_sql):
                raise FeatureDefinitionError(
                    f"feature {f.name!r}: forbidden token in {f.base_sql!r}"
                )
            try:
                if parser is not None:
                    parser.parseExpression(f.base_sql)
                else:
                    # analyzer probe: parse failures throw eagerly; use
                    # a dummy aggregate context so bare column refs in
                    # the fragment resolve or fail as parse errors, not
                    # missing-column errors
                    probe.selectExpr(f"typeof(({f.base_sql}))")
            except FeatureDefinitionError:
                raise
            except Exception as exc:  # Py4J wraps ParseException
                if _is_missing_column_error(exc):
                    continue  # parsed fine; columns bind at use time
                raise FeatureDefinitionError(
                    f"feature {f.name!r}: not a valid expression: {f.base_sql!r}"
                ) from exc

    # -- compilation ----------------------------------------------------
    def columns(self, where: str | None = None) -> list[Column]:
        """Compile to aggregate Columns, optionally gated by a SQL
        ``FILTER (WHERE ...)`` predicate — the single-pass alternative
        to re-aggregating per-subset (SURVEY.md §4 "single-pass rewrite").

        ``FILTER`` binds to a single aggregate call, so a compound
        fragment like ``SUM(a)*90/SUM(b)`` would get the predicate on
        the *last* aggregate only — silently wrong numbers. Compound
        fragments are therefore rejected when ``where`` is given; gate
        the inputs instead (``SUM(CASE WHEN <where> THEN a END)``).
        """
        if where is None:
            return [f.column() for f in self.features]
        out = []
        for f in self.features:
            if not _is_single_call(f.base_sql):
                raise FeatureDefinitionError(
                    f"feature {f.name!r}: FILTER (WHERE ...) is only valid on a "
                    f"single aggregate call, got compound fragment "
                    f"{f.base_sql!r}; gate inputs with CASE WHEN instead"
                )
            out.append(F.expr(f"{f.base_sql} FILTER (WHERE {where})").alias(f.name))
        return out

    def aggregate(
        self,
        df: DataFrame,
        group_keys: Sequence[str],
        extra: Sequence[Column] = (),
    ) -> DataFrame:
        """``SELECT keys, extra..., features... FROM df GROUP BY keys``."""
        cols = list(extra) + self.columns()
        return df.groupBy(*group_keys).agg(*cols)

    def generated_sql(
        self,
        table: str,
        group_keys: Sequence[str],
        extra_sql: Sequence[str] = (),
    ) -> str:
        """The reference-style generated SQL text (for oracles/debug)."""
        select = list(group_keys) + list(extra_sql) + [
            f"{f.base_sql} AS {f.name}" for f in self.features
        ]
        return (
            "SELECT "
            + ", ".join(select)
            + f" FROM {table} GROUP BY "
            + ", ".join(group_keys)
        )

    def __len__(self) -> int:
        return len(self.features)

    def names(self) -> list[str]:
        return [f.name for f in self.features]

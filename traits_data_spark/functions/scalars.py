"""Scalar column helpers — native expressions replacing the reference's
Python UDFs (SURVEY.md §2.8: every UDF compiles to built-in Spark).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*parts: Column | str, sep: str = "") -> Column:
    """Concatenated surrogate key, e.g. profileId =
    playerId+teamId+seasonId+competitionId+positionGroup
    (reference: ADAPTERS/SILVER-adapter-wyscout.py:396-400).

    Casts every part to string; null parts propagate as null (matching
    SQL CONCAT semantics in both Spark and the reference).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    cols = [c.cast("string") for c in cols]
    if sep:
        return F.concat_ws(sep, *cols)
    return F.concat(*cols)


def age_at(birth_date: Column | str, ref_date: Column | str) -> Column:
    """Age in whole years at ``ref_date``.

    Replaces the reference's ``calculate_age`` UDF
    (ADAPTERS/SILVER-adapter-wyscout.py:126-138). The reference branches
    on "today" for in-progress seasons — a nondeterminism we remove by
    requiring the caller to pass an explicit reference date
    (SURVEY.md §7.3 "pin 'today' to a run-date parameter").
    """
    b = F.col(birth_date) if isinstance(birth_date, str) else birth_date
    r = F.col(ref_date) if isinstance(ref_date, str) else ref_date
    return F.floor(F.months_between(r, b) / 12).cast("int")


def map_lookup(
    key: Column | str,
    mapping: Mapping[object, object],
    default: Column | None = None,
) -> Column:
    """Literal map lookup replacing broadcast-dict UDFs (J12/D1-D4).

    Builds a ``CASE WHEN`` over literal pairs — stays inside
    whole-stage codegen, no Python round-trip. For maps larger than a
    few hundred entries prefer a broadcast join against a 2-column
    DataFrame instead.
    """
    k = F.col(key) if isinstance(key, str) else key
    expr = None
    for mk, mv in mapping.items():
        cond = k == F.lit(mk)
        expr = F.when(cond, F.lit(mv)) if expr is None else expr.when(cond, F.lit(mv))
    if expr is None:
        return default if default is not None else F.lit(None)
    return expr.otherwise(default) if default is not None else expr


def portable_hash64(col: Column | str, bits: int = 60) -> Column:
    """Deterministic 60-bit hash that is reproducible across engines
    (Spark, DuckDB, Python): the first 15 hex chars of md5, as a long.

    Used by dedup/minhash operators so test oracles can recompute the
    exact same hash: DuckDB ``('0x' || substring(md5(x),1,15))::UBIGINT``.
    md5 is uniform enough for sketching; this is not a crypto use.
    """
    c = F.col(col) if isinstance(col, str) else col
    nhex = bits // 4
    return F.conv(F.substring(F.md5(c), 1, nhex), 16, 10).cast("long")


def suffixed_name(
    name: Column | str,
    key: Column | str,
    suffix_map: Mapping[object, str],
    sep: str = " ",
) -> Column:
    """D4: per-key name disambiguation suffix — the reference's
    ``add_suffix_udf`` (champion notebook cell 10) as a pure
    expression: append the mapped suffix when the key has one,
    otherwise pass the name through unchanged."""
    n = F.col(name) if isinstance(name, str) else name
    suffix = map_lookup(key, suffix_map)
    return F.when(
        suffix.isNotNull(), F.concat(n, F.lit(sep), suffix)
    ).otherwise(n)


def weighted_sum(pairs: Sequence[tuple[Column | str, float]], base: float = 0.0) -> Column:
    """``base + Σ col_i * w_i`` as a single column expression — the
    gold rollup primitive (LOADERS/GOLD-data-loader.py:487-534) without
    pandas merges.
    """
    expr: Column = F.lit(float(base))
    for col, w in pairs:
        c = F.col(col) if isinstance(col, str) else col
        expr = expr + c * F.lit(float(w))
    return expr

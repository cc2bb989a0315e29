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

from traits_data_spark.operators.windows import dedup_keep_best

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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    status_col: str = "status",
) -> DataFrame:
    """Reconcile two snapshots of a keyed dataset: one row per key
    that differs, with ``status`` in ``added`` / ``removed`` /
    ``changed`` (unchanged keys drop out). Content equality is a
    portable md5 hash over the stringified ``compare_cols`` (default:
    every non-key column both sides share, in sorted-name order), so
    the diff is recomputable on any engine — the audit a data team
    runs before promoting a new snapshot.

    Scale shape: ONE full-outer shuffle join on the key — the
    canonical reconciliation; bucket both snapshots on the key to make
    it co-located at 100 TB. The hash collapses arbitrarily wide rows
    to one fixed-width column BEFORE the join, so the shuffle moves
    keys + one 32-char md5, not full rows.

    False-negative bound: a row counts as unchanged when old and new
    md5s collide — probability ~2^-128 per key (the full 128-bit
    digest is compared; it never leaves the join, so width is free).
    Adds/removes are exact (null-vs-present, no hashing involved).
    """

    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(key_cols))
    if not compare_cols:
        raise ValueError("no columns to compare")

    def hashed(df: DataFrame, out: str) -> DataFrame:
        # Length-prefix each value ("<len>:<value>", "-" for NULL) so
        # the row encoding is INJECTIVE: a bare separator could appear
        # inside a value and shift content across column boundaries
        # (('a\x1fb','c') vs ('a','b\x1fc')), and concat_ws SKIPS
        # nulls on both engines, which would make (null, x) collide
        # with (x, null). With the prefix, no two distinct rows
        # encode identically.
        parts = []
        for c in compare_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("-")).otherwise(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        h = F.md5(F.concat_ws("\x1f", *parts))
        return df.select(*key_cols, h.alias(out))

    # explicit aliases: both snapshots often derive from the same base
    # frame, and unqualified column refs in a self-join are ambiguous
    o = hashed(old, "__ho").alias("__old")
    n = hashed(new, "__hn").alias("__new")
    # null-safe key equality: a plain equi-join never matches NULL
    # keys, which would report an unchanged null-key row as BOTH
    # removed and added (phantom churn); eqNullSafe pairs them up
    cond = None
    for k in key_cols:
        c = F.col(f"__old.{k}").eqNullSafe(F.col(f"__new.{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__old.{k}"), F.col(f"__new.{k}")).alias(k)
            for k in key_cols
        ],
        "__ho",
        "__hn",
    )
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        joined.withColumn(status_col, status)
        .filter(F.col(status_col).isNotNull())
        .select(*key_cols, status_col)
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge — the dimension-history
    counterpart of the reference's keyed RDBMS/Parquet upserts
    (LOADERS/GOLD-data-loader.py:278-303 upserts in place and loses
    history; SCD2 is what a warehouse runs when it must keep it).

    ``current`` is the existing history: key columns, tracked
    attributes, ``valid_from``/``valid_to``/``is_current`` (open rows
    have ``valid_to`` NULL and flag 1). ``updates`` carries one new
    snapshot per key (extra rows per key are collapsed to the newest
    ``ts_col`` deterministically — ties break on the tracked values'
    struct, so re-runs are stable). Per key:

    - new key                    → insert open row at its ``ts_col``
    - tracked attributes changed → close the open row (``valid_to`` =
      update ts, flag 0) AND insert the new open row
    - identical (null-safe)      → no-op (idempotent re-loads)

    Closed history rows pass through untouched.

    Scale shape: ONE key-shuffle join between the OPEN slice and the
    (bounded, delta-sized) update batch; the closed-history slice is
    union'd back without a shuffle — store the table partitioned by
    ``is_current`` and only the open partition is ever read or
    rewritten (same touched-partition discipline as
    ``upsert_parquet_partition``). Change detection is a null-safe
    struct comparison, so NULL→value and value→NULL transitions both
    version correctly.
    """
    key_l = list(keys)
    trk = list(tracked)
    up = dedup_keep_best(
        updates, key_l, [F.col(ts_col).desc(), F.struct(*trk).desc()]
    ).select(
        *key_l,
        *[F.col(c).alias(f"__u_{c}") for c in trk],
        F.col(ts_col).alias("__u_ts"),
    )
    open_rows = current.filter(F.col(current_flag) == 1)
    closed_rows = current.filter(F.col(current_flag) != 1)
    j = open_rows.join(up, key_l, "full_outer")
    has_cur = F.col(valid_from).isNotNull()
    has_upd = F.col("__u_ts").isNotNull()
    changed = ~F.struct(*[F.col(c) for c in trk]).eqNullSafe(
        F.struct(*[F.col(f"__u_{c}") for c in trk])
    )
    # surviving open rows: unmatched, or matched-but-identical
    keep_open = j.filter(has_cur & (~has_upd | ~changed)).select(
        current.columns
    )
    closed_out = (
        j.filter(has_cur & has_upd & changed)
        .withColumn(valid_to, F.col("__u_ts"))
        .withColumn(current_flag, F.lit(0).cast("int"))
        .select(current.columns)
    )
    new_open = (
        j.filter(has_upd & (~has_cur | changed))
        .select(
            *key_l,
            *[F.col(f"__u_{c}").alias(c) for c in trk],
            F.col("__u_ts").alias(valid_from),
            F.lit(None).cast(dict(current.dtypes)[valid_to]).alias(valid_to),
            F.lit(1).cast("int").alias(current_flag),
        )
        .select(current.columns)
    )
    return (
        closed_rows.unionByName(keep_open)
        .unionByName(closed_out)
        .unionByName(new_open)
    )

"""Join helpers (SURVEY.md §2.3).

All of the reference's joins are equi-joins with small dimension
sides (competitions, teams, lineups — pandas frames of at most
thousands of rows: ADAPTERS/SILVER-adapter-wyscout.py:364-373).
``dim_join`` makes the broadcast explicit so a misestimated dimension
can never fall back to a 100 TB shuffle join; ``mismatch_join`` is the
subset-detection join (J14).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1-J3: fact ⋈ dimension with an explicit broadcast hint.

    The reference's dims (competitions, teams, national teams) are
    always small; broadcasting removes the shuffle entirely — the fact
    side streams through map-side hash joins.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, list(on), how)


ISIN_LITERAL_MAX = 1000


def allowlist_filter(
    df: DataFrame,
    col: str,
    allowed,
    negate: bool = False,
) -> DataFrame:
    """P5 membership filter with an explicit scale path.

    ``allowed`` may be a Python collection or a 1-column DataFrame.
    Small collections compile to ``isin`` (a codegen'd IN-list that
    pushes down to the parquet scan); big collections and DataFrames
    become a broadcast left-semi (or left-anti, ``negate=True``) join —
    a 100k-element ``isin`` would bloat the plan tree and never push
    down anyway, and a driver-collected list defeats the point when
    the allowlist already lives in a table.
    """
    if isinstance(allowed, DataFrame):
        acols = allowed.columns
        if len(acols) != 1:
            raise ValueError(f"allowlist DataFrame needs 1 column, got {acols}")
        keys = F.broadcast(allowed.withColumnRenamed(acols[0], col).distinct())
        return df.join(keys, col, "left_anti" if negate else "left_semi")
    values = list(allowed)
    if len(values) <= ISIN_LITERAL_MAX:
        cond = F.col(col).isin(values)
        return df.filter(~cond if negate else cond)
    spark = df.sparkSession
    from traits_data_spark.functions.literals import literal_frame

    vtype = (
        "bigint"
        if all(isinstance(v, int) and not isinstance(v, bool) for v in values)
        else "double"
        if all(isinstance(v, (int, float)) for v in values)
        else "string"
    )
    keys_df = literal_frame(
        spark, [(v,) for v in values], f"{col} {vtype}"
    ).distinct()
    return df.join(
        F.broadcast(keys_df), col, "left_anti" if negate else "left_semi"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for every left row, attach ``right_cols`` from the
    most recent right row at-or-before its timestamp (``backward``;
    ``forward`` = earliest at-or-after), matched within ``on`` keys.

    Spark has no native as-of join; the naive formulation (range join +
    per-left-row argmax) is a near-cross-product. This is the
    scale-correct shape: tag both sides, union, and forward-fill the
    right-side payload with ``last(ignorenulls)`` over one window — a
    single shuffle on the keys, NO join node at all. Wall cost is one
    sort of |left|+|right| per key group, identical to what any
    merge-based as-of (pandas ``merge_asof``, kdb ``aj``) does after
    its own sort.

    ``tolerance`` (same unit as the timestamp columns) nulls out
    matches further than that from the left timestamp. Equal
    timestamps match in both directions (>= / <= semantics).

    Right rows should be unique per ``(on, right_ts)`` — with
    duplicates the surviving row follows the window order and is not
    deterministic; pre-aggregate (e.g. ``max_by``) to make it so.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    state = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        state.alias("__state"),
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__payload"),
    )
    tagged = r.unionByName(lt, allowMissingColumns=True)

    ts_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "__filled", F.last("__state", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__filled.__ts")
            if direction == "backward"
            else F.col("__filled.__ts") - F.col("__t")
        )
        filled = filled.withColumn(
            "__filled", F.when(gap <= tolerance, F.col("__filled"))
        )

    out = [F.col(f"__payload.{c}").alias(c) for c in left.columns]
    out.append(F.col("__filled.__ts").alias(f"{prefix}{right_ts}"))
    out.extend(F.col(f"__filled.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return filled.select(*out)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join without a cross product: bin the timeline
    into ``bin_width`` buckets, explode each interval to the bins it
    covers (a narrow ``sequence``/``explode``, no shuffle), map each
    point to its single bin, and equi-join on ``(on..., bin)``, then
    filter exact containment.

    Spark plans a bare ``p.ts BETWEEN i.s AND i.e`` predicate as a
    broadcast-nested-loop / cartesian join — |points|×|intervals|
    comparisons. Binning turns it into a hash join whose cost is
    |points| + |intervals|×(span/bin_width) + the true matches, the
    same trick as Databricks' range-join hint. Pick ``bin_width`` on
    the order of the typical interval length: each interval then
    explodes to ~2 bins.

    Inclusive on both ends. Timestamps must be integral (epoch
    µs/ns/seconds) and non-negative so integer ``DIV`` floors.
    """
    ivals = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bin_width}"),
                F.expr(f"{end_col} DIV {bin_width}"),
            )
        ),
    )
    pts = points.withColumn("__bin", F.expr(f"{point_ts} DIV {bin_width}"))
    return (
        pts.join(ivals, [*on, "__bin"])
        .filter(F.col(point_ts).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )


def mismatch_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_col: str,
    right_col: str,
) -> DataFrame:
    """J14: subset-detection join — rows whose attribute disagrees
    between two sources (inner join on keys, keep ``left_col !=
    right_col``). Reference: players whose assigned position differs
    (DEPRECATED/champion-gold-copy.py:314-328).
    """
    return left.join(right, list(on), "inner").filter(
        F.col(left_col) != F.col(right_col)
    )

"""Flagship relational pipelines: E1 silver profiles, E2 gold ratings, per-group windows/z-scores, grouping sets."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    Feature,
    FeatureStore,
    GoldSpec,
    ProfileSpec,
    SparkSession,
    WeightsHierarchy,
    _prepare,
    _t,
    attach_any_season_totals,
    attach_meta,
    build_profiles,
    build_ratings,
    cumcount,
    dedup_keep_best,
    enforce_cast_contract,
    filter_small_groups,
    group_zscores,
    last_n_filter,
    rollup_grouping_sets,
    union_with_coarse_group,
    with_group_rank,
)

# ---------------------------------------------------------------------------
# E1 silver: the flagship profile build over lineitem
# (fact mapping: supplier=player, returnflag=positionGroup,
#  orderkey=matchId recency, quantity=minutes-on-field)
# ---------------------------------------------------------------------------

PLAYTIME_THRESHOLD = 25.0

# (name, spark_fragment, duckdb_fragment) — duck wraps SUM in a BIGINT
# cast because DuckDB promotes SUM(BIGINT) to HUGEINT.
FEATURES: list[tuple[str, str, str]] = [
    (
        "sum_qty",
        "SUM(CAST(l_quantity AS BIGINT))",
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)",
    ),
    ("n_lines", "COUNT(1)", "COUNT(1)"),
    ("distinct_parts", "COUNT(DISTINCT l_partkey)", "COUNT(DISTINCT l_partkey)"),
    ("max_price", "MAX(l_extendedprice)", "MAX(l_extendedprice)"),
    (
        "revenue_cents",
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))",
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)",
    ),
    (
        "high_disc_lines",
        "SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    (
        "avg_qty",
        "SUM(CAST(l_quantity AS BIGINT)) / COUNT(1)",
        "SUM(CAST(l_quantity AS BIGINT)) / COUNT(1)",
    ),
]

FEATURE_STORE = FeatureStore([Feature(n, s) for n, s, _ in FEATURES])

PROFILE_SPEC = ProfileSpec(
    entity_cols=["l_suppkey"],
    group_col="l_returnflag",
    order_col="l_orderkey",
    playtime_col="l_quantity",
    playtime_threshold=PLAYTIME_THRESHOLD,
)

_BASE_COLS = (
    "l_suppkey, l_returnflag, l_orderkey, l_partkey, l_quantity, "
    "l_extendedprice, l_discount, l_linestatus"
)


def _profile_sql(extra_group_cols: str = "") -> str:
    """Oracle for build_profiles (multi_pass formulation ≡ explode)."""
    aggs = ", ".join(f"{d} AS {n}" for n, _, d in FEATURES)
    gcols = ("profileId" + (", " + extra_group_cols if extra_group_cols else ""))
    sel = gcols
    return f"""
WITH base AS (SELECT {_BASE_COLS} FROM lineitem),
anyu AS (
  SELECT * FROM base
  UNION ALL
  SELECT l_suppkey, 'ANY' AS l_returnflag, l_orderkey, l_partkey, l_quantity,
         l_extendedprice, l_discount, l_linestatus FROM base
),
filt AS (
  SELECT *, CAST(l_suppkey AS VARCHAR) || l_returnflag AS profileId
  FROM anyu
  WHERE l_quantity > {PLAYTIME_THRESHOLD} OR l_returnflag = 'ANY'
),
ranked AS (
  SELECT *, rank() OVER (PARTITION BY profileId ORDER BY l_orderkey DESC) AS rnk
  FROM filt
)
SELECT {sel}, 'season' AS aggregationPeriod, {aggs} FROM ranked GROUP BY {gcols}
UNION ALL
SELECT {sel}, 'last_four' AS aggregationPeriod, {aggs} FROM ranked WHERE rnk <= 4 GROUP BY {gcols}
UNION ALL
SELECT {sel}, 'last_eight' AS aggregationPeriod, {aggs} FROM ranked WHERE rnk <= 8 GROUP BY {gcols}
"""


def q_profile_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return build_profiles(li, FEATURE_STORE, PROFILE_SPEC, strategy="explode")


def q_profile_build_multi_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return build_profiles(li, FEATURE_STORE, PROFILE_SPEC, strategy="multi_pass")


def q_silver_e1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full E1: profiles (entity keys carried through the GROUP BY —
    no J4 re-join for determined columns) → ANY/season totals (J5) →
    blanket cast contract (F11). Reference:
    ADAPTERS/SILVER-adapter-wyscout.py:430-503.

    Plan shape: ONE scan+window+aggregate subtree; the J5 self-join's
    totals side is the same aggregate, so Spark reuses the exchange
    instead of recomputing (vs 8 full scans in the join-back
    formulation)."""
    li = _t(spark, sf_dir, "lineitem")
    profiles = build_profiles(
        li,
        FEATURE_STORE,
        PROFILE_SPEC,
        strategy="explode",
        carry_cols=["l_suppkey", "l_returnflag"],
    )
    with_totals = attach_any_season_totals(
        profiles,
        PROFILE_SPEC,
        {"qty_for_season": "sum_qty", "lines_for_season": "n_lines"},
    )
    return enforce_cast_contract(
        with_totals,
        int_cols=["l_suppkey"],
        string_cols=["profileId", "aggregationPeriod", "l_returnflag"],
    )


def _silver_e1_sql() -> str:
    feat_double = ", ".join(f"CAST({n} AS DOUBLE) AS {n}" for n, _, _ in FEATURES)
    return f"""
WITH prof AS ({_profile_sql(extra_group_cols="l_suppkey, l_returnflag")}),
tot AS (
  SELECT l_suppkey, CAST(sum_qty AS DOUBLE) AS qty_for_season,
         CAST(n_lines AS DOUBLE) AS lines_for_season
  FROM prof WHERE l_returnflag = 'ANY' AND aggregationPeriod = 'season'
)
SELECT p.profileId, p.aggregationPeriod,
       CAST(p.l_suppkey AS INTEGER) AS l_suppkey,
       p.l_returnflag,
       {feat_double.replace('CAST(', 'CAST(p.')},
       t.qty_for_season, t.lines_for_season
FROM prof p LEFT JOIN tot t USING (l_suppkey)
"""


# ---------------------------------------------------------------------------
# E2 gold: z-scores + weights hierarchy over the silver output
# ---------------------------------------------------------------------------

WEIGHTS_CSV = """POS,statName,statWgt,metricName,metricWgt,traitName,traitWgt,inverse
A,revenue_cents,0.4,volume,0.6,value,0.5,0
A,sum_qty,0.6,volume,0.6,value,0.5,0
A,high_disc_lines,1.0,discounting,0.4,value,0.5,1
N,revenue_cents,1.0,volume,1.0,value,1.0,0
R,sum_qty,0.5,volume,0.5,value,0.6,0
R,distinct_parts,0.5,variety,0.5,value,0.6,0
ANY,revenue_cents,0.7,volume,1.0,value,1.0,0
ANY,sum_qty,0.3,volume,1.0,value,1.0,0
"""

WEIGHTS = WeightsHierarchy.from_csv(WEIGHTS_CSV)

GOLD_SPEC = GoldSpec(
    norm_group_cols=["positionGroup"],
    sample_size_col="n_lines",
    minutes_col="sum_qty",
    min_sample_size=2,
    min_minutes=50,
)

_GOLD_OUT = ["volume", "discounting", "variety", "value", "Rating"]


def q_gold_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    profiles = build_profiles(li, FEATURE_STORE, PROFILE_SPEC, strategy="explode")
    facts = _prepare(li, PROFILE_SPEC)
    meta = attach_meta(profiles, facts, PROFILE_SPEC, meta_cols=["l_returnflag"])
    gold_in = meta.withColumnRenamed("l_returnflag", "positionGroup")
    rated = build_ratings(gold_in, WEIGHTS, GOLD_SPEC)
    # `+ 0.0` collapses IEEE negative zero (round(-0.001, 2) → -0.0)
    # to +0.0 so the value hash agrees with the oracle, which does the
    # same; every other bit of the value is untouched.
    return rated.select(
        "profileId",
        "positionGroup",
        "aggregationPeriod",
        *[(F.col(c) + F.lit(0.0)).alias(c) for c in _GOLD_OUT],
    )


def _gold_sql() -> str:
    stats = sorted({r.stat_name for r in WEIGHTS.rows})
    inverse = set(WEIGHTS.inverse_stats())
    elig = "positionGroup != 'ANY' AND aggregationPeriod = 'season'"
    win = "OVER (PARTITION BY positionGroup)"
    mu_sd = ", ".join(
        f"avg(CASE WHEN {elig} THEN {s} END) {win} AS mu_{s}, "
        f"stddev_samp(CASE WHEN {elig} THEN {s} END) {win} AS sd_{s}"
        for s in stats
    )
    zs = ", ".join(
        f"(CASE WHEN {s} IS NULL THEN 0.0 "
        f"WHEN sd_{s} IS NULL OR sd_{s} = 0 OR isnan(sd_{s}) THEN 0.0 "
        f"ELSE ({s} - mu_{s}) / sd_{s} END)"
        + (" * -1.0" if s in inverse else "")
        + f" AS zs_{s}"
        for s in stats
    )

    def _case(builder) -> str:
        arms = []
        for pos in WEIGHTS.positions():
            arms.append(f"WHEN positionGroup = '{pos}' THEN {builder(pos)}")
        return "CASE " + " ".join(arms) + " ELSE NULL END"

    def metric_expr(pos: str, metric: str) -> str:
        terms = [
            f"zs_{r.stat_name} * {r.stat_wgt}"
            for r in WEIGHTS.rows
            if r.pos == pos and r.metric_name == metric
        ]
        return " + ".join([str(WEIGHTS.metric_base)] + terms)

    metrics = ", ".join(
        _case(lambda p, m=m: metric_expr(p, m)) + f" AS {m}"
        for m in WEIGHTS.metric_names()
    )

    def trait_expr(pos: str, trait: str) -> str:
        seen: dict[str, float] = {}
        for r in WEIGHTS.rows:
            if r.pos == pos and r.trait_name == trait:
                seen[r.metric_name] = r.metric_wgt
        return " + ".join(["0.0"] + [f"{m} * {w}" for m, w in seen.items()])

    traits = ", ".join(
        _case(lambda p, t=t: trait_expr(p, t)) + f" AS {t}"
        for t in WEIGHTS.trait_names()
    )

    def rating_expr(pos: str) -> str:
        seen: dict[str, float] = {}
        for r in WEIGHTS.rows:
            if r.pos == pos:
                seen[r.trait_name] = r.trait_wgt
        return " + ".join(["0.0"] + [f"{t} * {w}" for t, w in seen.items()])

    rating = _case(rating_expr) + " AS Rating"
    rounded = ", ".join(f'round({c}, 2) + 0.0 AS "{c}"' for c in _GOLD_OUT)
    return f"""
WITH prof AS ({_profile_sql(extra_group_cols="l_returnflag")}),
gold_in AS (
  SELECT profileId, l_returnflag AS positionGroup, aggregationPeriod,
         {', '.join(stats)}
  FROM prof
  WHERE n_lines >= {GOLD_SPEC.min_sample_size} AND sum_qty >= {GOLD_SPEC.min_minutes}
),
stats_w AS (SELECT *, {mu_sd} FROM gold_in),
zsc AS (SELECT *, {zs} FROM stats_w),
m AS (SELECT *, {metrics} FROM zsc),
t AS (SELECT *, {traits} FROM m),
r AS (SELECT *, {rating} FROM t)
SELECT profileId, positionGroup, aggregationPeriod, {rounded} FROM r
"""


def q_group_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/D5 standalone: windowed z-score with the eligibility-gated
    population, over raw lineitem rows."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty_i", F.col("l_quantity").cast("bigint")
    )
    z = group_zscores(
        li,
        group_cols=["l_returnflag", "l_linestatus"],
        stat_cols=["qty_i"],
        eligible=F.col("l_quantity") > 10,
    )
    return z.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        (F.round("zs_qty_i", 6) + F.lit(0.0)).alias("zs_qty"),
    )


_GROUP_ZSCORES_SQL = """
WITH li AS (SELECT *, CAST(l_quantity AS BIGINT) AS qty_i FROM lineitem),
w AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, qty_i,
    avg(CASE WHEN l_quantity > 10 THEN qty_i END)
      OVER (PARTITION BY l_returnflag, l_linestatus) AS mu,
    stddev_samp(CASE WHEN l_quantity > 10 THEN qty_i END)
      OVER (PARTITION BY l_returnflag, l_linestatus) AS sd
  FROM li
)
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
  round(CASE WHEN qty_i IS NULL THEN 0.0
             WHEN sd IS NULL OR sd = 0 OR isnan(sd) THEN 0.0
             ELSE (qty_i - mu) / sd END, 6) + 0.0 AS zs_qty
FROM w
"""


# ---------------------------------------------------------------------------
# Windows / dedup / sequence (W1-W3, A7-A8, O1, P9)
# ---------------------------------------------------------------------------

_LI_KEYS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"]


def q_last_n_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(*_LI_KEYS)
    return last_n_filter(li, ["l_suppkey"], "l_orderkey", 4, use_rank=True)


_LAST_N_SQL = f"""
SELECT {', '.join(_LI_KEYS)} FROM (
  SELECT *, rank() OVER (PARTITION BY l_suppkey ORDER BY l_orderkey DESC) AS rnk
  FROM lineitem
) WHERE rnk <= 4
"""


def q_with_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(*_LI_KEYS)
    ranked = with_group_rank(
        li, ["l_suppkey"], [F.col("l_orderkey").desc()], rank_col="rnk"
    )
    return ranked.withColumn("rnk", F.col("rnk").cast("long"))


_GROUP_RANK_SQL = f"""
SELECT {', '.join(_LI_KEYS)},
       rank() OVER (PARTITION BY l_suppkey ORDER BY l_orderkey DESC) AS rnk
FROM lineitem
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(*_LI_KEYS, "l_extendedprice")
    # (l_orderkey, l_linenumber) alone is NOT unique in the synthetic
    # data — include the remaining projected columns so the order is
    # total and row_number() is engine-independent.
    ranked = with_group_rank(
        li,
        ["l_suppkey"],
        [
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_quantity",
        ],
        rank_col="rnk",
        use_rank=False,
    )
    return ranked.filter(F.col("rnk") <= 3).withColumn(
        "rnk", F.col("rnk").cast("long")
    )


_TOPK_SQL = f"""
SELECT * FROM (
  SELECT {', '.join(_LI_KEYS)}, l_extendedprice,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                                     l_partkey, l_quantity) AS rnk
  FROM lineitem
) WHERE rnk <= 3
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(*_LI_KEYS, "l_extendedprice")
    return dedup_keep_best(
        li,
        ["l_partkey"],
        [
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_quantity",
        ],
    )


_DEDUP_BEST_SQL = f"""
SELECT {', '.join(_LI_KEYS)}, l_extendedprice FROM (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                      l_suppkey, l_quantity) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def q_cumcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(*_LI_KEYS)
    out = cumcount(
        li,
        ["l_suppkey"],
        ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"],
        out_col="seq",
    )
    return out.withColumn("seq", F.col("seq").cast("long"))


_CUMCOUNT_SQL = f"""
SELECT {', '.join(_LI_KEYS)},
       row_number() OVER (PARTITION BY l_suppkey
                          ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity) - 1 AS seq
FROM lineitem
"""


def q_filter_small_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    return filter_small_groups(li, ["l_partkey"], 4)


_SMALL_GROUPS_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
QUALIFY count(*) OVER (PARTITION BY l_partkey) >= 4
"""


# ---------------------------------------------------------------------------
# ANY union / grouping sets (U2)
# ---------------------------------------------------------------------------

_ANY_AGG_SQL = """
WITH anyu AS (
  SELECT l_suppkey, l_returnflag, l_quantity FROM lineitem
  UNION ALL
  SELECT l_suppkey, 'ANY' AS l_returnflag, l_quantity FROM lineitem
)
SELECT l_suppkey, l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(1) AS n_rows
FROM anyu GROUP BY l_suppkey, l_returnflag
"""


def q_any_union_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    u = union_with_coarse_group(li, {"l_returnflag": "ANY"})
    return u.groupBy("l_suppkey", "l_returnflag").agg(
        F.expr("SUM(CAST(l_quantity AS BIGINT))").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return rollup_grouping_sets(
        li,
        ["l_suppkey"],
        "l_returnflag",
        [
            F.expr("SUM(CAST(l_quantity AS BIGINT))").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        ],
    )

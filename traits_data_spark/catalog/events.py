"""Event-stream analytics: windows, sessions, funnels, cohorts, decayed engagement, HLL distinct, transitions, hourly anomalies."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    SparkSession,
    Window,
    _H60,
    _t,
    cohort_retention,
    decayed_engagement,
    funnel_steps,
    group_zscores,
    hll_estimate,
    hll_registers,
    sessionize,
)

# ---------------------------------------------------------------------------
# Events: batch tumbling windows + JSON props flatten
# ---------------------------------------------------------------------------


# events.ts is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false); read
# it as TIMESTAMP_NTZ so no session-timezone conversion is applied,
# then derive epoch µs with pure wall-clock arithmetic against the
# epoch literal. DuckDB's epoch_us(ts) on the same naive timestamp
# yields the identical integer, so the two engines agree regardless
# of the driver session's spark.sql.session.timeZone.
_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

_TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.schema(_EVENTS_SCHEMA).parquet(f"{sf_dir}/events.parquet")


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup (batch form of the streaming windowed
    aggregate). The hour bucket is pure integer arithmetic on epoch
    micros — timezone-independent, so the oracle matches under any
    session timezone. Floor division is spelled ``(x - pmod(x, b))
    DIV b`` (exact on longs) rather than bare ``DIV``, which truncates
    toward zero and would diverge from the oracle's ``date_trunc``
    (a floor) for pre-1970 timestamps."""
    ev = _events(spark, sf_dir).withColumn("__us", F.expr(_TS_US))
    return (
        ev.withColumn(
            "window_start",
            F.expr(
                "(__us - pmod(__us, 3600000000)) DIV 3600000000 * 3600"
            ).cast("long"),
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))").alias("value_cents"),
        )
    )


_EVENT_WINDOWS_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type, COUNT(1) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag/cumsum window): 30-min inactivity gap
    splits per-user sessions. Timestamps in µs on both engines (DuckDB
    truncates parquet nanos to µs; Spark divides explicitly) so the
    gap comparisons are bit-identical."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", F.expr(_TS_US).alias("ts_us")
    )
    return sessionize(
        ev,
        user_col="user_id",
        ts_col="ts_us",
        gap=1_800_000_000,
        order_tiebreak=["event_id"],
    )


_EVENT_SESSIONS_SQL = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
l AS (
  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM e
),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM l
)
SELECT event_id, user_id, ts_us,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_seq
FROM f
"""

# ---------------------------------------------------------------------------
# Product analytics: funnel / cohort retention / decayed engagement / HLL
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel counts over the event stream
    (``operators.analytics.funnel_steps``): users reaching view →
    click → purchase in order, each step strictly after the previous
    step's earliest qualifying event. Integer-exact throughout."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.expr(_TS_US).alias("ts_us")
    )
    return funnel_steps(ev, list(_FUNNEL_STEPS))


_FUNNEL_WITHIN_US = 2 * 3_600_000_000


def q_funnel_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: same ordered chain, but each step
    must land within 2 hours of the previous step's completion
    (``funnel_steps(within=...)``)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.expr(_TS_US).alias("ts_us")
    )
    return funnel_steps(ev, list(_FUNNEL_STEPS), within=_FUNNEL_WITHIN_US)


def _funnel_sql(within: int | None = None) -> str:
    """Oracle for the ordered funnel; ``within`` adds the
    conversion-window bound, mirroring funnel_steps."""

    def bound(prev: str) -> str:
        return f" AND e.ts_us <= {prev}.t + {within}" if within else ""

    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s0 AS (SELECT user_id, min(ts_us) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e JOIN s0 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts_us > s0.t{bound("s0")} GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts_us > s1.t{bound("s1")} GROUP BY 1)
SELECT 0 AS step_idx, 'view' AS step, COUNT(1) AS n_users FROM s0
UNION ALL SELECT 1, 'click', COUNT(1) FROM s1
UNION ALL SELECT 2, 'purchase', COUNT(1) FROM s2
"""



def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle
    (``operators.analytics.cohort_retention``): users bucketed by
    first-activity week, counted per (cohort, week offset), with the
    cohort size alongside so the rate stays integer-exact."""
    ev = _events(spark, sf_dir).select("user_id", F.expr(_TS_US).alias("ts_us"))
    return cohort_retention(ev)


_COHORT_SQL = """
WITH a AS (SELECT DISTINCT user_id,
                  (epoch_us(ts) - ((epoch_us(ts) % 604800000000) + 604800000000) % 604800000000) // 604800000000 AS period FROM events),
f AS (SELECT user_id, min(period) AS cohort FROM a GROUP BY 1),
t AS (SELECT cohort AS cohort_period, period - cohort AS period_offset,
             COUNT(1) AS n_active
      FROM a JOIN f USING (user_id) GROUP BY 1, 2),
s AS (SELECT cohort AS cohort_period, COUNT(1) AS n_cohort FROM f GROUP BY 1)
SELECT cohort_period, period_offset, n_active, n_cohort
FROM t JOIN s USING (cohort_period)
"""


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user half-life-decayed engagement score
    (``operators.analytics.decayed_engagement``): cents shifted by
    exact powers of two relative to each user's most recent event day
    — one order-independent BIGINT sum, one final double division."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr(_TS_US).alias("ts_us"), "value"
    )
    return decayed_engagement(ev)


_DECAYED_SQL = """
WITH e AS (SELECT user_id, (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
m AS (SELECT *, max(day) OVER (PARTITION BY user_id) AS ref FROM e),
k AS (SELECT *, cents * (1::BIGINT << CAST(30 - (ref - day) AS INT)) AS term
      FROM m WHERE ref - day < 30),
g AS (SELECT user_id, MAX(ref) AS ref_day,
             CAST(SUM(term) AS BIGINT) AS decayed_scaled
      FROM k GROUP BY user_id)
SELECT user_id, ref_day, decayed_scaled,
       decayed_scaled::DOUBLE / 1073741824 AS decayed_score
FROM g
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HyperLogLog distinct-doc_id estimate with portable
    registers (``operators.sketches.hll_registers``/``hll_estimate``):
    unlike approx_count_distinct's engine-private HLL++ bytes, the
    register table is reproducible bit-for-bit by the SQL oracle."""
    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    regs = hll_registers(docs, ["source"], "doc_id")
    return hll_estimate(regs, ["source"])


_HLL_REM = 1 << 54


def _hll_sql() -> str:
    h = _H60.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT source, {h} // {_HLL_REM} AS bucket,
         CASE WHEN {h} % {_HLL_REM} = 0 THEN 55
              ELSE 54 - (length(bin({h} % {_HLL_REM})) - 1) END AS rho
  FROM documents),
regs AS (SELECT source, bucket, MAX(rho) AS register FROM r GROUP BY 1, 2),
filled AS (
  SELECT s.source, b.bucket, COALESCE(register, 0) AS register
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT range AS bucket FROM range(64)) b
  LEFT JOIN regs USING (source, bucket)),
agg AS (
  SELECT source,
         CAST(SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_registers,
         CAST(SUM(1::BIGINT << (48 - LEAST(register, 48))) AS BIGINT)
           AS sum_scaled
  FROM filled GROUP BY source)
SELECT source, zero_registers, sum_scaled,
       CAST(FLOOR(0.709::DOUBLE * 64 * 64 * 281474976710656::DOUBLE
                  / sum_scaled) AS BIGINT) AS distinct_est
FROM agg
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the event-type transition matrix — for each
    (src, dst) pair, how often dst immediately follows src within a
    user's ordered stream. One sorted shuffle on the user key (lead
    window), one small-output aggregate."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.expr(_TS_US).alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    return pairs.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))


_TRANSITIONS_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
           FROM events),
l AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS dst
  FROM e
)
SELECT src, dst, COUNT(*) AS n_transitions
FROM l WHERE dst IS NOT NULL GROUP BY 1, 2
"""


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection as pure composition: the hourly tumbling
    rollup (q_event_windows) fed through the per-group z-score ladder
    (operators.zscore.group_zscores) — hours whose event count sits
    ≥2σ from that event type's mean are flagged. Demonstrates that the
    catalog's operators compose without glue code."""
    hourly = q_event_windows(spark, sf_dir).drop("value_cents")
    z = group_zscores(hourly, ["event_type"], ["n_events"])
    zr = F.round("zs_n_events", 6) + F.lit(0.0)
    return z.select(
        "window_start",
        "event_type",
        "n_events",
        zr.alias("z"),
        (F.abs(zr) >= 2.0).alias("is_anomaly"),
    )


def _hourly_anomalies_sql() -> str:
    return f"""
WITH h AS ({_EVENT_WINDOWS_SQL}),
w AS (
  SELECT window_start, event_type, n_events,
         avg(n_events) OVER (PARTITION BY event_type) AS mu,
         stddev_samp(n_events) OVER (PARTITION BY event_type) AS sd
  FROM h
),
z AS (
  SELECT window_start, event_type, n_events,
         round(CASE WHEN n_events IS NULL THEN 0.0
                    WHEN sd IS NULL OR sd = 0 OR isnan(sd) THEN 0.0
                    ELSE (n_events - mu) / sd END, 6) + 0.0 AS z
  FROM w
)
SELECT window_start, event_type, n_events, z, abs(z) >= 2.0 AS is_anomaly
FROM z
"""

"""Join/merge/table utilities: event stats, outer-join fill, JSON props, upserts, as-of/range joins, CDC chunking, substring dedup, salted stats, scalar funcs, multimodal metadata."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    Feature,
    FeatureStore,
    SparkSession,
    _H60,
    _docs_wide,
    _t,
    age_at,
    asof_join,
    cdc_chunks,
    dim_join,
    distinct_dims,
    extract_audio_features,
    extract_audio_metadata,
    extract_image_features,
    extract_image_metadata,
    extract_video_metadata,
    frame_sample_plan,
    hash_split,
    incremental_new_keys,
    map_lookup,
    merge_upsert,
    mismatch_join,
    null_zero_profile,
    percentile_profile,
    range_join_binned,
    remove_dup_substrings,
    substring_dup_profile,
    surrogate_key,
    synthetic_media_table,
    synthetic_mp4_media,
    synthetic_png_media,
    synthetic_wav_media,
    synthetic_webm_media,
)
from traits_data_spark.catalog.events import (
    _TS_US,
    _events,
)

# A2: the stats-catalogue shape — conditional aggregates compiled from
# metadata rows, deriving per-entity stats from an event stream
# (STAGING/SILVER-adapter-statsbomb-notebook.ipynb:171 stats_catalogue.csv).
EVENT_STATS_CATALOGUE: list[tuple[str, str, str]] = [
    (
        "n_clicks",
        "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    (
        "n_purchases",
        "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    (
        "purchase_cents",
        "SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)",
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)",
    ),
    (
        "n_errors",
        "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    ("n_events", "COUNT(1)", "COUNT(1)"),
    (
        "error_rate_bp",
        "SUM(CASE WHEN event_type = 'error' THEN 10000 ELSE 0 END) / COUNT(1)",
        "SUM(CASE WHEN event_type = 'error' THEN 10000 ELSE 0 END) / COUNT(1)",
    ),
]


def q_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    fs = FeatureStore([Feature(n, s) for n, s, _ in EVENT_STATS_CATALOGUE])
    return fs.aggregate(ev, ["user_id"])


_EVENT_STATS_SQL = (
    "SELECT user_id, "
    + ", ".join(f"{d} AS {n}" for n, _, d in EVENT_STATS_CATALOGUE)
    + " FROM events GROUP BY user_id"
)


def q_outer_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: the cards pattern — two per-entity count frames joined FULL
    OUTER with zero-fill (yellow ⋈ red cards,
    STAGING/SILVER-adapter-statsbomb-notebook.ipynb:187)."""
    ev = _events(spark, sf_dir)
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return errors.join(purchases, "user_id", "outer").na.fill(
        0, ["n_errors", "n_purchases"]
    )


_OUTER_JOIN_SQL = """
WITH e AS (SELECT user_id, COUNT(1) AS n_errors FROM events
           WHERE event_type = 'error' GROUP BY user_id),
p AS (SELECT user_id, COUNT(1) AS n_purchases FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(e.user_id, p.user_id) AS user_id,
       COALESCE(n_errors, 0) AS n_errors,
       COALESCE(n_purchases, 0) AS n_purchases
FROM e FULL OUTER JOIN p ON e.user_id = p.user_id
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("prop_k"),
    )


_JSON_PROPS_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
"""


# ---------------------------------------------------------------------------
# Upserts / incremental / dims / joins / scalars
# ---------------------------------------------------------------------------

_ORD_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 != 0).select(
        *_ORD_COLS, F.lit("old").alias("src")
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        *_ORD_COLS, F.lit("new").alias("src")
    )
    return merge_upsert(existing, updates, ["o_orderkey"])


_MERGE_SQL = f"""
WITH e AS (SELECT {', '.join(_ORD_COLS)}, 'old' AS src FROM orders WHERE o_orderkey % 3 != 0),
u AS (SELECT {', '.join(_ORD_COLS)}, 'new' AS src FROM orders WHERE o_orderkey % 2 = 0)
SELECT * FROM u
UNION ALL
SELECT e.* FROM e WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
"""


def q_merge_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + retraction: the reference deletes a match's silver files
    when the upstream re-fetch answers "No statistical data"
    (UPDATERS/wyscout-bronze-batch.py:60-76). MERGE with a keyed
    tombstone set — a retracted key vanishes even when the same batch
    also carries an update for it (delete wins, fail-safe)."""
    o = _t(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 != 0).select(
        *_ORD_COLS, F.lit("old").alias("src")
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        *_ORD_COLS, F.lit("new").alias("src")
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    return merge_upsert(existing, updates, ["o_orderkey"], deletes=deletes)


_MERGE_DELETE_SQL = f"""
WITH e AS (SELECT {', '.join(_ORD_COLS)}, 'old' AS src FROM orders WHERE o_orderkey % 3 != 0),
u AS (SELECT {', '.join(_ORD_COLS)}, 'new' AS src FROM orders WHERE o_orderkey % 2 = 0),
m AS (
  SELECT * FROM u
  UNION ALL
  SELECT e.* FROM e WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
)
SELECT * FROM m
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)
"""


def q_incremental_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    incoming = o.select("o_orderkey", "o_custkey", "o_orderstatus")
    existing = o.filter(F.col("o_orderkey") % 5 == 0).select("o_orderkey")
    return incremental_new_keys(incoming, existing, ["o_orderkey"])


_INCREMENTAL_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0)
"""


def q_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    joined = dim_join(cust, nat, ["c_nationkey"])
    return distinct_dims(joined, {"nation": ["c_nationkey", "n_name"]})["nation"]


_DISTINCT_DIMS_SQL = """
SELECT DISTINCT c_nationkey, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with the timestamp in epoch µs — the cross-engine unit
    (both engines read the naive TIMESTAMP(MICROS) column and take its
    raw micros: DuckDB via epoch_us, Spark via wall-clock diff)."""
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.expr(_TS_US).alias("ts_us"),
        "event_type",
        "value",
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the most recent error
    event at-or-before it for the same user (union + window fill — no
    join node; see ``operators.joins.asof_join``). The error side is
    pre-aggregated to unique (user, ts) with ``max_by`` so both
    engines resolve duplicate timestamps identically."""
    ev = _events_us(spark, sf_dir)
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts_us")
        .agg(F.expr("max_by(value, event_id)").alias("state_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=["state_value"],
    )
    # no-prior-error rows → sentinel instead of NULL (the driver's
    # order-insensitive compare sorts rows; NULLs aren't orderable
    # against values cross-engine)
    return out.withColumns(
        {
            "asof_ts_us": F.coalesce("asof_ts_us", F.lit(-1).cast("long")),
            "asof_state_value": F.coalesce("asof_state_value", F.lit(-1.0)),
        }
    )


_ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
),
r AS (
  SELECT user_id, ts_us, arg_max(value, event_id) AS state_value
  FROM ev WHERE event_type = 'error' GROUP BY 1, 2
),
l AS (
  SELECT event_id, user_id, ts_us, value AS purchase_value
  FROM ev WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.ts_us, l.purchase_value,
       CAST(COALESCE(r.ts_us, -1) AS BIGINT) AS asof_ts_us,
       COALESCE(r.state_value, -1.0) AS asof_state_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: purchases within one hour after an error by
    the same user. The oracle is the plain BETWEEN join DuckDB plans
    natively; the Spark side is the binned equi-join that avoids the
    nested-loop plan (see ``operators.joins.range_join_binned``)."""
    ev = _events_us(spark, sf_dir)
    win = 3_600_000_000  # 1 h in µs
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_us").alias("win_start"),
        (F.col("ts_us") + win).alias("win_end"),
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts_us").alias("p_ts")
    )
    joined = range_join_binned(
        points, intervals, "p_ts", "win_start", "win_end", bin_width=win,
        on=["user_id"],
    )
    return joined.select(
        "error_id",
        "purchase_id",
        "user_id",
        (F.col("p_ts") - F.col("win_start")).alias("gap_us"),
    )


_RANGE_JOIN_SQL = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
e AS (SELECT event_id AS error_id, user_id, ts_us AS t0 FROM ev WHERE event_type = 'error'),
p AS (SELECT event_id AS purchase_id, user_id, ts_us AS pt FROM ev WHERE event_type = 'purchase')
SELECT e.error_id, p.purchase_id, e.user_id, CAST(p.pt - e.t0 AS BIGINT) AS gap_us
FROM e JOIN p ON e.user_id = p.user_id AND p.pt BETWEEN e.t0 AND e.t0 + 3600000000
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split of the document corpus
    by hashed doc_id (``operators.sampling.hash_split``) — pure
    projection, reproducible on any engine/partitioning."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs, "doc_id")


_HASH_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {_H60.format(x="CAST(doc_id AS VARCHAR)")} % 10000 AS b
  FROM documents
)
"""


CDC_WINDOW = 8
CDC_MODULUS = 64


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: hash-anchored boundaries so edits
    shift only local chunks — the chunk-level-dedup companion to the
    fixed-size ``chunk_docs``."""
    docs = _docs_wide(spark, sf_dir)
    return cdc_chunks(
        docs, window=CDC_WINDOW, modulus=CDC_MODULUS
    ).withColumnRenamed("id", "doc_id")


def _cdc_sql() -> str:
    w, m = CDC_WINDOW, CDC_MODULUS
    h28 = "CAST(('0x' || substring(md5({x}), 1, 7)) AS BIGINT)"
    bexpr = h28.format(x=f"substring(text, p - {w - 1}, {w})")
    return f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS len FROM documents
  WHERE text IS NOT NULL
),
pos AS (
  SELECT doc_id, text, len, unnest(range({w}, len + 1)) AS p FROM d
),
b AS (
  SELECT doc_id, p AS e FROM pos WHERE {bexpr} % {m} = 0
),
ends AS (
  SELECT doc_id, e FROM b
  UNION
  SELECT doc_id, len AS e FROM d WHERE len >= 1
),
sp AS (
  SELECT doc_id, e,
         row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx,
         COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s
  FROM ends
)
SELECT sp.doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(e - s + 1 AS BIGINT) AS chunk_len,
       {_H60.format(x="substring(d.text, CAST(s AS INT), CAST(e - s + 1 AS INT))")} AS chunk_hash
FROM sp JOIN d USING (doc_id)
"""


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk-level dedup over CDC chunks: per document,
    how many of its chunks also occur elsewhere (hash shared with ≥2
    (doc, chunk) occurrences) — the boilerplate/quotation detector
    that document-level dedup can't see, and the reason CDC boundaries
    beat fixed-size ones (edits don't break the alignment)."""
    docs = _docs_wide(spark, sf_dir)
    ch = cdc_chunks(docs, window=CDC_WINDOW, modulus=CDC_MODULUS)
    counts = ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    per_doc = (
        ch.join(counts, "chunk_hash")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__occ") >= 2, 1).otherwise(0)).alias(
                "dup_chunks"
            ),
        )
    )
    return per_doc.select(
        F.col("id").alias("doc_id"),
        "n_chunks",
        F.col("dup_chunks").cast("long").alias("dup_chunks"),
        F.round(
            F.col("dup_chunks").cast("double") / F.col("n_chunks"), 4
        ).alias("dup_chunk_frac"),
    )


def _chunk_dedup_sql() -> str:
    return f"""
WITH ch AS ({_cdc_sql()}),
occ AS (SELECT chunk_hash, COUNT(*) AS n_occ FROM ch GROUP BY chunk_hash),
pd AS (
  SELECT ch.doc_id, COUNT(*) AS n_chunks,
         SUM(CASE WHEN occ.n_occ >= 2 THEN 1 ELSE 0 END) AS dup_chunks
  FROM ch JOIN occ USING (chunk_hash)
  GROUP BY ch.doc_id
)
SELECT doc_id, n_chunks, CAST(dup_chunks AS BIGINT) AS dup_chunks,
       round(CAST(dup_chunks AS DOUBLE) / n_chunks, 4) AS dup_chunk_frac
FROM pd
"""


SUBSTR_WINDOW = 16


def q_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication profile
    (``operators.dedup.substring_dup_profile``): per document, the
    count and basis-point share of stride-1 16-word windows occurring
    ≥2 times corpus-wide — the distributed hash-window equivalent of
    Lee et al. 2022's suffix-array substring dedup."""
    docs = _docs_wide(spark, sf_dir)
    return substring_dup_profile(
        docs, text_col="text", id_col="doc_id", window=SUBSTR_WINDOW
    )


def _substring_dups_sql() -> str:
    w = SUBSTR_WINDOW
    gram = f"array_to_string(ts[i:i + {w - 1}], ' ')"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                     x -> length(x) > 0) AS ts
  FROM documents
),
sized AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) >= {w}),
g AS (
  SELECT doc_id, {_H60.format(x=gram)} AS wh
  FROM (SELECT doc_id, ts, unnest(range(1, n - {w - 2})) AS i FROM sized)
),
c AS (SELECT doc_id, wh, COUNT(*) OVER (PARTITION BY wh) AS occ FROM g),
pd AS (
  SELECT doc_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS dup_windows
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_windows, CAST(dup_windows AS BIGINT) AS dup_windows,
       CAST(dup_windows * 10000 // n_windows AS BIGINT) AS dup_bp
FROM pd
"""


def q_remove_dup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-duplication removal
    (``operators.dedup.remove_dup_substrings``): every duplicated
    16-word token window keeps only its first corpus-order occurrence;
    covered tokens are dropped and documents reassembled — the removal
    step of Lee et al. 2022 that ``substring_dups`` only profiles."""
    docs = _docs_wide(spark, sf_dir)
    return remove_dup_substrings(
        docs, text_col="text", id_col="doc_id", window=SUBSTR_WINDOW
    )


def _remove_dup_substrings_sql() -> str:
    w = SUBSTR_WINDOW
    gram = f"array_to_string(ts[i:i + {w - 1}], ' ')"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                     x -> length(x) > 0) AS ts
  FROM documents WHERE text IS NOT NULL
),
sized AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
tok AS (SELECT doc_id, n, unnest(ts) AS tk,
               unnest(range(1, n + 1)) AS pos
        FROM sized),
g AS (
  SELECT doc_id, i AS s, {_H60.format(x=gram)} AS wh
  FROM (SELECT doc_id, ts, unnest(range(1, n - {w - 2})) AS i
        FROM sized WHERE n >= {w})
),
-- one aggregate: occurrence count + min(struct) first-occurrence winner,
-- mirroring the operator's map-side-combinable shape
of AS (SELECT wh, COUNT(*) AS occ,
              min({{'doc_id': doc_id, 's': s}}) AS f
       FROM g GROUP BY wh),
rm AS (SELECT g.doc_id, g.s FROM g JOIN of USING (wh)
       WHERE occ >= 2 AND NOT (g.doc_id = f.doc_id AND g.s = f.s)),
cov AS (SELECT DISTINCT doc_id, pos FROM
          (SELECT doc_id, unnest(range(s, s + {w})) AS pos FROM rm)),
kept AS (SELECT t.doc_id, t.n, t.tk, t.pos FROM tok t
         ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.pos = cov.pos)
SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
       count(*) AS kept_tokens,
       string_agg(tk, ' ' ORDER BY pos) AS clean_text
FROM kept GROUP BY doc_id
"""


def q_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (pre-aggregate on (key, salt),
    merge per key) over lineitem — result-identical to the plain
    GROUP BY the oracle runs, which is exactly the point: salting
    changes the shuffle shape, never the answer. Partials are integer
    (cents), so the merge is order-independent cross-engine."""
    from traits_data_spark.operators.skew import two_phase_agg

    li = _t(spark, sf_dir, "lineitem")
    return two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "qty_cents": F.sum(
                F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
            ),
            "n_rows": F.count(F.lit(1)),
            "max_price_cents": F.max(
                F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            ),
        },
        combiners={"max_price_cents": F.max},
    )


_SALTED_STATS_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       COUNT(1) AS n_rows,
       MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS max_price_cents
FROM lineitem GROUP BY l_returnflag
"""


def q_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (A10 distribution sanity as data) —
    linear interpolation is bit-identical to DuckDB quantile_cont."""
    li = _t(spark, sf_dir, "lineitem")
    return percentile_profile(
        li, ["l_returnflag"], "l_extendedprice", ps=(0.5, 0.95)
    )


_PERCENTILE_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY 1
"""


def q_mismatch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_nationkey"
    )
    return mismatch_join(cust, supp, ["k"], "c_nationkey", "s_nationkey")


_MISMATCH_SQL = """
SELECT c_custkey AS k, c_nationkey, s_nationkey
FROM customer JOIN supplier ON c_custkey = s_suppkey
WHERE c_nationkey != s_nationkey
"""


def q_feature_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass FILTER(WHERE) aggregation — the safe path after the
    compound-fragment guard."""
    li = _t(spark, sf_dir, "lineitem")
    fs = FeatureStore([Feature("qty_f", "SUM(CAST(l_quantity AS BIGINT))")])
    return li.groupBy("l_returnflag").agg(
        *fs.columns(where="l_linestatus = 'F'")
    )


_FEATURE_FILTER_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pri = {
        "1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3,
        "4-NOT SPECIFIED": 4, "5-LOW": 5,
    }
    return o.select(
        "o_orderkey",
        surrogate_key("o_custkey", "o_orderstatus").alias("surr_key"),
        age_at(
            F.col("o_orderdate").cast("date"), F.lit("2026-06-15").cast("date")
        ).cast("long").alias("age_years"),
        map_lookup("o_orderpriority", pri, default=F.lit(0)).alias("pri_code"),
    )


_SCALAR_SQL = """
SELECT o_orderkey,
  CAST(o_custkey AS VARCHAR) || o_orderstatus AS surr_key,
  CAST(2026 - year(o_orderdate)
       - CASE WHEN (month(o_orderdate), day(o_orderdate)) > (6, 15) THEN 1 ELSE 0 END
       AS BIGINT) AS age_years,
  CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
       WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
       WHEN '5-LOW' THEN 5 ELSE 0 END AS pri_code
FROM orders
"""


def q_null_zero_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return null_zero_profile(li, ["l_discount", "l_tax"])


_NULL_ZERO_SQL = """
SELECT
  SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) / COUNT(1) * 100 AS pct_null_l_discount,
  SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) / COUNT(1) * 100 AS pct_zero_l_discount,
  SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) / COUNT(1) * 100 AS pct_null_l_tax,
  SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) / COUNT(1) * 100 AS pct_zero_l_tax
FROM lineitem
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas over binary media columns (stub
    decode). Rows-only check — binary payloads have no SQL oracle."""
    media = synthetic_media_table(spark, n=256)
    return extract_image_features(media)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio branch of the multimodal plumbing (stub resample kernel,
    real Arrow batch shape). Rows-only check."""
    media = synthetic_media_table(spark, n=256)
    return extract_audio_features(media.select("media_id", "payload"))


def q_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode, hash-checked: real PNG payloads are generated
    executor-side with known parameters, parsed back by the tiered
    decoder (native stdlib tier in this container), and the oracle
    predicts width/height arithmetically — if the parser breaks, the
    hash diverges. Unlike ``multimodal_features`` this is a FULL
    correctness entry, not rows-only. Oracle assumes the native tier
    (PIL absent); with PIL deployed the decoder column reads 'pil'."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("media_id")
    )
    media = synthetic_png_media(sup)
    return extract_image_metadata(media).select(
        "media_id", "format", "width", "height", "decoder"
    )


_IMAGE_META_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS media_id,
       'png' AS format,
       CAST(16 + s_suppkey % 10 AS INT) AS width,
       CAST(8 + s_suppkey % 7 AS INT) AS height,
       'native' AS decoder
FROM supplier
"""


def q_video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video-container decode, hash-checked: minimal spec-valid
    MP4s (ftyp + moov/mvhd + trak/tkhd, stdlib-built) are generated
    executor-side with known parameters and parsed back by the native
    ISO-BMFF tier (``operators.multimodal.decode_video``); the oracle
    predicts duration/width/height/track-count arithmetically — if the
    box walker breaks, the hash diverges. Frame/pixel decode needs a
    codec library (absent here); container metadata is what partition
    planning and ``frame_sample_plan`` consume."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("media_id")
    )
    media = synthetic_mp4_media(sup)
    return extract_video_metadata(media.select("media_id", "payload")).select(
        "media_id", "format", "duration_s", "width", "height",
        "n_tracks", "decoder",
    )


_VIDEO_META_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS media_id,
       'mp4' AS format,
       CAST(500 + (s_suppkey % 100) * 40 AS DOUBLE) / 1000.0 AS duration_s,
       CAST(320 + (s_suppkey % 5) * 16 AS INT) AS width,
       CAST(180 + (s_suppkey % 3) * 60 AS INT) AS height,
       CAST(1 + s_suppkey % 2 AS INT) AS n_tracks,
       'native' AS decoder
FROM supplier
"""


def q_webm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EBML/WebM container decode, hash-checked — the round-10
    extension of the ``video_metadata`` tier pattern to the second
    major video container family: minimal spec-valid WebM files (EBML
    header + Segment/Info/Tracks, stdlib-built) generated
    executor-side with known parameters and parsed back by the
    native_ebml tier (``operators.multimodal._parse_webm`` — VINT
    walker tolerant of malformed/unknown-size elements). The oracle
    predicts every field arithmetically: duration_s =
    ms·10⁶/10⁹ (exact integer multiply then one IEEE division,
    mirrored in SQL), dims/track-count from the id formulas."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("media_id")
    )
    media = synthetic_webm_media(sup)
    return extract_video_metadata(media.select("media_id", "payload")).select(
        "media_id", "format", "duration_s", "width", "height",
        "n_tracks", "decoder",
    )


_WEBM_META_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS media_id,
       'webm' AS format,
       CAST(400 + (s_suppkey % 90) * 50 AS DOUBLE) * 1000000.0
         / 1000000000.0 AS duration_s,
       CAST(256 + (s_suppkey % 6) * 32 AS INT) AS width,
       CAST(144 + (s_suppkey % 4) * 72 AS INT) AS height,
       CAST(1 + s_suppkey % 3 AS INT) AS n_tracks,
       'native_ebml' AS decoder
FROM supplier
"""


def q_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode, hash-checked: real 16-bit PCM WAVs (square
    wave ⇒ RMS equals the amplitude exactly) generated executor-side,
    decoded by the stdlib ``wave`` tier, oracle predicts every field
    arithmetically. duration_s is the same double division on both
    engines, so it hashes bit-exactly."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("media_id")
    )
    media = synthetic_wav_media(sup)
    return extract_audio_metadata(media.select("media_id", "payload")).select(
        "media_id", "sample_rate", "n_channels", "n_frames",
        "duration_s", "rms", "decoder",
    )


_AUDIO_META_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS media_id,
       CAST(8000 + (s_suppkey % 3) * 4000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(50 + s_suppkey % 20 AS BIGINT) AS n_frames,
       CAST(50 + s_suppkey % 20 AS DOUBLE)
         / (8000 + (s_suppkey % 3) * 4000) AS duration_s,
       CAST(1000 + (s_suppkey % 5) * 100 AS DOUBLE) AS rms,
       'native' AS decoder
FROM supplier
"""


_FRAME_EVERY_N = 30


def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (``operators.multimodal``): expand
    (media_id, n_frames) to one row per sampled index — pure
    sequence+explode, so unlike the decode kernels it has a full SQL
    oracle. Frame counts derive deterministically from supplier keys."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("media_id"),
        (F.col("s_suppkey") % 300 + 1).alias("n_frames"),
    )
    out = frame_sample_plan(sup, every_n=_FRAME_EVERY_N)
    return out.withColumn("frame_idx", F.col("frame_idx").cast("long"))


_FRAME_SQL = f"""
SELECT s_suppkey AS media_id,
       s_suppkey % 300 + 1 AS n_frames,
       CAST(unnest(range(0, s_suppkey % 300 + 1, {_FRAME_EVERY_N})) AS BIGINT)
         AS frame_idx
FROM supplier
"""

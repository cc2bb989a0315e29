"""Sketches and table summaries: sampled quantiles, histograms, KMV, rolling aggs, TF-IDF, stratified samples, pivots, incremental merge, continuous rollup, CMS, chunking, packing."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    SparkSession,
    _H60,
    _docs_wide,
    _t,
    chunk_documents,
    cms_estimate,
    count_min_sketch,
    histogram_sketch,
    kmv_distinct,
    kmv_set_ops,
    merge_aggregate_states,
    pack_best_fit,
    pack_contiguous,
    pivot_wide,
    rolling_range_agg,
    sampled_quantiles,
    stratified_sample,
    tfidf_top_terms,
    word_array,
)
from traits_data_spark.catalog.events import (
    _TS_US,
    _events,
)

# ---------------------------------------------------------------------------
# Sketches / rolling windows / TF-IDF / stratified sampling / pivot
# ---------------------------------------------------------------------------

_KMV_K = 64
_SQ_RATE_BP = 1000


def q_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles from a deterministic 10% hash sample
    (``operators.sketches.sampled_quantiles``): the engine-portable
    alternative to ``approx_percentile``, whose GK/KLL state is
    engine-private. Discrete rank selection of actual data values —
    no interpolation arithmetic to diverge cross-engine."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "__key", F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
    )
    return sampled_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        "__key",
        quantiles=(0.5, 0.9, 0.99),
        rate_bp=_SQ_RATE_BP,
    )


def _sampled_quantiles_sql() -> str:
    key = "l_orderkey || ':' || l_linenumber"
    h = _H60.format(x=key)
    picks = ",\n  ".join(
        f"MAX(CASE WHEN rn = CAST(FLOOR({q} * (n - 1)) AS BIGINT) + 1 "
        f"THEN v END) AS p{int(round(q * 100))}"
        for q in (0.5, 0.9, 0.99)
    )
    return f"""
WITH s AS (
  SELECT l_returnflag, l_extendedprice AS v, {key} AS k
  FROM lineitem WHERE {h} % 10000 < {_SQ_RATE_BP}
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY v, k) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM s
)
SELECT l_returnflag, COUNT(*) AS n_sample,
  {picks}
FROM r GROUP BY l_returnflag
"""


HIST_LO, HIST_HI, HIST_BINS = 0, 11_008_000, 32  # price cents


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag equi-width histogram of l_extendedprice in cents
    (``operators.sketches.histogram_sketch``): integer-exact binning,
    add-mergeable cells, one map-side-combined aggregate."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("__cents"),
    )
    return histogram_sketch(
        li, ["l_returnflag"], "__cents", lo=HIST_LO, hi=HIST_HI, n_bins=HIST_BINS
    )


def _price_histogram_sql() -> str:
    width = (HIST_HI - HIST_LO) // HIST_BINS
    return f"""
WITH c AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT l_returnflag,
         CAST(LEAST(GREATEST((cents - {HIST_LO}) // {width}, 0),
                    {HIST_BINS - 1}) AS INT) AS bin
  FROM c
)
SELECT l_returnflag, bin, COUNT(1) AS cnt FROM b GROUP BY 1, 2
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch: engine-portable alternative to
    HLL++ ``approx_count_distinct`` — the estimate is recomputable
    bit-for-bit by any engine (``operators.sketches``)."""
    li = _t(spark, sf_dir, "lineitem")
    return kmv_distinct(li, ["l_returnflag"], "l_partkey", k=_KMV_K)


def _kmv_sql() -> str:
    scale = repr(float(_KMV_K - 1) * float(2**60))
    return f"""
WITH d AS (
  SELECT DISTINCT l_returnflag, {_H60.format(x='CAST(l_partkey AS VARCHAR)')} AS h
  FROM lineitem WHERE l_partkey IS NOT NULL
),
r AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM d
),
a AS (
  SELECT l_returnflag, COUNT(*) AS n_distinct,
         MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
  FROM r GROUP BY 1
)
SELECT l_returnflag, n_distinct,
       CASE WHEN n_distinct < {_KMV_K} THEN n_distinct
            ELSE CAST(FLOOR({scale} / kth) AS BIGINT) END AS distinct_est
FROM a
"""


_KMV_OVERLAP_K = 64


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise customer-base overlap between order priorities
    (``operators.sketches.kmv_set_ops``): union / intersection
    distinct estimates from merged k-min sketches — the set algebra
    HLL cannot do."""
    o = _t(spark, sf_dir, "orders")
    return kmv_set_ops(o, "o_orderpriority", "o_custkey", k=_KMV_OVERLAP_K)


def _kmv_overlap_sql() -> str:
    k = _KMV_OVERLAP_K
    scale = repr(float(k - 1) * float(2**60))
    return f"""
WITH d AS (
  SELECT DISTINCT o_orderpriority AS g,
         {_H60.format(x='CAST(o_custkey AS VARCHAR)')} AS h
  FROM orders WHERE o_custkey IS NOT NULL
),
r AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d
),
sk AS (
  SELECT g, list_slice(list(h ORDER BY h), 1, {k}) AS mins
  FROM r WHERE rn <= {k} GROUP BY g
),
p AS (
  SELECT a.g AS group_a, b.g AS group_b, a.mins AS ma, b.mins AS mb
  FROM sk a JOIN sk b ON a.g < b.g
),
m AS (
  SELECT group_a, group_b, ma, mb,
         list_slice(list_sort(list_distinct(list_cat(ma, mb))), 1, {k}) AS mg
  FROM p
),
e AS (
  SELECT group_a, group_b,
         len(mg) AS msz,
         len(list_intersect(mg, list_intersect(ma, mb))) AS mtch,
         CASE WHEN len(mg) < {k} THEN CAST(len(mg) AS BIGINT)
              ELSE CAST(FLOOR({scale} / list_extract(mg, {k})) AS BIGINT)
         END AS union_distinct
  FROM m
)
SELECT group_a, group_b, union_distinct,
       CAST(mtch AS BIGINT) * union_distinct // msz AS intersect_distinct,
       round(mtch / msz::DOUBLE, 6) + 0.0 AS jaccard_k
FROM e
"""


_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def q_rolling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling spend per customer: RANGE frame over epoch day —
    sliding aggregate inside one sorted shuffle, not a range
    self-join (``operators.windows.rolling_range_agg``)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # o_orderdate is TIMESTAMP_NTZ; NTZ→TIMESTAMP is the identity
        # under the UTC session timezone, and TIMESTAMP→BIGINT is epoch
        # seconds — matching DuckDB's epoch().
        F.expr(
            "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) DIV 86400"
        ).alias("day"),
        F.expr(_CENTS).alias("__cents"),
    )
    out = rolling_range_agg(
        o,
        ["o_custkey"],
        "day",
        6,
        {
            "cents_7d": F.sum("__cents"),
            "n_orders_7d": F.count(F.lit(1)),
        },
    )
    return out.drop("__cents")


_ROLLING_SQL = f"""
SELECT o_orderkey, o_custkey, day,
  CAST(SUM({_CENTS}) OVER w AS BIGINT) AS cents_7d,
  COUNT(1) OVER w AS n_orders_7d
FROM (
  SELECT *, CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

_TFIDF_K = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (``operators.text``)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, k=_TFIDF_K)


# word splitting mirrors word_array / _TOKEN_SQL exactly
_WORDS_SQL = r"""
  SELECT doc_id, lower(w) AS term
  FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
             x -> length(x) > 0)) AS w
    FROM documents
  )
"""

_TFIDF_SQL = f"""
WITH words AS ({_WORDS_SQL}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df_docs FROM words GROUP BY 1),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf, dfreq.df_docs,
         ROUND(LN((nd.n + 1.0) / (dfreq.df_docs + 1.0)), 6) AS idf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
s2 AS (SELECT *, ROUND(tf * idf, 6) AS score FROM scored),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn FROM s2)
SELECT term, doc_id, tf, df_docs, idf, score FROM r WHERE rn <= {_TFIDF_K}
"""

_STRATA_FRACTIONS = {"en": 0.2, "zh": 0.5}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rebalancing: downsample 'en' to 20% and
    'zh' to 50% by deterministic key hash, keep the rest whole
    (``operators.sampling.stratified_sample``)."""
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", _STRATA_FRACTIONS, "doc_id", default_fraction=1.0
    )


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN '{v}' THEN {int(round(f * 10000))}"
        for v, f in _STRATA_FRACTIONS.items()
    )
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM (
  SELECT *, {_H60.format(x='CAST(doc_id AS VARCHAR)')} % 10000 AS b
  FROM documents
)
WHERE b < CASE lang {cases} ELSE 10000 END
"""


def q_pivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an explicit value list — single shuffle,
    no driver-side distinct pre-pass (``operators.pivot``)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.expr(
        "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
    )
    return pivot_wide(
        li, ["l_returnflag"], "l_linestatus", ["O", "F"], cents,
        prefix="cents_",
    )


_PIVOT_SQL = """
SELECT l_returnflag,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
       FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS cents_O,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
       FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS cents_F
FROM lineitem GROUP BY l_returnflag
"""


_STATE_AGGS = [
    ("sum_qty", "SUM(CAST(l_quantity AS BIGINT))", "sum"),
    ("n_lines", "COUNT(1)", "sum"),
    ("min_price", "MIN(l_extendedprice)", "min"),
    ("max_price", "MAX(l_extendedprice)", "max"),
]


def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: aggregate history and a new
    increment separately, merge the partial states — bit-identical to
    re-aggregating everything (``operators.incremental``). The oracle
    IS the full re-aggregation, so the equality is what's checked."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.expr(frag).alias(name) for name, frag, _ in _STATE_AGGS]
    history = li.filter(F.col("l_orderkey") % 4 != 0).groupBy("l_suppkey").agg(*aggs)
    increment = li.filter(F.col("l_orderkey") % 4 == 0).groupBy("l_suppkey").agg(*aggs)
    return merge_aggregate_states(
        history,
        increment,
        ["l_suppkey"],
        {name: how for name, _, how in _STATE_AGGS},
    )


def _incremental_merge_sql() -> str:
    cols = ", ".join(
        (
            f"CAST({frag} AS BIGINT) AS {name}"
            if how == "sum"
            else f"{frag} AS {name}"
        )
        for name, frag, how in _STATE_AGGS
    )
    return f"SELECT l_suppkey, {cols} FROM lineitem GROUP BY l_suppkey"


# 2024-01-24 12:30:00 UTC — deliberately NOT hour-aligned, so the
# boundary hour has partial state on both sides and the merge is real.
_ROLLUP_CUTOFF_US = 1_706_099_400 * 1_000_000


def q_continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hours older than the
    cutoff come from a pre-aggregated rollup (the materialized
    'chunk' state), the hot tail is aggregated from raw events, and
    the two partial-state tables merge per (hour, event_type) —
    bit-identical to flat aggregation over everything, which is what
    the oracle checks. The cutoff is mid-hour on purpose: the
    boundary bucket exists in BOTH states, so the merge path is
    exercised, not just a union."""
    ev = _events(spark, sf_dir).withColumn("__us", F.expr(_TS_US))
    based = ev.select(
        "event_type",
        # floor (not truncate-toward-zero) division — see q_event_windows
        F.expr("(__us - pmod(__us, 3600000000)) DIV 3600000000 * 3600")
        .cast("long")
        .alias("window_start"),
        F.col("__us").alias("__ts_us"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("__cents"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__cents").alias("value_cents"),
        F.max("__cents").alias("max_single_cents"),
    ]
    cold = (
        based.filter(F.col("__ts_us") < _ROLLUP_CUTOFF_US)
        .groupBy("window_start", "event_type")
        .agg(*aggs)
    )
    hot = (
        based.filter(F.col("__ts_us") >= _ROLLUP_CUTOFF_US)
        .groupBy("window_start", "event_type")
        .agg(*aggs)
    )
    return merge_aggregate_states(
        cold,
        hot,
        ["window_start", "event_type"],
        {"n_events": "sum", "value_cents": "sum", "max_single_cents": "max"},
    )


_CONTINUOUS_ROLLUP_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       COUNT(1) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_single_cents
FROM events GROUP BY 1, 2
"""


_TOP_TERMS_N = 20


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters: exact vocabulary counts, top-N with a
    deterministic tiebreak — two shuffles (term aggregate with map-side
    combine, then a single-partition top-N of the already-tiny
    vocabulary table)."""
    docs = _docs_wide(spark, sf_dir)
    words = docs.select(
        F.explode(word_array("text")).alias("__w")
    ).select(F.lower(F.col("__w")).alias("term"))
    counts = words.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("term"))
        .limit(_TOP_TERMS_N)
    )


def _top_terms_sql() -> str:
    return f"""
WITH words AS ({_WORDS_SQL})
SELECT term, COUNT(*) AS n FROM words GROUP BY term
ORDER BY n DESC, term LIMIT {_TOP_TERMS_N}
"""


CMS_DEPTH, CMS_WIDTH = 4, 256


def q_cms_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimates for the exact heavy hitters
    (``operators.sketches.count_min_sketch``/``cms_estimate``): the
    sketch build is ONE map-side-combined aggregate with ≤ depth·width
    cells of state — heavy-hitter estimation without shuffling the
    corpus vocabulary. Output pins the one-sided error contract
    (``est_count >= n``) cell by cell."""
    docs = _docs_wide(spark, sf_dir)
    words = docs.select(
        F.explode(word_array("text")).alias("__w")
    ).select(F.lower(F.col("__w")).alias("term"))
    sketch = count_min_sketch(words, "term", depth=CMS_DEPTH, width=CMS_WIDTH)
    probes = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(_TOP_TERMS_N)
    )
    return cms_estimate(
        sketch, probes, "term", depth=CMS_DEPTH, width=CMS_WIDTH
    )


def _cms_sql() -> str:
    cells = " UNION ALL ".join(
        f"SELECT term, {i} AS row, "
        + _H60.format(x=f"'{i}:' || term")
        + f" % {CMS_WIDTH} AS bucket FROM words"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH words AS ({_WORDS_SQL}),
cells AS ({cells}),
sketch AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM cells GROUP BY row, bucket
),
probes AS (
  SELECT term, COUNT(*) AS n FROM words GROUP BY term
  ORDER BY n DESC, term LIMIT {_TOP_TERMS_N}
),
pc AS ({cells.replace("FROM words", "FROM probes")}),
est AS (
  SELECT pc.term, MIN(COALESCE(s.cnt, 0)) AS est_count
  FROM pc LEFT JOIN sketch s USING (row, bucket)
  GROUP BY pc.term
)
SELECT probes.term, CAST(probes.n AS BIGINT) AS n,
       CAST(est.est_count AS BIGINT) AS est_count
FROM probes JOIN est USING (term)
"""


_CHUNK, _OVERLAP = 400, 80


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunks (``operators.packing``) —
    pure projection, no shuffle."""
    docs = _docs_wide(spark, sf_dir)
    out = chunk_documents(
        docs, chunk_chars=_CHUNK, overlap=_OVERLAP
    )
    return out.withColumns(
        {
            "chunk_idx": F.col("chunk_idx").cast("long"),
            "chunk_start": F.col("chunk_start").cast("long"),
        }
    )


def _chunk_sql() -> str:
    step = _CHUNK - _OVERLAP
    return f"""
WITH s AS (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(text) - {_OVERLAP}, 1) + 1, {step}))
           AS chunk_start
  FROM documents
)
SELECT doc_id,
       CAST((chunk_start - 1) // {step} AS BIGINT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       substring(text, CAST(chunk_start AS INT), {_CHUNK}) AS chunk_text
FROM s
"""


_PACK_BUDGET, _PACK_BUCKETS = 4000, 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contiguous-fill training packs, formed per hash
    bucket so no global sort exists (``operators.packing``)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucketed = docs.withColumn("bucket", F.col("doc_id") % _PACK_BUCKETS)
    return pack_contiguous(
        bucketed,
        "n_chars",
        ["doc_id"],
        budget=_PACK_BUDGET,
        partition_cols=["bucket"],
    )


def q_pack_best_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-minimizing first-fit-decreasing packs per hash bucket.
    Rows-only correctness check by declared contract: the FFD fill
    order is inherently sequential (each placement depends on all
    previous ones), so no SQL oracle can recompute it; budget-respect,
    determinism, and the 11/9·OPT+1 bound are pytest-asserted in
    test_packing.py instead."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucketed = docs.withColumn("bucket", F.col("doc_id") % _PACK_BUCKETS)
    return pack_best_fit(
        bucketed,
        "n_chars",
        budget=_PACK_BUDGET,
        partition_cols=["bucket"],
        id_order=("doc_id",),
    )


def _pack_sql() -> str:
    cum = (
        "COALESCE(SUM(n_chars) OVER (PARTITION BY doc_id % {b} ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    ).format(b=_PACK_BUCKETS)
    return f"""
SELECT doc_id, n_chars, doc_id % {_PACK_BUCKETS} AS bucket,
       CAST(doc_id % {_PACK_BUCKETS} AS VARCHAR) || '-' ||
         CAST(CAST(FLOOR({cum} / {_PACK_BUDGET}) AS BIGINT) AS VARCHAR)
         AS pack_id
FROM documents
"""

"""Corpus-quality and sampling family: shard shuffles, epoch expansion, Gopher rules, mixture planning, repetition, PII, token budgets, temperature sampling."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    CURATE_STOPS,
    DataFrame,
    F,
    SparkSession,
    _H60,
    _NORM,
    _t,
    epoch_expand,
    gopher_rules,
    mixture_plan,
    redact_pii,
    repetition_features,
    shuffle_shards,
    temperature_sample,
    temperature_weights,
    token_budget_filter,
    token_counts,
)

SHUFFLE_N_SHARDS = 32
SHUFFLE_SALT = "ep0"


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded training-order shuffle
    (``operators.sampling.shuffle_shards``): every doc gets a stable
    ``(shard, shard_pos)`` from the salted portable hash."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(
        docs, "doc_id", n_shards=SHUFFLE_N_SHARDS, salt=SHUFFLE_SALT
    )


_SHUFFLE_SHARDS_SQL = f"""
SELECT doc_id,
       CAST(h % {SHUFFLE_N_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
            PARTITION BY h % {SHUFFLE_N_SHARDS} ORDER BY h, doc_id
       ) AS BIGINT) AS shard_pos
FROM (
  SELECT doc_id,
         {_H60.format(x=f"'{SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
"""


def q_epoch_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized repeat factors (``operators.sampling.epoch_expand``):
    the mixture plan's epochs_ppm turned into per-doc (epoch 0..n-1)
    rows — full repeats plus a deterministic hash sample for the final
    partial epoch."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tk = token_counts(docs).select("doc_id", "source", "ws_tokens")
    plan = mixture_plan(
        tk, "source", "ws_tokens", MIXTURE_WEIGHTS, MIXTURE_BUDGET
    ).select(F.col("source"), "epochs_ppm")
    joined = tk.join(F.broadcast(plan), "source")
    return epoch_expand(joined, "doc_id", "epochs_ppm").select(
        "doc_id", "source", "epoch"
    )


def _epoch_expand_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in MIXTURE_WEIGHTS.items()
    )
    return rf"""
WITH tk AS (
  SELECT doc_id, source,
         len(list_filter(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                         w -> length(w) > 0)) AS ws_tokens
  FROM documents WHERE text IS NOT NULL
),
per AS (
  SELECT source,
         CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
         CAST(CASE source {cases} ELSE 0 END AS BIGINT) AS weight_ppm
  FROM tk GROUP BY source
),
ep AS (
  SELECT source,
    CASE WHEN n_tokens > 0
         THEN (target_tokens // n_tokens) * 1000000
              + ((target_tokens % n_tokens) * 1000000) // n_tokens
         ELSE CAST(0 AS BIGINT) END AS epochs_ppm
  FROM (SELECT *,
          CAST({MIXTURE_BUDGET} AS BIGINT) * weight_ppm // 1000000 AS target_tokens
        FROM per)
),
n AS (
  SELECT doc_id, tk.source,
    epochs_ppm // 1000000
    + CASE WHEN ({_H60.format(x="CAST(doc_id AS VARCHAR)")} % 10000) * 100
                < epochs_ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
  FROM tk JOIN ep ON tk.source = ep.source
)
SELECT doc_id, source, unnest(range(n_copies)) AS epoch
FROM n WHERE n_copies > 0
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rule flags (``operators.text.
    gopher_rules``): integer-exact per-rule pass/fail + combined keep,
    with a low word-count floor so the synthetic docs exercise both
    outcomes of every rule."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return gopher_rules(
        docs, min_words=30, stops=("the", "a", "spark", "stream")
    ).select(
        "doc_id",
        "pass_word_count",
        "pass_mean_word_len",
        "pass_symbol_ratio",
        "pass_bullet_lines",
        "pass_ellipsis_lines",
        "pass_alpha_words",
        "pass_stopwords",
        "keep",
    )


GOPHER_MIN_WORDS = 30


def _gopher_metrics_sql(stops) -> str:
    """The Gopher metric columns over (text, wl, ll) — the ONE copy the
    three Gopher-rule oracles (gopher_rules / corpus_report /
    curate_corpus) share; thresholds live in _gopher_conds()."""
    return rf"""len(wl) AS n_words,
    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
    len(ll) AS n_lines,
    len(list_filter(ll, l -> starts_with(ltrim(l), '- ')
                          OR starts_with(ltrim(l), '* '))) AS n_bullet,
    len(list_filter(ll, l -> ends_with(rtrim(l), '...'))) AS n_ellipsis,
    len(list_filter(wl, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
    len(list_filter({list(stops)!r},
                    s -> list_contains(list_transform(wl, x -> lower(x)), s))) AS n_stops"""


def _gopher_conds(min_words: int = GOPHER_MIN_WORDS) -> dict[str, str]:
    """Per-rule SQL predicates over the _gopher_metrics_sql columns —
    integer cross-multiplications mirroring operators.text.gopher_rules."""
    return {
        "pass_word_count": f"n_words >= {min_words} AND n_words <= 100000",
        "pass_mean_word_len": "3 * n_words <= n_nonspace AND n_nonspace <= 10 * n_words",
        "pass_symbol_ratio": "10 * n_sym <= n_words",
        "pass_bullet_lines": "10 * n_bullet <= 9 * n_lines",
        "pass_ellipsis_lines": "10 * n_ellipsis <= 3 * n_lines",
        "pass_alpha_words": "5 * n_alpha >= 4 * n_words",
        "pass_stopwords": "n_stops >= 2",
    }


def _gopher_keep_sql(min_words: int = GOPHER_MIN_WORDS) -> str:
    return " AND ".join(_gopher_conds(min_words).values())


def _gopher_rules_sql() -> str:
    conds = _gopher_conds()
    flags = ",\n  ".join(
        f"CAST({cond} AS INT) AS {name}" for name, cond in conds.items()
    )
    return rf"""
WITH w AS (
  SELECT doc_id, text,
    list_filter(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                x -> length(x) > 0) AS wl,
    list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS ll
  FROM documents WHERE text IS NOT NULL
), m AS (
  SELECT doc_id,
    {_gopher_metrics_sql(CURATE_STOPS)}
  FROM w
)
SELECT doc_id,
  {flags},
  CAST({_gopher_keep_sql()} AS INT) AS keep
FROM m
"""


MIXTURE_WEIGHTS = {
    "src0": 250_000,
    "src1": 250_000,
    "src2": 150_000,
    "src3": 150_000,
    "src4": 100_000,
    "src5": 100_000,
}
MIXTURE_BUDGET = 5_000_000


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning (``operators.sampling.
    mixture_plan``): per-source availability vs ppm target weights,
    with the integer-exact epochs/repeat factors."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return mixture_plan(
        token_counts(docs),
        "source",
        "ws_tokens",
        MIXTURE_WEIGHTS,
        MIXTURE_BUDGET,
    )


def _mixture_plan_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in MIXTURE_WEIGHTS.items()
    )
    return rf"""
WITH tk AS (
  SELECT source,
         len(list_filter(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '),
                         w -> length(w) > 0)) AS ws_tokens
  FROM documents WHERE text IS NOT NULL
),
per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
         CAST(CASE source {cases} ELSE 0 END AS BIGINT) AS weight_ppm
  FROM tk GROUP BY source
),
tgt AS (
  SELECT *,
         CAST({MIXTURE_BUDGET} AS BIGINT) * weight_ppm // 1000000 AS target_tokens
  FROM per
),
ep AS (
  SELECT *,
         CASE WHEN n_tokens > 0
              THEN (target_tokens // n_tokens) * 1000000
                   + ((target_tokens % n_tokens) * 1000000) // n_tokens
              ELSE CAST(0 AS BIGINT) END AS epochs_ppm
  FROM tgt
)
SELECT source, n_docs, n_tokens, weight_ppm, target_tokens, epochs_ppm,
       CAST((epochs_ppm + 999999) // 1000000 AS INT) AS repeat_epochs
FROM ep
"""


REP_NS = (1, 2, 3)


def q_repetition_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition quality gate (duplicate / top n-gram
    fractions for n=1,2,3)."""
    docs = _t(spark, sf_dir, "documents")
    return repetition_features(docs, "doc_id", "text", ns=REP_NS)


def _repetition_sql() -> str:
    def gl(n: int) -> str:
        # non-distinct grams: same as _ngrams_sql minus list_distinct
        return (
            "list_transform("
            f"range(1, greatest(len(wl) - {n - 1}, 1) + 1), "
            f"i -> array_to_string(list_slice(wl, i::INT, i::INT + {n - 1}), ' '))"
        )

    union = " UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, unnest({gl(n)}) AS gram FROM w"
        for n in REP_NS
    )
    name = {1: "word", 2: "2gram", 3: "3gram"}
    aggs = []
    for n in REP_NS:
        aggs.append(
            f"round((SUM(CASE WHEN n={n} THEN cnt END) - COUNT(CASE WHEN n={n} THEN 1 END))"
            f"::DOUBLE / SUM(CASE WHEN n={n} THEN cnt END)::DOUBLE, 4) AS dup_{name[n]}_frac"
        )
        aggs.append(
            f"round(MAX(CASE WHEN n={n} THEN cnt END)::DOUBLE"
            f" / SUM(CASE WHEN n={n} THEN cnt END)::DOUBLE, 4) AS top_{name[n]}_frac"
        )
    agg_sql = ", ".join(aggs)
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), t -> length(t) > 0) AS wl
  FROM documents WHERE text IS NOT NULL
),
grams AS ({union}),
counts AS (SELECT doc_id, n, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(SUM(CASE WHEN n=1 THEN cnt END) AS BIGINT) AS total_words,
       {agg_sql}
FROM counts GROUP BY doc_id
"""


TOKEN_BUDGET = 4000


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked per-source token-budget curation: keep the
    longest docs per source until 4000 chars are admitted — one
    window pass, strict prefix of the quality ordering."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return token_budget_filter(
        docs, "source", "n_chars", "n_chars", TOKEN_BUDGET, "doc_id"
    )


_TOKEN_BUDGET_SQL = f"""
SELECT doc_id, source, n_chars, cum_tokens FROM (
  SELECT doc_id, source, n_chars,
         CAST(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM documents
) WHERE cum_tokens <= {TOKEN_BUDGET}
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-class match counts + redacted text, all inside
    codegen. The contact blob is derived deterministically from
    customer's key columns (the synthetic tables carry no raw PII
    strings), identically on both engines, so the redaction is
    non-trivially exercised and oracle-checkable."""
    cust = _t(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    blob = cust.select(
        "c_custkey",
        F.concat_ws(
            " ",
            F.col("c_name"),
            F.concat(F.lit("user"), key, F.lit("@mail.example.com")),
            F.concat(
                F.lit("10.0."),
                (F.col("c_custkey") % 199).cast("string"),
                F.lit("."),
                F.col("c_nationkey").cast("string"),
            ),
        ).alias("text"),
    )
    return redact_pii(blob, "text")


def _redact_pii_sql() -> str:
    from traits_data_spark.operators.text import PII_PATTERNS

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    cleaned = "text"
    for _, pat, token in PII_PATTERNS:
        cleaned = f"regexp_replace({cleaned}, '{pat}', '{token}', 'g')"
    return f"""
SELECT c_custkey, text, {counts}, {cleaned} AS clean_text
FROM (
  SELECT c_custkey,
         concat_ws(' ', c_name,
                   'user' || CAST(c_custkey AS VARCHAR) || '@mail.example.com',
                   '10.0.' || CAST(c_custkey % 199 AS VARCHAR) || '.'
                           || CAST(c_nationkey AS VARCHAR)) AS text
  FROM customer
)
"""


MIX_ALPHA = 0.5
MIX_TARGET_FRAC = 0.5


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (count^alpha) source-rebalancing weights + hash
    bucket thresholds — the LLaMA-style data-mixing rule."""
    docs = _t(spark, sf_dir, "documents")
    return temperature_weights(
        docs, "source", alpha=MIX_ALPHA, target_frac=MIX_TARGET_FRAC
    )


def _source_mixture_sql() -> str:
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
        CAST(round(pow(n_docs::DOUBLE, {MIX_ALPHA}) * 1000000, 0) AS BIGINT) AS ws
      FROM counts),
t AS (SELECT source, n_docs,
        round(ws::DOUBLE / (SUM(ws) OVER ())::DOUBLE, 6) AS weight,
        SUM(n_docs) OVER () AS n_total
      FROM w),
tn AS (SELECT source, n_docs, weight,
        CAST(round({MIX_TARGET_FRAC} * n_total * weight, 0) AS BIGINT) AS target_n
      FROM t)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, weight,
       LEAST(10000, CAST(round(10000.0 * target_n::DOUBLE / n_docs::DOUBLE, 0) AS INT))
         AS bucket_threshold
FROM tn
"""


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus resample toward the count^alpha mixture:
    broadcast per-source thresholds, hash-bucket filter — the corpus
    never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    return temperature_sample(
        docs, "source", "doc_id", alpha=MIX_ALPHA, target_frac=MIX_TARGET_FRAC
    ).select("doc_id", "source")


def _temperature_sample_sql() -> str:
    bucket = _H60.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH thr AS ({_source_mixture_sql()})
SELECT d.doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE {bucket} % 10000 < thr.bucket_threshold
"""

"""Deduplication family: exact/minhash/LSH/simhash, duplicate clustering, split hygiene, n-gram and Bloom decontamination."""

from __future__ import annotations

from traits_data_spark.catalog._shared import (
    DataFrame,
    F,
    MINHASH_PRIME,
    SparkSession,
    _H28,
    _H60,
    _NORM,
    _SHINGLES,
    _hash_coeffs,
    _t,
    bloom_decontaminate,
    containment_verify,
    dedup_clusters,
    exact_dedup,
    hash_split,
    jaccard_verify,
    minhash_lsh_candidates,
    minhash_signatures_df,
    ngram_decontaminate,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
)

NUM_HASHES = 16
BANDS = 4


def _minhash_sql_parts(num_hashes: int) -> tuple[str, str]:
    """(shingle CTEs, mh expression list) for the oracle."""
    coeffs = _hash_coeffs(num_hashes, 42)
    ctes = f"""
sh AS (
  SELECT doc_id AS id, {_SHINGLES} AS s_arr
  FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
),
hs AS (
  SELECT id, list_transform(s_arr, s -> {_H28}) AS hl
  FROM sh WHERE len(s_arr) > 0
)"""
    mh = ", ".join(
        f"list_min(list_transform(hl, h -> (h * {a} + {b}) % {MINHASH_PRIME})) AS mh_{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    return ctes, mh


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id", keep="min")


_EXACT_DEDUP_SQL = f"""
SELECT {_H60.format(x='nt')} AS content_hash,
       MIN(doc_id) AS keep_id, COUNT(1) AS dup_count
FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
GROUP BY 1
"""


def q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_signatures_df(docs, "text", "doc_id", num_hashes=4, seed=42)


def _minhash_sigs_sql() -> str:
    ctes, mh = _minhash_sql_parts(4)
    return f"WITH {ctes} SELECT id, {mh} FROM hs"


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket_size=None,
    )


def _lsh_candidates_sql() -> str:
    ctes, mh = _minhash_sql_parts(NUM_HASHES)
    rows_per_band = NUM_HASHES // BANDS
    band_selects = []
    for b in range(BANDS):
        cols = ", ".join(
            f"mh_{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT id, {b} AS band_idx, md5(concat_ws(',', {cols})) AS band_key FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
WITH {ctes},
sig AS (SELECT id, {mh} FROM hs),
bands AS ({bands_sql})
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b USING (band_idx, band_key)
WHERE a.id < b.id
"""


def q_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket_size=None,
    )
    return jaccard_verify(cand, docs, "text", "doc_id", threshold=0.5)


def _jaccard_sql() -> str:
    cand = _lsh_candidates_sql()
    return f"""
WITH cand AS ({cand}),
shj AS (
  SELECT doc_id AS jid, {_SHINGLES} AS js
  FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
    round(len(list_intersect(a.js, b.js))::DOUBLE
          / len(list_distinct(list_cat(a.js, b.js)))::DOUBLE, 6) AS jaccard
  FROM cand JOIN shj a ON cand.id_a = a.jid JOIN shj b ON cand.id_b = b.jid
) WHERE jaccard >= 0.5
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-superset verify (``containment_verify``): shingle
    containment both ways over the LSH candidate pairs — catches the
    partial-crawl / quoted-subset pairs whose Jaccard is diluted by
    the longer side."""
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket_size=None,
    )
    return containment_verify(cand, docs, "text", "doc_id", threshold=0.6)


def _containment_sql() -> str:
    cand = _lsh_candidates_sql()
    return f"""
WITH cand AS ({cand}),
shj AS (
  SELECT doc_id AS jid, {_SHINGLES} AS js
  FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
)
SELECT id_a, id_b, jaccard, containment_a, containment_b FROM (
  SELECT id_a, id_b,
    round(len(list_intersect(a.js, b.js))::DOUBLE
          / nullif(len(list_distinct(list_cat(a.js, b.js))), 0)::DOUBLE, 6) AS jaccard,
    round(len(list_intersect(a.js, b.js))::DOUBLE
          / nullif(len(a.js), 0)::DOUBLE, 6) AS containment_a,
    round(len(list_intersect(a.js, b.js))::DOUBLE
          / nullif(len(b.js), 0)::DOUBLE, 6) AS containment_b
  FROM cand JOIN shj a ON cand.id_a = a.jid JOIN shj b ON cand.id_b = b.jid
) WHERE greatest(containment_a, containment_b) >= 0.6
"""


_WORD_NGRAMS = (
    "list_distinct(list_transform("
    "range(1, greatest(len(wl) - 2, 1) + 1), "
    "i -> array_to_string(list_slice(wl, i::INT, i::INT + 2), ' ')))"
)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard verify over the LSH candidate pairs — the
    token-level dedup variant."""
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket_size=None,
    )
    return ngram_jaccard_pairs(cand, docs, "text", "doc_id", n=3, threshold=0.2)


def _ngram_jaccard_sql() -> str:
    cand = _lsh_candidates_sql()
    return f"""
WITH cand AS ({cand}),
w AS (
  SELECT doc_id AS jid,
         list_filter(string_split(nt, ' '), t -> length(t) > 0) AS wl
  FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
),
shj AS (SELECT jid, {_WORD_NGRAMS} AS js FROM w)
SELECT id_a, id_b, ngram_jaccard FROM (
  SELECT id_a, id_b,
    round(len(list_intersect(a.js, b.js))::DOUBLE
          / len(list_distinct(list_cat(a.js, b.js)))::DOUBLE, 6) AS ngram_jaccard
  FROM cand JOIN shj a ON cand.id_a = a.jid JOIN shj b ON cand.id_b = b.jid
) WHERE ngram_jaccard >= 0.2
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash64(docs, "text", "doc_id")


SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 6


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dups(
        docs, "text", "doc_id",
        bands=SIMHASH_BANDS, max_hamming=SIMHASH_MAX_HAMMING,
    )


def _simhash_near_dups_sql() -> str:
    bits = 60 // SIMHASH_BANDS
    mask = (1 << bits) - 1
    bands_sql = " UNION ALL ".join(
        f"SELECT id, simhash, {b} AS band_idx, "
        f"(simhash >> {b * bits}) & {mask} AS band_key FROM sig"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH sig AS ({_simhash_sql()}),
bands AS ({bands_sql})
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b USING (band_idx, band_key)
WHERE a.id < b.id AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def _simhash_sql() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(60)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split(nt, ' '), t -> length(t) > 0)) AS tok
  FROM (SELECT doc_id, {_NORM} AS nt FROM documents)
),
h AS (SELECT id, {_H60.format(x='tok')} AS hh FROM toks),
votes AS (SELECT id, {votes} FROM h GROUP BY id)
SELECT id, {bits} AS simhash FROM votes
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: simhash banding pairs →
    connected components (min-label propagation) → per-doc cluster id
    + canonical flag. The step pairwise candidates can't express:
    A~B, B~C collapses {A,B,C} even when A~C was never a candidate."""
    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dups(
        docs, "text", "doc_id",
        bands=SIMHASH_BANDS, max_hamming=SIMHASH_MAX_HAMMING,
    )
    return dedup_clusters(docs, pairs, "doc_id")


def _dup_clusters_sql() -> str:
    # min reachable id over the symmetric closure of the near-dup
    # pairs == the component label connected_components converges to.
    return f"""
WITH RECURSIVE
pairs AS ({_simhash_near_dups_sql()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
cc(id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, cc.label FROM cc JOIN edges e ON cc.id = e.dst
),
comp AS (SELECT id, MIN(label) AS component FROM cc GROUP BY id)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: hash the duplicate-CLUSTER
    component, not the doc id, so near-duplicate documents can never
    straddle splits (splitting by doc id leaks eval content whenever a
    near-dup of a training doc lands in test — the cluster id is the
    right unit of assignment)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_near_dups(
        docs, "text", "doc_id",
        bands=SIMHASH_BANDS, max_hamming=SIMHASH_MAX_HAMMING,
    )
    clustered = dedup_clusters(docs, pairs, "doc_id")
    return hash_split(clustered, "component").select(
        "doc_id", "component", "split"
    )


def _cluster_split_sql() -> str:
    return f"""
WITH clustered AS ({_dup_clusters_sql()})
SELECT doc_id, component,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, component,
         {_H60.format(x="CAST(component AS VARCHAR)")} % 10000 AS b
  FROM clustered
)
"""


def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage AUDIT: the (split_a, split_b) matrix of verified
    near-dup pairs under a naive per-document hash split. Off-diagonal
    rows are eval-set contamination — near-dups of training docs
    landing in val/test. ``cluster_split`` is the fix (assign whole
    dup-cluster components); this query is the measurement a pipeline
    runs to prove it needed it (and, re-run on the cluster split, to
    prove the leak is gone). Scale shape: the verified-pair table is
    tiny relative to the corpus, so both split attachments broadcast
    the pair side — the corpus itself never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket_size=None,
    )
    pairs = jaccard_verify(cand, docs, "text", "doc_id", threshold=0.5)
    sp = hash_split(docs.select("doc_id"), "doc_id")
    a = sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    b = sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        F.broadcast(pairs)
        .join(a, "id_a")
        .join(b, "id_b")
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def _split_contamination_sql() -> str:
    return f"""
WITH pairs AS ({_jaccard_sql()}),
sp AS (
  SELECT doc_id,
         CASE WHEN b < 9000 THEN 'train'
              WHEN b < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, {_H60.format(x="CAST(doc_id AS VARCHAR)")} % 10000 AS b
    FROM documents
  )
)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN sp a ON pairs.id_a = a.doc_id
JOIN sp b ON pairs.id_b = b.doc_id
GROUP BY 1, 2
"""


DECON_N = 5
DECON_BENCH_SOURCE = "src0"


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 distinct
    word-5-gram with the held-out benchmark slice (source='src0')."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == DECON_BENCH_SOURCE)
    corpus = docs.filter(F.col("source") != DECON_BENCH_SOURCE)
    return ngram_decontaminate(
        corpus, bench, "text", "doc_id", "doc_id", n=DECON_N
    )


def _ngrams_sql(n: int) -> str:
    """DuckDB word-n-gram list over ``wl`` (mirrors word_ngrams:
    greatest(len-n+1, 1) grams, inclusive list_slice bounds)."""
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len(wl) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice(wl, i::INT, i::INT + {n - 1}), ' ')))"
    )


def _decontaminate_sql() -> str:
    return f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split({_NORM}, ' '), t -> length(t) > 0) AS wl
  FROM documents
),
cg AS (
  SELECT doc_id AS id, unnest({_ngrams_sql(DECON_N)}) AS gram
  FROM w WHERE source <> '{DECON_BENCH_SOURCE}'
),
bg AS (
  SELECT DISTINCT doc_id AS bench_id, unnest({_ngrams_sql(DECON_N)}) AS gram
  FROM w WHERE source = '{DECON_BENCH_SOURCE}'
)
SELECT id, COUNT(DISTINCT cg.gram) AS overlap_ngrams,
       COUNT(DISTINCT bg.bench_id) AS matched_bench_docs
FROM cg JOIN bg USING (gram)
GROUP BY id
HAVING COUNT(DISTINCT cg.gram) >= 1
"""


BLOOM_DECON_N = 4
BLOOM_DECON_BENCH = "src1"
BLOOM_DECON_MIN = 2


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (``bloom_decontaminate``):
    corpus docs sharing >=2 distinct word-4-grams with the src1 slice.
    The Bloom bitset only prunes — the exact verify join makes the
    output bit-identical to the hash-set path, which is what the
    oracle checks."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == BLOOM_DECON_BENCH)
    corpus = docs.filter(F.col("source") != BLOOM_DECON_BENCH)
    return bloom_decontaminate(
        corpus,
        bench,
        "text",
        "doc_id",
        "doc_id",
        n=BLOOM_DECON_N,
        min_overlap=BLOOM_DECON_MIN,
    )


def _bloom_decontaminate_sql() -> str:
    # the Bloom filter is a prefilter with an exact verify behind it,
    # so the oracle is the plain exact contamination query
    return f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split({_NORM}, ' '), t -> length(t) > 0) AS wl
  FROM documents
),
cg AS (
  SELECT doc_id AS id, unnest({_ngrams_sql(BLOOM_DECON_N)}) AS gram
  FROM w WHERE source <> '{BLOOM_DECON_BENCH}'
),
bg AS (
  SELECT DISTINCT doc_id AS bench_id, unnest({_ngrams_sql(BLOOM_DECON_N)}) AS gram
  FROM w WHERE source = '{BLOOM_DECON_BENCH}'
)
SELECT id, COUNT(DISTINCT cg.gram) AS overlap_ngrams,
       COUNT(DISTINCT bg.bench_id) AS matched_bench_docs
FROM cg JOIN bg USING (gram)
GROUP BY id
HAVING COUNT(DISTINCT cg.gram) >= {BLOOM_DECON_MIN}
"""

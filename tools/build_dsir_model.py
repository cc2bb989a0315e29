"""Build the committed DSIR importance-weight artifact:

- ``traits_data_spark/data/dsir_model.parquet`` — one row per hashed
  n-gram bucket (DENSE: every bucket 0..N_BUCKETS-1 present):
  ``bucket BIGINT, delta_micro BIGINT`` where ``delta_micro`` is
  ``ln p_target(bucket) - ln p_raw(bucket)`` in integer micro-nats.

Method: DSIR (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023) estimates importance weights for
every raw document under two bag-of-hashed-n-grams models — one fit on
a trusted TARGET corpus, one on the RAW pool — and selects documents
with the highest target/raw likelihood ratio. Features are word
unigrams + bigrams hashed into ``N_BUCKETS`` buckets (the paper uses
10k); hash collisions are part of the method (they regularize the
ratio estimate exactly like a hashing-trick classifier).

Training data: the HELD-OUT slice ``doc_id % 10 == 0`` of the sf0.1
documents corpus (same holdout contract as ``build_word_lm.py``).
Target = English documents in the slice (``lang = 'en'`` — the
"select docs that look like English reference text" analog of the
paper's Wikipedia target); raw = the full slice. Laplace smoothing on
both sides: ``p(b) = (c_b + 1) / (C + N_BUCKETS)``.

The bucket hash MUST equal the in-plan hash on both engines:
``int(md5(gram)[:7 hex], 16) % N_BUCKETS`` == Spark
``conv(substring(md5(g),1,7),16,10) % N_BUCKETS`` == DuckDB
``CAST(('0x' || substr(md5(g),1,7)) AS BIGINT) % N_BUCKETS``.

All ``ln`` calls happen HERE, once, in Python — the distributed plan
and the DuckDB oracle both consume precomputed integer micro-nats and
do only integer sums (the word_lm rule: transcendentals never run
in-plan, they are not correctly-rounded across JVM/glibc).
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pandas as pd

SRC = "/root/testdata/sf0.1/documents.parquet"
DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "traits_data_spark", "data",
)
OUT = os.path.join(DATA_DIR, "dsir_model.parquet")
HOLDOUT_MOD = 10  # doc_id % 10 == 0 is the training slice
N_BUCKETS = 10_000
MICRO = 1_000_000
TARGET_LANG = "en"


def train_rows() -> list[tuple[str, list[str]]]:
    q = f"""
    WITH d AS (
      SELECT lang,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
      FROM read_parquet('{SRC}')
      WHERE text IS NOT NULL AND doc_id % {HOLDOUT_MOD} = 0
    )
    SELECT lang, list_filter(string_split(nt, ' '), x -> length(x) > 0)
    FROM d
    """
    return [(r[0], r[1]) for r in duckdb.sql(q).fetchall()]


def grams(ws: list[str]) -> list[str]:
    return ws + [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]


def bucket(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:7], 16) % N_BUCKETS


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    docs = train_rows()
    c_t = [0] * N_BUCKETS
    c_r = [0] * N_BUCKETS
    n_target = 0
    for lang, ws in docs:
        is_target = lang == TARGET_LANG
        n_target += int(is_target)
        for g in grams(ws):
            b = bucket(g)
            c_r[b] += 1
            if is_target:
                c_t[b] += 1
    C_t = sum(c_t) + N_BUCKETS
    C_r = sum(c_r) + N_BUCKETS
    delta = [
        int(round(
            (math.log((c_t[b] + 1) / C_t) - math.log((c_r[b] + 1) / C_r))
            * MICRO
        ))
        for b in range(N_BUCKETS)
    ]
    model = pd.DataFrame(
        {"bucket": list(range(N_BUCKETS)), "delta_micro": delta}
    )
    con = duckdb.connect()
    con.sql(f"COPY model TO '{OUT}' (FORMAT PARQUET)")
    print(
        {
            "buckets": N_BUCKETS,
            "train_docs": len(docs),
            "target_docs": n_target,
            "target_feats": C_t - N_BUCKETS,
            "raw_feats": C_r - N_BUCKETS,
            "nonzero_delta": sum(1 for d in delta if d != 0),
        }
    )


if __name__ == "__main__":
    main()

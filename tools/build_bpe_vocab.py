"""Build the committed production-scale subword vocabulary artifact
``traits_data_spark/data/bpe_vocab_large.parquet`` (one VARCHAR column
``piece``, >=10k rows).

A real pipeline ships the target model tokenizer's merge table; this
artifact stands in for it with the same *shape* and *size*: every
substring (length 2-8) of the corpus' distinct words, weighted by word
occurrence (238 pieces at sf0.1 — the synthetic corpus has only 31
distinct words), padded to N_PIECES with deterministic a-z 2-/3-grams.
That padding is the production situation, not a hack: a 50k-piece model
vocab probes mostly-missing pieces against any one domain corpus, so
the lookup structure must be cheap on misses. Deterministic in the
input data (ties broken lexicographically). Parquet, not CSV, so both
engines read the pieces byte-identically with no quoting/escape
divergence (pieces may contain quotes and commas: normalization only
lowercases and collapses whitespace).

Rerun only to regenerate the artifact after changing the rule below;
the committed file is the source of truth the catalog query and its
DuckDB oracle both read.
"""

import os

import duckdb

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "traits_data_spark", "data", "bpe_vocab_large.parquet",
)
N_PIECES = 12_000
MIN_LEN, MAX_LEN = 2, 8


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
COPY (
  WITH d AS (
    SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
    FROM read_parquet('{SRC}') WHERE text IS NOT NULL
  ),
  wx AS (
    SELECT unnest(list_filter(string_split(nt, ' '),
                              x -> length(x) > 0)) AS w
    FROM d
  ),
  wc AS (SELECT w, count(*) AS c FROM wx GROUP BY w),
  subs AS (
    SELECT substr(wc.w, s.pos, l.len) AS piece, sum(wc.c) AS weight
    FROM wc
    CROSS JOIN (SELECT unnest(range({MIN_LEN}, {MAX_LEN + 1})) AS len) l
    CROSS JOIN LATERAL (
      SELECT unnest(range(1, length(wc.w) - l.len + 2)) AS pos
    ) s
    GROUP BY piece
  )
  SELECT piece FROM subs
  ORDER BY weight DESC, piece
  LIMIT {N_PIECES}
) TO '{OUT}' (FORMAT PARQUET)
"""
    )
    # pad to N_PIECES with deterministic a-z n-grams (2-grams, then
    # 3-grams in lexicographic order), skipping corpus pieces
    have = {r[0] for r in con.sql(
        f"SELECT piece FROM read_parquet('{OUT}')"
    ).fetchall()}
    alpha = "abcdefghijklmnopqrstuvwxyz"
    fill = []
    for n in (2, 3):
        if len(have) + len(fill) >= N_PIECES:
            break
        for combo in __import__("itertools").product(alpha, repeat=n):
            p = "".join(combo)
            if p not in have:
                fill.append(p)
                if len(have) + len(fill) >= N_PIECES:
                    break
    import pandas as pd  # noqa: F401  (registered for duckdb scan)

    fill_df = pd.DataFrame({"piece": fill})
    con.sql(
        f"""
COPY (
  SELECT piece FROM read_parquet('{OUT}')
  UNION ALL
  SELECT piece FROM fill_df
) TO '{OUT}.tmp.parquet' (FORMAT PARQUET)
"""
    )
    os.replace(f"{OUT}.tmp.parquet", OUT)
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}')").fetchone()[0]
    print({"out": OUT, "pieces": n})


if __name__ == "__main__":
    main()

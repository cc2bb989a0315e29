"""Build the committed word-bigram language-model artifact for the
CCNet-style perplexity quality filter:

- ``traits_data_spark/data/word_lm.parquet`` — one row per (u, w)
  SEEN bigram: ``u VARCHAR, w VARCHAR, lp_micro BIGINT`` (natural-log
  probability of ``w`` given context ``u`` in integer micro-nats).
- ``traits_data_spark/data/word_lm_context.parquet`` — one row per
  context (every vocab word + '<s>' + '<unk>'):
  ``u VARCHAR, unseen_lp_micro BIGINT`` (log-prob any single unseen
  continuation under Laplace smoothing).

Model: Laplace-smoothed word bigram LM trained on the HELD-OUT slice
``doc_id % 10 == 0`` of the sf0.1 documents corpus —
``p(w|u) = (c(u,w) + 1) / (c(u) + V)`` with ``V`` = |vocab| + 1
('<unk>'). Scoring maps any word outside the training vocab to
'<unk>' (for both context and target), so
``coalesce(bigram_lp, context_unseen_lp)`` is TOTAL: after unk-mapping
every context is either in-vocab, '<s>', or '<unk>', and all three
have context rows.

All ``ln`` calls happen HERE, once, in Python — the engine plan and
the DuckDB oracle both consume the precomputed integer micro-nats and
do only integer sums plus one IEEE-exact division, so the correctness
gate never compares transcendental libm results across engines (ln is
not correctly-rounded; exp/ln may differ in the last ulp between JVM
and glibc). Same committed-model-artifact contract as
``build_bpe_vocab.py`` — CCNet ships a pretrained KenLM the same way.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

SRC = "/root/testdata/sf0.1/documents.parquet"
DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "traits_data_spark", "data",
)
BIGRAM_OUT = os.path.join(DATA_DIR, "word_lm.parquet")
CONTEXT_OUT = os.path.join(DATA_DIR, "word_lm_context.parquet")
HOLDOUT_MOD = 10  # doc_id % 10 == 0 is the training slice
MICRO = 1_000_000

BOS = "<s>"
UNK = "<unk>"


def train_rows() -> list[list[str]]:
    q = f"""
    WITH d AS (
      SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
      FROM read_parquet('{SRC}')
      WHERE text IS NOT NULL AND doc_id % {HOLDOUT_MOD} = 0
    )
    SELECT list_filter(string_split(nt, ' '), x -> length(x) > 0) FROM d
    """
    return [r[0] for r in duckdb.sql(q).fetchall()]


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    docs = train_rows()
    vocab = sorted({w for ws in docs for w in ws})
    V = len(vocab) + 1  # + '<unk>'
    c_u: dict[str, int] = {}
    c_uw: dict[tuple[str, str], int] = {}
    for ws in docs:
        prev = BOS
        for w in ws:
            c_u[prev] = c_u.get(prev, 0) + 1
            c_uw[(prev, w)] = c_uw.get((prev, w), 0) + 1
            prev = w

    def lp_micro(num: int, den: int) -> int:
        return int(round(math.log(num / den) * MICRO))

    bigram = pd.DataFrame(
        {
            "u": [u for (u, _) in sorted(c_uw)],
            "w": [w for (_, w) in sorted(c_uw)],
            "lp_micro": [
                lp_micro(c_uw[k] + 1, c_u[k[0]] + V) for k in sorted(c_uw)
            ],
        }
    )
    contexts = sorted(set(vocab) | {BOS, UNK})
    context = pd.DataFrame(
        {
            "u": contexts,
            "unseen_lp_micro": [
                lp_micro(1, c_u.get(u, 0) + V) for u in contexts
            ],
        }
    )
    con = duckdb.connect()
    con.sql(f"COPY bigram TO '{BIGRAM_OUT}' (FORMAT PARQUET)")
    con.sql(f"COPY context TO '{CONTEXT_OUT}' (FORMAT PARQUET)")
    print(
        {
            "bigrams": len(bigram),
            "contexts": len(context),
            "vocab": len(vocab),
            "V": V,
            "train_docs": len(docs),
        }
    )


if __name__ == "__main__":
    main()

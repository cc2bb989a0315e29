"""Build the committed ranked-merge BPE artifacts:

- ``traits_data_spark/data/bpe_merges.parquet`` (rank BIGINT,
  left VARCHAR, right VARCHAR): a true byte-pair-encoding merge table
  learned from the corpus (most-frequent adjacent pair first,
  occurrence-weighted, lexicographic tie-break), padded to production
  size with deterministic a-z pair merges — same stand-in-for-a-model-
  artifact contract as ``build_bpe_vocab.py``.
- ``traits_data_spark/data/bpe_merge_counts.parquet`` (word VARCHAR,
  n_tokens BIGINT): expected merge-rank token counts for every
  distinct corpus word, computed by the NAIVE reference tokenizer
  below (one merge occurrence at a time, full re-scan per step) —
  deliberately a different implementation from the engine's
  ``operators.text.bpe_merge_tokens_py``, so the catalog oracle is an
  independent check, parity-tested in tests/test_text.py.

Rerun only to regenerate after changing the rules here; the committed
files are the source of truth for the catalog query and its oracle.
"""

from __future__ import annotations

import itertools
import os

import duckdb
import pandas as pd

SRC = "/root/testdata/sf0.1/documents.parquet"
DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "traits_data_spark", "data",
)
MERGES_OUT = os.path.join(DATA_DIR, "bpe_merges.parquet")
COUNTS_OUT = os.path.join(DATA_DIR, "bpe_merge_counts.parquet")
N_MERGES = 12_000
# Cap the learned merges well short of convergence: BPE trained to
# convergence on its own 31-word corpus memorizes every word (every
# count = 1 — a degenerate eval where rank order can never matter).
# 24 learned merges leave most words multi-piece, and the padded a-z
# merges then genuinely participate (e.g. an unlearned (t,h) pad merge
# fires inside corpus words), exercising learned/pad rank interplay.
N_LEARNED_MAX = 24
MAX_WORD_LEN = 64  # words longer than this tokenize as chars (no merge)


def word_counts() -> dict[str, int]:
    q = f"""
    WITH d AS (
      SELECT lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
      FROM read_parquet('{SRC}') WHERE text IS NOT NULL
    ),
    w AS (SELECT unnest(list_filter(string_split(nt, ' '),
                                    x -> length(x) > 0)) AS w FROM d)
    SELECT w, count(*) AS c FROM w GROUP BY w ORDER BY w
    """
    return dict(duckdb.sql(q).fetchall())


def learn_merges(wc: dict[str, int]) -> list[tuple[str, str]]:
    """Textbook BPE training: repeatedly merge the occurrence-weighted
    most frequent adjacent symbol pair (lexicographic tie-break) until
    no pair occurs in more than one weighted position."""
    seqs = {w: list(w) for w in wc}
    merges: list[tuple[str, str]] = []
    while True:
        pairs: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        # highest weighted count wins; lexicographically smallest pair
        # breaks ties — fully deterministic in the input data
        top = max(pairs.values())
        if top < 2:
            break
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b))
        merged = a + b
        for w, seq in seqs.items():
            i = 0
            out = []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
        if len(merges) >= N_LEARNED_MAX:
            break
    return merges


def pad_merges(merges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Pad to N_MERGES with deterministic a-z merges: single-char
    pairs first, then (2-char, 1-char) pairs — each padded merge's
    operands exist before it is reachable (left token created by an
    earlier pad merge), so rank order stays well-founded."""
    have = set(merges)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    out = list(merges)
    for a, b in itertools.product(alpha, alpha):
        if len(out) >= N_MERGES:
            return out
        if (a, b) not in have:
            out.append((a, b))
            have.add((a, b))
    for a, b, c in itertools.product(alpha, alpha, alpha):
        if len(out) >= N_MERGES:
            return out
        if (a + b, c) not in have:
            out.append((a + b, c))
            have.add((a + b, c))
    return out


def naive_merge_tokenize(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Reference tokenizer: repeatedly merge the LEFTMOST occurrence of
    the lowest-rank adjacent pair present, one occurrence per step,
    re-scanning from scratch every time. O(L^3)-ish and proud of it —
    this is the oracle, not the engine."""
    if len(word) > MAX_WORD_LEN:
        return len(word)
    seq = list(word)
    while len(seq) >= 2:
        best_rank = None
        best_pos = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pos = i
        if best_pos is None:
            break
        seq[best_pos : best_pos + 2] = [seq[best_pos] + seq[best_pos + 1]]
    return len(seq)


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    wc = word_counts()
    merges = pad_merges(learn_merges(wc))
    ranks = {p: i for i, p in enumerate(merges)}
    mdf = pd.DataFrame(
        {
            "rank": range(len(merges)),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )
    cdf = pd.DataFrame(
        {
            "word": list(wc),
            "n_tokens": [naive_merge_tokenize(w, ranks) for w in wc],
        }
    )
    con = duckdb.connect()
    con.sql(f"COPY mdf TO '{MERGES_OUT}' (FORMAT PARQUET)")
    con.sql(f"COPY cdf TO '{COUNTS_OUT}' (FORMAT PARQUET)")
    n_learned = len(learn_merges(wc))
    print(
        {
            "merges": len(mdf),
            "learned": n_learned,
            "words": len(cdf),
            "counts": dict(zip(cdf.word, cdf.n_tokens)),
        }
    )


if __name__ == "__main__":
    main()

"""Text analysis operators for training-data pipelines: quality
scoring, language identification, token counting, fingerprinting.

All pure column expressions — the whole module is a projection, so it
runs inside whole-stage codegen at scan speed and never shuffles.
Heuristics are deliberately simple, deterministic, and SQL-expressible
so correctness oracles can recompute them exactly.
"""

from __future__ import annotations

import math
import os
from typing import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from traits_data_spark.functions.scalars import portable_hash64
from traits_data_spark.operators.dedup import normalized_text
from traits_data_spark.functions.barrier import barrier

# Common function words per language, used as count-based markers.
# Spaces around each marker make them word-anchored.
LANG_MARKERS: Mapping[str, Sequence[str]] = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "fr": (" le ", " la ", " les ", " et ", " est "),
    "de": (" der ", " die ", " und ", " ist ", " das "),
    "es": (" el ", " los ", " las ", " es ", " una "),
}

_STOPWORDS_EN = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring —
    ``(len(t) - len(replace(t, s, ''))) / len(s)``, portable to any SQL
    engine."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def word_array(text_col: Column | str) -> Column:
    c = normalized_text(text_col, lowercase=False)
    return F.filter(F.split(c, " "), lambda w: F.length(w) > 0)


# Character classes shared with SQL oracles (RE2/Java-compatible).
PUNCT_CLASS = "[!-/:-@\\[-`{-~]"
DIGIT_CLASS = "[0-9]"
NONSPACE = "\\S+"


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def quality_features(
    df: DataFrame, text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Append length/word/punctuation/stopword quality signals.

    Every signal is a regexp-count or list-filter expression so a SQL
    oracle (DuckDB/Trino) can recompute it verbatim.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = _count_matches(t, NONSPACE)
    n_nonspace_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS_EN])
    norm_words = F.split(normalized_text(t), " ")
    n_stop = F.size(F.filter(norm_words, lambda w: F.array_contains(stop_arr, w)))
    n_punct = _count_matches(t, PUNCT_CLASS)
    n_digit = _count_matches(t, DIGIT_CLASS)
    safe_words = F.when(n_words > 0, n_words.cast("double"))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double"))
    return df.withColumns(
        {
            "n_chars_q": n_chars.cast("long"),
            "n_words": n_words.cast("long"),
            "avg_word_len": F.round(n_nonspace_chars / safe_words, round_to),
            "punct_ratio": F.round(n_punct / safe_chars, round_to),
            "digit_ratio": F.round(n_digit / safe_chars, round_to),
            "stopword_ratio": F.round(n_stop / safe_words, round_to),
        }
    )


# Gopher's stop-word requirement set (Rae et al. 2021, Table A1 rules)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    stops: Sequence[str] = GOPHER_STOPS,
    emit_tokens: str | None = None,
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al.
    2021) as per-rule boolean flags plus the combined ``keep``:
    word-count bounds, mean word length in [3, 10], symbol-to-word
    ratio (# / ellipsis) <= 0.1, <= 90% bullet-started and <= 30%
    ellipsis-ended lines, >= 80% of words containing an alphabetic
    character, and >= 2 of the 8 Gopher stop words present.

    Every threshold is evaluated as an INTEGER cross-multiplication
    (``3*n_words <= n_nonspace`` instead of a float mean), so the
    flags are exact and bit-identical on any SQL engine — no float
    ratio ever materializes. Flags come back as 0/1 ints (hash-stable
    across engines), one per rule, so downstream can both filter on
    ``keep`` and report per-rule rejection rates in the same pass.

    Scale shape: a pure codegen projection — no shuffle, no UDF, no
    join; the stop-word membership is 8 ``array_contains`` probes of
    the already-split word array. Pass ``emit_tokens`` to ALSO emit
    the whitespace token count under that name — callers that need
    ``ws_tokens`` downstream (curation, datasheets) then skip a second
    normalize+split pass over the corpus.
    """
    t = F.col(text_col)
    words = word_array(t)
    lower_words = F.transform(words, lambda w: F.lower(w))
    n_words = F.size(words)
    n_nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    n_sym = _count_matches(t, "#") + _count_matches(t, r"\.\.\.")
    lines = F.filter(
        F.split(t, "\n"), lambda line: F.length(F.trim(line)) > 0
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda line: F.ltrim(line).startswith(F.lit("- "))
            | F.ltrim(line).startswith(F.lit("* ")),
        )
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda line: F.rtrim(line).endswith(F.lit("...")))
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stops = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stops]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    if emit_tokens in (
        "keep", "pass_word_count", "pass_mean_word_len",
        "pass_symbol_ratio", "pass_bullet_lines", "pass_ellipsis_lines",
        "pass_alpha_words", "pass_stopwords",
    ):
        raise ValueError(
            f"emit_tokens={emit_tokens!r} collides with a rule flag"
        )
    extra = {emit_tokens: n_words.cast("long")} if emit_tokens else {}
    flags = {
        "pass_word_count": (n_words >= min_words) & (n_words <= max_words),
        "pass_mean_word_len": (F.lit(3) * n_words <= n_nonspace)
        & (n_nonspace <= F.lit(10) * n_words),
        "pass_symbol_ratio": F.lit(10) * n_sym <= n_words,
        "pass_bullet_lines": F.lit(10) * n_bullet <= F.lit(9) * n_lines,
        "pass_ellipsis_lines": F.lit(10) * n_ellipsis <= F.lit(3) * n_lines,
        "pass_alpha_words": F.lit(5) * n_alpha >= F.lit(4) * n_words,
        "pass_stopwords": n_stops >= 2,
    }
    out = df.withColumns(
        {**extra, **{name: cond.cast("int") for name, cond in flags.items()}}
    )
    keep = None
    for name in flags:
        c = F.col(name) == 1
        keep = c if keep is None else keep & c
    return out.withColumn("keep", keep.cast("int"))


def language_scores(
    text_col: Column | str, markers: Mapping[str, Sequence[str]] = LANG_MARKERS
) -> dict[str, Column]:
    """Marker-count score per language over the lowercased, padded text."""
    t = F.concat(F.lit(" "), normalized_text(text_col), F.lit(" "))
    return {
        lang: sum_cols([occurrences(t, m) for m in ms])
        for lang, ms in markers.items()
    }


def sum_cols(cols: Sequence[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def identify_language(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
) -> DataFrame:
    """Argmax over language marker scores; 'und' when all scores are 0.
    Ties break alphabetically (deterministic, oracle-friendly).

    The argmax is ONE ``greatest()`` over (score, priority, lang)
    structs — struct comparison is lexicographic, and priority is the
    reversed alphabetical rank, so equal scores resolve to the
    alphabetically smallest language. A WHEN-ladder formulation
    references every score column ~N² times; after projection
    collapse that inlined the replace-chain score expressions enough
    to overflow whole-stage codegen's 64 KB method limit (observed in
    the clean_corpus composition).
    """
    scores = language_scores(text_col, markers)
    out = df.withColumns({f"score_{k}": v for k, v in scores.items()})
    langs = sorted(scores)
    structs = [
        F.struct(
            F.col(f"score_{k}").alias("s"),
            F.lit(len(langs) - 1 - i).alias("p"),
            F.lit(k).alias("l"),
        )
        for i, k in enumerate(langs)
    ]
    best = F.greatest(*structs)
    pred = F.when(best.getField("s") > 0, best.getField("l")).otherwise(
        F.lit("und")
    )
    return out.withColumn(out_col, pred)


def token_counts(
    df: DataFrame, text_col: str = "text", token_regex: str = TOKEN_REGEX
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return df.withColumns(
        {
            "ws_tokens": F.size(word_array(text_col)).cast("long"),
            "re_tokens": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(token_regex), F.lit(0))
            ).cast("long"),
        }
    )


# Demo subword vocabulary for bpe_token_counts: frequent English words,
# prefixes, suffixes, and bigrams — the shape of a BPE/WordPiece merge
# table (a static model artifact in a real pipeline; swap in the target
# tokenizer's vocab). Single characters are implicit (the fallback
# consumes one char as one token), so only multi-char pieces appear.
BPE_VOCAB: Sequence[str] = (
    # common whole words
    "the", "and", "of", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "are", "from",
    "or", "have", "not", "but", "what", "all", "were", "when", "there",
    # prefixes
    "con", "com", "pro", "pre", "per", "sub", "dis", "un", "re", "de",
    "ex", "inter", "over", "under", "trans",
    # suffixes
    "ing", "tion", "ation", "ment", "ness", "able", "ible", "ally",
    "ous", "ive", "ful", "less", "est", "ers", "ed", "ly", "es", "al",
    "ic", "ty", "ity", "ate", "ize", "ise", "ent", "ance", "ence",
    # frequent bigrams/trigrams
    "th", "he", "er", "on", "en", "ar", "or", "st", "ch", "sh", "wh",
    "qu", "ou", "le", "ck", "ght", "ther", "ion", "ter", "ver", "her",
    "ight", "ough", "ound",
)

# Greedy-match iteration cap: words needing more than this many pieces
# fall back to one-token-per-char for the remainder (both engines apply
# the same cap, so counts stay bit-identical).
BPE_CAP = 24


def bpe_effective_vocab(vocab: Sequence[str]) -> list[str]:
    """The pieces that actually participate in matching: deduped,
    multi-char only (single chars are the implicit fallback). SQL
    oracles should build their vocab relation from THIS list so both
    engines tokenize against the identical piece set."""
    return [p for p in dict.fromkeys(vocab) if len(p) >= 2]


def _vocab_by_len(vocab: Sequence[str]) -> dict[int, list[str]]:
    by_len: dict[int, list[str]] = {}
    for p in bpe_effective_vocab(vocab):
        by_len.setdefault(len(p), []).append(p)
    return by_len


def bpe_piece_count(
    word: Column, vocab: Sequence[str], cap: int = BPE_CAP
) -> Column:
    """Subword piece count of one (lowercase) word under greedy
    longest-match tokenization (WordPiece/BPE-style inference): at each
    position consume the longest vocabulary piece that matches, else
    one character. Pure column expression — runs inside whole-stage
    codegen, and a SQL oracle reproduces it with a recursive CTE
    (longest match = ``max(length(piece))`` over matching pieces).

    Iteration is ``aggregate`` over ``sequence(1, min(len, cap))`` with
    a ``(pos, cnt)`` accumulator; every step past the word end is a
    no-op, and chars left after ``cap`` greedy steps count one token
    each. Per-position cost is O(|vocab|) literal-array probes — fine
    for demo-scale vocabs; for a real 50k-piece vocab use
    ``bpe_token_counts(distinct_words=True)`` so each DISTINCT word is
    tokenized once (Zipf: distinct words ≪ occurrences).
    """
    by_len = _vocab_by_len(vocab)
    L = F.length(word)

    def step(acc: Column, _i: Column) -> Column:
        pos = acc.getField("pos")
        # longest piece matching at pos, else 1 (single-char fallback);
        # descending-length CASE ladder = longest match wins
        m = None
        for ln in sorted(by_len, reverse=True):
            arr = F.array(*[F.lit(p) for p in by_len[ln]])
            cond = F.array_contains(arr, F.substring(word, pos, ln))
            m = F.when(cond, F.lit(ln)) if m is None else m.when(cond, F.lit(ln))
        m = m.otherwise(F.lit(1)) if m is not None else F.lit(1)
        stepped = F.struct(
            (pos + m).alias("pos"), (acc.getField("cnt") + 1).alias("cnt")
        )
        return F.when(pos > L, acc).otherwise(stepped)

    return F.aggregate(
        F.sequence(F.lit(1), F.least(L, F.lit(cap))),
        F.struct(F.lit(1).alias("pos"), F.lit(0).alias("cnt")),
        step,
        lambda acc: acc.getField("cnt")
        + F.greatest(L - acc.getField("pos") + 1, F.lit(0)),
    )


# Auto-select threshold for bpe_token_counts(distinct_words=None):
# above this many effective pieces the O(|vocab|) per-char literal
# probe of the inline shape costs more than the distinct-word shape's
# three exchanges (measured crossover is corpus-dependent; the demo
# ~100-piece vocab stays inline, any production vocab flips).
BPE_AUTO_DISTINCT_MIN_VOCAB = 256


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    vocab: Sequence[str] = BPE_VOCAB,
    cap: int = BPE_CAP,
    out_col: str = "bpe_tokens",
    id_col: str = "doc_id",
    distinct_words: bool | None = None,
) -> DataFrame:
    """Append a subword token count per document — the model-tokenizer
    unit every token-budgeted stage (packing, mixture planning,
    curation) should budget in, rather than the whitespace-token proxy
    ``token_counts`` reports.

    Text is whitespace-split after lowercasing (vocab is lowercase);
    each word's pieces come from greedy longest-match against
    ``vocab`` (see ``bpe_piece_count``); null/empty text counts 0.

    Two execution shapes:

    - ``distinct_words=False`` (default): one pure projection — the
      nested aggregate runs at scan speed with ZERO shuffles. Right
      when the vocab is small (probe cost O(|vocab|) per char).
    - ``distinct_words=True``: explode → tokenize each DISTINCT word
      once → join counts back → re-aggregate per document. Three
      exchanges, but each distinct word pays the vocab probe exactly
      once — the scale shape for big vocabs over Zipf-distributed
      text, where "the" appears 10^9 times but is tokenized once. The
      word-keyed join is skewed by nature; AQE skew-join handles it,
      and the distinct-word side is typically small enough to
      broadcast.

    ``distinct_words=None`` (default) auto-selects: inline for small
    vocabs, distinct-word once the effective vocab exceeds
    ``BPE_AUTO_DISTINCT_MIN_VOCAB`` pieces (the probe cost is
    plan-time-known via the vocab size; corpus size only sharpens the
    same choice). Both shapes produce identical counts.
    """
    if distinct_words is None:
        distinct_words = (
            len(bpe_effective_vocab(vocab)) > BPE_AUTO_DISTINCT_MIN_VOCAB
        )
    warr = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )
    if not distinct_words:
        total = F.aggregate(
            warr,
            F.lit(0).cast("long"),
            lambda acc, w: acc + bpe_piece_count(w, vocab, cap).cast("long"),
        )
        return df.withColumn(out_col, F.coalesce(total, F.lit(0)).cast("long"))

    words = df.select(F.col(id_col), F.explode(warr).alias("__w"))
    wcounts = (
        words.select("__w")
        .distinct()
        .withColumn("__t", bpe_piece_count(F.col("__w"), vocab, cap))
    )
    sums = (
        words.join(wcounts, "__w")
        .groupBy(id_col)
        .agg(F.sum("__t").cast("long").alias(out_col))
    )
    return df.join(sums, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )


# Committed production-scale piece table (parquet, one ``piece``
# column, 12k pieces) — see tools/build_bpe_vocab.py for provenance.
BPE_VOCAB_LARGE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "bpe_vocab_large.parquet",
)


def load_bpe_vocab(spark, path: str = BPE_VOCAB_LARGE_PATH) -> DataFrame:
    """Load a tokenizer piece table (parquet with a ``piece`` VARCHAR
    column). The vocab is a model artifact of bounded size (tens of
    thousands of pieces, a few MB) — it does NOT grow with the corpus,
    so collecting and broadcasting it is the same contract as a
    broadcast-dim join."""
    return spark.read.parquet(path)


def _piece_tables(
    pieces: Sequence[str],
) -> list[tuple[int, frozenset[str]]]:
    """Length-bucketed piece sets, longest first — greedy longest-match
    probes O(#distinct-lengths) hash lookups per position instead of
    O(|vocab|) comparisons."""
    by_len: dict[int, set[str]] = {}
    for p in dict.fromkeys(pieces):
        if len(p) >= 2:  # single chars are the implicit fallback
            by_len.setdefault(len(p), set()).add(p)
    return [
        (ln, frozenset(by_len[ln])) for ln in sorted(by_len, reverse=True)
    ]


def bpe_piece_count_py(
    word: str, tables: list[tuple[int, frozenset[str]]], cap: int = BPE_CAP
) -> int:
    """Python mirror of ``bpe_piece_count``'s exact semantics (greedy
    longest-match, at most ``cap`` greedy steps, one token per
    remaining char past the cap) over length-bucketed piece sets."""
    L = len(word)
    pos = 0
    cnt = 0
    steps = 0
    while pos < L and steps < cap:
        m = 1
        for ln, pieces in tables:
            if ln <= L - pos and word[pos : pos + ln] in pieces:
                m = ln
                break
        cnt += 1
        pos += m
        steps += 1
    return cnt + (L - pos)


def bpe_token_counts_table(
    df: DataFrame,
    vocab: DataFrame | Sequence[str],
    text_col: str = "text",
    cap: int = BPE_CAP,
    out_col: str = "bpe_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """``bpe_token_counts`` for PRODUCTION vocabularies loaded from a
    piece table (``load_bpe_vocab``): greedy longest-match subword
    counts where the vocab is data, not plan literals.

    Execution shape (always distinct-word — the only sane shape at
    this vocab size): the piece table is collected once (bounded model
    artifact) into length-bucketed hash sets and broadcast to every
    executor; the corpus explodes to words, each DISTINCT word is
    tokenized exactly once by an Arrow-batched pandas UDF
    (O(#lengths) set probes per char — ~7 probes vs 12,000 literal
    comparisons for the inline CASE-ladder, which would also blow the
    codegen method-size limit at this vocab size), counts join back
    word-keyed, and a final per-doc sum restores the input grain.
    Zipf does the heavy lifting: "the" is tokenized once, not 10^9
    times. The word join is skew-prone by the same Zipf argument — AQE
    skew-join splits the hot word keys, and the distinct-word side
    broadcasts when small.

    Counts are bit-identical to ``bpe_token_counts`` given the same
    piece set (property-tested), and the DuckDB oracle reproduces them
    from the same parquet artifact via a recursive CTE.
    """
    if isinstance(vocab, DataFrame):
        pieces = [r[0] for r in vocab.select("piece").collect()]
    else:
        pieces = list(vocab)
    tables = _piece_tables(pieces)
    bc = df.sparkSession.sparkContext.broadcast(tables)

    @F.pandas_udf("long")
    def _tok(words: pd.Series) -> pd.Series:
        t = bc.value
        return words.map(lambda w: bpe_piece_count_py(w, t, cap)).astype(
            "int64"
        )

    warr = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )
    words = df.select(F.col(id_col), F.explode(warr).alias("__w"))
    wcounts = (
        words.select("__w").distinct().withColumn("__t", _tok(F.col("__w")))
    )
    sums = (
        words.join(wcounts, "__w")
        .groupBy(id_col)
        .agg(F.sum("__t").cast("long").alias(out_col))
    )
    return df.join(sums, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )


# Committed ranked-merge BPE artifacts — see tools/build_bpe_merges.py
# for provenance (learned from the corpus, padded to production size
# with well-founded a-z merges) and for the naive reference tokenizer
# the oracle counts come from.
BPE_MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "bpe_merges.parquet",
)
BPE_MERGE_COUNTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "bpe_merge_counts.parquet",
)
BPE_MERGE_MAX_WORD_LEN = 64


def load_bpe_merges(spark, path: str = BPE_MERGES_PATH) -> DataFrame:
    """Load a ranked-merge table (parquet with ``rank`` BIGINT,
    ``left``/``right`` VARCHAR). Same bounded-model-artifact contract
    as ``load_bpe_vocab``."""
    return spark.read.parquet(path)


def bpe_merge_tokens_py(
    word: str,
    ranks: Mapping[tuple[str, str], int],
    max_word_len: int = BPE_MERGE_MAX_WORD_LEN,
) -> int:
    """Merge-rank BPE token count for one word — TRUE BPE inference
    (merges applied in training-rank order), unlike the greedy
    longest-match of ``bpe_piece_count_py`` (which is WordPiece-style
    inference and can diverge from a shipped model tokenizer's counts
    on the same text).

    GPT-2-shaped implementation: find the lowest-rank adjacent pair
    present, merge ALL its occurrences in one left-to-right pass,
    repeat until no mergeable pair remains. For WELL-FOUNDED merge
    tables (each merge's operand tokens are single characters or
    outputs of strictly earlier merges — true of any table produced by
    BPE training, and of the committed artifact's padding order) this
    is provably equivalent to the one-occurrence-at-a-time reference
    in tools/build_bpe_merges.py: merging an occurrence of the minimal
    pair P can only create pairs ranked after P, so the reference
    keeps re-selecting P's occurrences left-to-right — exactly this
    pass. Parity is hypothesis-tested over the committed artifact.

    Words longer than ``max_word_len`` count as one token per char
    (no merging) — the byte-fallback a real tokenizer applies to
    pathological unsplit blobs, and an O(L^2) guard.
    """
    L = len(word)
    if L > max_word_len:
        return L
    seq = list(word)
    while len(seq) >= 2:
        best = None
        for pair in zip(seq, seq[1:]):
            r = ranks.get(pair)
            if r is not None and (best is None or r < best[0]):
                best = (r, pair)
        if best is None:
            break
        a, b = best[1]
        out = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


def bpe_merge_token_counts(
    df: DataFrame,
    merges: DataFrame | Mapping[tuple[str, str], int],
    text_col: str = "text",
    out_col: str = "bpe_merge_tokens",
    id_col: str = "doc_id",
    max_word_len: int = BPE_MERGE_MAX_WORD_LEN,
) -> DataFrame:
    """Per-document merge-rank BPE token counts — the TRUE-BPE
    counterpart of ``bpe_token_counts_table`` (which stays as the
    WordPiece-style greedy variant). Same execution shape, because the
    shape is what scales: the ranked-merge table is a bounded model
    artifact, collected once into a broadcast ``(left, right) -> rank``
    dict; the corpus explodes to words; each DISTINCT word is
    tokenized exactly once by an Arrow-batched pandas UDF (Zipf: "the"
    merges once, not 10^9 times); counts join back word-keyed (AQE
    skew-join handles the hot words) and a per-doc sum restores the
    input grain. Counts are parity-locked to the naive reference
    implementation in tools/build_bpe_merges.py, whose precomputed
    per-word outputs are the DuckDB oracle artifact."""
    if isinstance(merges, DataFrame):
        ranks = {
            (r["left"], r["right"]): int(r["rank"])
            for r in merges.select("left", "right", "rank").collect()
        }
    else:
        ranks = dict(merges)
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    @F.pandas_udf("long")
    def _tok(words: pd.Series) -> pd.Series:
        t = bc.value
        return words.map(
            lambda w: bpe_merge_tokens_py(w, t, max_word_len)
        ).astype("int64")

    warr = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )
    words = df.select(F.col(id_col), F.explode(warr).alias("__w"))
    wcounts = (
        words.select("__w").distinct().withColumn("__t", _tok(F.col("__w")))
    )
    sums = (
        words.join(wcounts, "__w")
        .groupBy(id_col)
        .agg(F.sum("__t").cast("long").alias(out_col))
    )
    return df.join(sums, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
    weight_col: str = "weight",
    bias: int = 0,
    threshold: int = 0,
    round_to: int = 6,
) -> DataFrame:
    """Linear bag-of-words classifier scoring — the fasttext-style
    model-based quality-filter stage of an LLM data pipeline, applied
    at corpus scale without leaving the JVM.

    ``weights`` is the model artifact: one row per vocabulary term with
    an integer weight in micro-units (1e-6), quantized so per-document
    sums are exact LONG arithmetic — float summation is
    order-dependent and a distributed sum would not reproduce
    bit-identically across engines or runs. Output per document:
    ``n_words``, ``matched`` (tokens found in the vocabulary),
    ``logit_micro = bias + Σ weight[token]`` (every token occurrence
    counts, as in a bag-of-words linear model), ``score`` (the
    length-normalized logit in natural units, rounded), and ``keep``
    (``logit_micro >= threshold``).

    Scale shape (the plan that survives 100 TB): tokenize as a
    projection, ``explode`` to one row per token, broadcast-hash-join
    the vocabulary (map-side, no corpus shuffle), then ONE group-by on
    the document id — partial aggregation collapses each document's
    tokens to a single row before the exchange, so shuffle volume is
    ~1 row per document, not per token. Empty/null-text documents are
    dropped (same contract as chunk_documents).
    """
    words = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda w: F.length(w) > 0,
    )
    tokens = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.size(words).alias("n_words"), words.alias("__w"))
        .filter(F.col("n_words") > 0)
        .select(id_col, "n_words", F.explode("__w").alias(term_col))
    )
    scored = tokens.join(
        F.broadcast(weights.select(term_col, weight_col)), on=term_col, how="left"
    )
    wsum = F.sum(F.coalesce(F.col(weight_col), F.lit(0))).cast("long")
    logit = (F.lit(bias) + F.col("__wsum")).cast("long")
    return (
        scored.groupBy(id_col)
        .agg(
            F.any_value("n_words").cast("long").alias("n_words"),
            F.count(weight_col).alias("matched"),
            wsum.alias("__wsum"),
        )
        .select(
            id_col,
            "n_words",
            "matched",
            logit.alias("logit_micro"),
            F.round(logit / (F.lit(1e6) * F.col("n_words")), round_to).alias(
                "score"
            ),
            (logit >= F.lit(threshold)).alias("keep"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    ``score = tf * round(ln((N+1)/(df+1)), round_to)``, rounded again
    to ``round_to`` — each float step is a single IEEE operation with
    a round after it, so a SQL oracle recomputes it exactly. Ties
    break on term ascending (deterministic).

    Scale shape: one explode→groupBy for term frequencies (shuffle on
    (doc, term)), one groupBy for document frequencies (shuffle on
    term — partial aggregation collapses each partition to its
    vocabulary first), a broadcast of the 1-row corpus size, and one
    window for the top-k. No driver-side vocabulary, no collect.
    """
    words = df.select(
        F.col(id_col), F.explode(word_array(text_col)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is unique per (doc, term), so document frequency is a row
    # count over tf — no second explode over the corpus, and Catalyst
    # reuses tf's shuffle for both consumers (ReusedExchange).
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("__n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.col("__n_docs") + F.lit(1.0))
                    / (F.col("df_docs") + F.lit(1.0))
                ),
                round_to,
            ),
        )
        .withColumn("score", F.round(F.col("tf") * F.col("idf"), round_to))
        .drop("__n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround. Applied
# email → ip → phone so the broad phone pattern can't eat IP octets.
PII_PATTERNS: Sequence[tuple[str, str, str]] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9()\s.-]{6,}[0-9]", "[PHONE]"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    patterns: Sequence[tuple[str, str, str]] = PII_PATTERNS,
) -> DataFrame:
    """Regex PII redaction (emails, IPv4, phone-ish digit runs) with
    per-class match counts — the standard pre-training scrub step.

    Pure projection: every replacement and count is a regexp
    expression inside whole-stage codegen, so the scrub runs at scan
    speed with zero shuffles at any corpus size. Counts are measured
    on the ORIGINAL text (before any replacement) so classes don't
    mask each other's tallies; replacements chain in ``patterns``
    order.
    """
    t = F.col(text_col)
    counts = {
        f"n_{name}": _count_matches(t, pat).cast("long")
        for name, pat, _ in patterns
    }
    cleaned = t
    for _, pat, token in patterns:
        cleaned = F.regexp_replace(cleaned, pat, token)
    return df.withColumns({**counts, out_col: cleaned})


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: Sequence[int] = (1, 2, 3),
    round_to: int = 4,
) -> DataFrame:
    """Within-document repetition signals (the Gopher/FineWeb-style
    quality gate): per document, for each n in ``ns``, the fraction of
    duplicated word n-grams and the share of the single most frequent
    n-gram.

    Columns (n=1 is named ``word``): ``total_words``,
    ``dup_{word,2gram,3gram}_frac`` = (total - distinct) / total,
    ``top_{word,2gram,3gram}_frac`` = max single-gram count / total.

    Scale shape: ONE explode carrying (n, gram) structs for all ns
    (narrow), a two-level aggregation — groupBy(doc, n, gram) then a
    conditional-aggregate groupBy(doc) — so partial aggregation
    collapses each partition's gram counts before the single shuffle
    on (doc, n, gram). No per-document quadratic array scans: a pure
    array-expression formulation (count each distinct gram with
    ``filter``) is O(words²) per document and dies on long documents.

    Documents whose text is NULL are filtered out explicitly (engines
    disagree on NULL propagation through lambda chains); empty text
    yields one empty-string gram per n — both match the SQL oracle's
    semantics exactly.
    """
    from traits_data_spark.operators.dedup import widen_if_narrow, word_ngrams

    df = df.filter(F.col(text_col).isNotNull())

    # NB: the lambda must be unary — PySpark treats a 2-arg lambda as
    # an (element, index) function, which would bind n to the index.
    def _tagged(n: int) -> Column:
        return F.transform(
            word_ngrams(text_col, n=n, distinct=False),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    gram_arrays = [_tagged(n) for n in ns]
    ex = (
        widen_if_narrow(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .select("id", F.explode(F.concat(*gram_arrays)).alias("g"))
        .select("id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    )
    counts = ex.groupBy("id", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    def _name(n: int) -> str:
        return "word" if n == 1 else f"{n}gram"

    aggs = []
    for n in ns:
        is_n = F.col("n") == n
        aggs += [
            F.sum(F.when(is_n, F.col("cnt"))).alias(f"__total_{n}"),
            F.count(F.when(is_n, F.lit(1))).alias(f"__distinct_{n}"),
            F.max(F.when(is_n, F.col("cnt"))).alias(f"__top_{n}"),
        ]
    per_doc = counts.groupBy("id").agg(*aggs)
    out_cols: dict[str, Column] = {}
    for n in ns:
        total = F.col(f"__total_{n}")
        out_cols[f"dup_{_name(n)}_frac"] = F.round(
            (total - F.col(f"__distinct_{n}")) / total.cast("double"), round_to
        )
        out_cols[f"top_{_name(n)}_frac"] = F.round(
            F.col(f"__top_{n}") / total.cast("double"), round_to
        )
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col(f"__total_{ns[0]}").alias(f"total_{_name(ns[0])}s"),
        *[c.alias(name) for name, c in out_cols.items()],
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "char_entropy",
    round_to: int = 4,
) -> DataFrame:
    """Shannon entropy (bits) of the per-document character
    distribution over the lowercased ``[a-z0-9 ]`` skeleton — the
    cheap perplexity proxy (low entropy = repetitive/degenerate text,
    near-uniform = random noise; both are quality-gate signals).

    Scale shape: explode chars → count per (doc, char) → one integer
    window for the doc total → sum. Each entropy term is rounded to
    1e-9 and summed as a scaled BIGINT, so the cross-row sum is
    order-independent — bit-identical on any engine/partitioning
    (cross-row double sums are not). Docs whose skeleton is empty get
    entropy 0.
    """
    skel = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    chars = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(skel, "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy("id"))
    p = F.col("cnt").cast("double") / F.col("__total").cast("double")
    term = F.round(-p * F.log(p) / F.lit(math.log(2)) * 1e9).cast("long")
    per_doc = (
        counts.withColumn("__total", total)
        .withColumn("__term", term)
        .groupBy("id")
        .agg(F.sum("__term").alias("__tsum"))
        .select(
            F.col("id").alias(id_col),
            F.round(F.col("__tsum").cast("double") / 1e9, round_to).alias(
                out_col
            ),
        )
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(per_doc, id_col, "left").withColumn(
        out_col, F.coalesce(out_col, F.lit(0.0))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03
    — the MOSS algorithm): from every window of ``w`` consecutive
    word-``k``-gram hashes, select the minimum (rightmost on ties),
    dedup the selections. The guarantee that makes this the standard
    copy-detection sketch: any shared passage of at least ``w + k - 1``
    words between two documents shares at least one fingerprint, while
    only ~2/(w+1) of the grams are kept.

    One row per selected fingerprint: ``(id, pos, fp)`` with ``pos``
    the 1-based gram position and ``fp`` the portable 60-bit gram
    hash — cross-doc matches are then a plain groupBy/join on ``fp``.

    Scale shape: pure per-document expressions (split → gram hashes →
    per-window fold) at scan speed, zero shuffles; the downstream
    match join keys on ``fp`` (high-cardinality, unskewed by
    construction). Null texts produce no rows.
    """
    words = F.filter(
        F.split(normalized_text(text_col), " "), lambda t: F.length(t) > 0
    )

    def fps(wl: Column) -> Column:
        n_grams = F.greatest(F.size(wl) - (k - 1), F.lit(1))
        grams_expr = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.struct(
                portable_hash64(F.array_join(F.slice(wl, i, k), " ")).alias(
                    "h"
                ),
                i.cast("long").alias("p"),
            ),
        )

        # _let-bind the gram array: a lambda body re-evaluates any
        # OUTER expression per element (HOFs are interpreted, no CSE),
        # so an unbound `grams` re-hashed every gram once per window —
        # O(n_grams · n_wins) hash evaluations per document (167
        # task-seconds of the copy_pagerank profile, round 16). Bound,
        # the grams array is computed once per row.
        def over_grams(grams: Column) -> Column:
            def win_min(s: Column) -> Column:
                window = F.slice(grams, s, w)
                zero = F.struct(
                    F.lit((1 << 62) - 1 + (1 << 62)).alias("h"),  # 2^63-1
                    F.lit(0).cast("long").alias("p"),
                )
                return F.aggregate(
                    window,
                    zero,
                    lambda acc, x: F.when(
                        (x.getField("h") < acc.getField("h"))
                        | (
                            (x.getField("h") == acc.getField("h"))
                            & (x.getField("p") > acc.getField("p"))
                        ),
                        x,
                    ).otherwise(acc),
                )

            n_wins = F.greatest(F.size(grams) - (w - 1), F.lit(1))
            return F.array_distinct(
                F.transform(F.sequence(F.lit(1), n_wins), win_min)
            )

        return _let(grams_expr, over_grams)

    from traits_data_spark.operators.dedup import _let

    out = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(_let(words, fps)).alias("__fp")
    )
    return out.select(
        id_col,
        F.col("__fp.p").alias("pos"),
        F.col("__fp.h").alias("fp"),
    )


def winnow_matches(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    min_shared: int = 2,
    max_fp_docs: int = 1000,
) -> DataFrame:
    """Cross-document copy-detection report over a
    ``winnow_fingerprints`` table: document pairs ranked by how many
    winnowed fingerprints they share — MOSS's output, as one
    fingerprint-keyed join.

    ``max_fp_docs`` caps degenerate fingerprints (boilerplate shared
    by thousands of documents would otherwise go quadratic — the same
    guard as ``minhash_lsh_candidates``' bucket cap; capped
    fingerprints carry no copy signal anyway, exactly like LSH
    stop-buckets). ``min_shared`` floors the report (one shared
    fingerprint of a ``w+k-1`` window is a weak signal; real copies
    share many).

    Returns ``(id_a, id_b, shared_fps)`` with ``id_a < id_b``. Scale
    shape: distinct → one groupBy(fp) with map-side combine → pairs
    expanded only inside surviving fingerprint groups → one pair-keyed
    count. Never all-pairs.
    """
    # persist the distinct fingerprint table: it feeds the bucket-size
    # aggregate AND both pair-expansion join legs, and each reference
    # otherwise re-computes the full upstream fingerprint pass after
    # the distinct's exchange (stage-profiled round 16: two ~135 s
    # task-time stages for ONE winnow pass — the exchange is reused,
    # the post-exchange work is not). At scale this is the standard
    # shuffle-once-reuse-thrice materialization.
    f = fps.select(
        F.col(id_col).alias("__id"), F.col(fp_col).alias("__fp")
    ).distinct().transform(barrier)
    sized = f.join(
        f.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_fp_docs)
        .select("__fp"),
        "__fp",
    )
    a = sized.select(F.col("__fp"), F.col("__id").alias("id_a"))
    b = sized.select(F.col("__fp"), F.col("__id").alias("id_b"))
    return (
        a.join(b, "__fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def document_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Content fingerprint: portable 60-bit hash of the alphanumeric
    skeleton (robust to whitespace/punctuation-only edits)."""
    skeleton = F.lower(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9]+", ""))
    return df.withColumn(out_col, portable_hash64(skeleton))


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    champion_n: int | None = None,
    champion_salt: int = 32,
) -> DataFrame:
    """BM25 full-text retrieval: top-k corpus documents per query
    (Robertson & Spärck Jones probabilistic ranking, the Lucene /
    Elasticsearch default — reference analogue: the FULLTEXT index DDL
    the reference emits in db_writer, whose query side SURVEY scopes
    to the engine as a ranking operator).

    Scoring: ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with ``idf = round(ln(1 + (N-df+0.5)/(df+0.5)), round_to)`` — the
    round(ln, 6) idf follows the ``tfidf_top_terms`` precedent; every
    other float step is IEEE-deterministic in a fixed written order.
    Each per-term contribution is then converted to INTEGER micro-units
    (``round(x·10⁶)`` as BIGINT) before the per-document sum, so the
    sum is shuffle-order-free and a SQL oracle hash-matches it exactly
    (same pattern as ``pq_topk``'s ADC sums and ``lm_perplexity``).

    Scale shape (the inverted-index story at 100 TB): the corpus is
    tokenized in ONE scan-speed pass (explode + per-doc length as a
    projection); the query vocabulary — bounded by the query set, not
    the corpus — is broadcast, and postings are pruned by that
    broadcast join BEFORE any shuffle, so the (doc,term) tf aggregate
    and the df aggregate only ever shuffle matched postings. avgdl and
    N are one-row broadcast aggregates. The final top-k is a window
    partitioned by query over |Q|·matched rows. No driver collect, no
    corpus-wide shuffle on a natural key.

    ``champion_n=N`` enables champion lists (Manning IIR §7.1.3, the
    static index-pruning mode production engines pair with exhaustive
    scoring): only each term's top-N postings by ``(tf desc, doc asc)``
    are scored, bounding per-term work to N REGARDLESS of corpus size
    — the answer to the degenerate every-term-matches-everything case,
    where exhaustive scoring is |Q|·|D| (round-11 20× stress: 400×
    scored pairs). Approximate by design: a document outside all of a
    query's champion lists cannot be retrieved; ``idf``/``df`` stay
    exact (computed on the UNCUT postings — the standard contract,
    since champion lists prune scoring, not the dictionary). The cut
    is a salted two-phase top-N (top-N per (term, hash-salt bucket),
    then top-N of the ≤ N·``champion_salt`` survivors), so a hot term
    whose postings list is the whole corpus never sorts in one task —
    the same analytic-window hot-key hazard the substring profile
    avoids via groupBy.
    """
    corp = corpus.filter(F.col(text_col).isNotNull())
    # One tokenize per row WITHIN each subtree: the named __wa column
    # stops CollapseProject from inlining word_array into both size()
    # and explode() (which ran the normalize+split+filter chain twice
    # per corpus row), and dl rides along in the token projection
    # (any_value'd after the tf aggregate) so no corpus-wide doc-length
    # frame ever joins back in. NOTE the avgdl/N stats branch below is
    # a SEPARATE subtree over the same projection: toks is not
    # materialized, so the corpus is tokenized twice per query — once
    # for postings, once for the stats aggregate. Measured round 17
    # (ab_query min, sf0.1): status quo 1.87 s, toks.persist() 2.26 s,
    # eager barrier 1.88 s — materializing corpus-sized token arrays
    # costs at least what the second scan-speed pass costs, and the
    # stats subtree executes as a concurrent broadcast-future job, so
    # the second pass overlaps the main chain. Deliberately left as
    # two passes; deriving N/avgdl from the postings side is NOT
    # possible (docs with zero matched terms still count).
    toks = corp.select(F.col(id_col), word_array(text_col).alias("__wa"))
    words = toks.select(
        F.col(id_col),
        F.size("__wa").cast("long").alias("dl"),
        F.explode("__wa").alias("term"),
    ).withColumn("term", F.lower(F.col("term")))
    qterms = (
        queries.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias(query_id_col),
            F.explode(word_array(text_col)).alias("term"),
        )
        .withColumn("term", F.lower(F.col("term")))
        .distinct()
    )
    # prune postings on the broadcast query vocabulary FIRST: the tf /
    # df shuffles below only see matched postings
    qvocab = qterms.select("term").distinct()
    matched = words.join(F.broadcast(qvocab), "term")
    tf = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.any_value("dl").alias("dl"),
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    if champion_n is not None:
        # salted two-phase per-term top-N: phase 1 ranks inside
        # (term, hash(doc) % salt) buckets — a bucket row ranked past
        # champion_n can never reach the term's global top-N — phase 2
        # ranks the <= N*salt survivors. Deterministic regardless of
        # salting; df/idf above intentionally derive from the UNCUT tf.
        order = [F.col("tf").desc(), F.col(id_col).asc()]
        w1 = Window.partitionBy(
            "term",
            F.pmod(
                portable_hash64(F.col(id_col).cast("string")),
                F.lit(int(champion_salt)),
            ),
        ).orderBy(*order)
        w2 = Window.partitionBy("term").orderBy(*order)
        tf = (
            tf.withColumn("__crk", F.row_number().over(w1))
            .filter(F.col("__crk") <= int(champion_n))
            .withColumn("__crk", F.row_number().over(w2))
            .filter(F.col("__crk") <= int(champion_n))
            .drop("__crk")
        )
    # avgdl / N over ALL docs — a scan-speed projection folded into a
    # one-row broadcast aggregate (derived from the shared token
    # projection: one tokenize, not a second per-doc word_array pass)
    doclen = toks.select(
        F.col(id_col), F.size("__wa").cast("long").alias("dl")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + ((F.col("__n") - F.col("df_docs")).cast("double") + F.lit(0.5))
            / (F.col("df_docs").cast("double") + F.lit(0.5))
        ),
        round_to,
    )
    tf_norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / F.col("__avgdl"))
        )
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .join(
            F.broadcast(qterms), "term"
        )  # fan out each posting to the queries containing the term
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.round(idf * tf_norm * F.lit(1_000_000.0))
            .cast("long")
            .alias("__c_micro"),
        )
    )
    scored = contrib.groupBy(query_id_col, "neighbor_id").agg(
        F.sum("__c_micro").cast("long").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "matched_terms",
            "score_micro",
            (F.round(F.col("score_micro") / F.lit(1_000_000.0), round_to)
             + F.lit(0.0)).alias("score"),
            "rk",
        )
    )


# Committed unigram-LM (SentencePiece-style) tokenizer artifacts — see
# tools/build_unigram_vocab.py for provenance (substring-seeded,
# EM-refined, pruned + padded to production size) and for the recursive
# reference tokenizer the oracle counts come from.
UNIGRAM_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "unigram_vocab.parquet",
)
UNIGRAM_COUNTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "unigram_counts.parquet",
)
UNIGRAM_MAX_PIECE_LEN = 4
UNIGRAM_UNK_LOGP_MICRO = -20_000_000
UNIGRAM_MAX_WORD_LEN = 64


def load_unigram_vocab(spark, path: str = UNIGRAM_VOCAB_PATH) -> DataFrame:
    """Load a unigram-LM piece table (parquet with ``piece`` VARCHAR,
    ``logp_micro`` BIGINT — integer micro-nat log-probs, so no ``ln``
    ever runs in a query plan). Same bounded-model-artifact contract
    as ``load_bpe_vocab`` / ``load_bpe_merges``."""
    return spark.read.parquet(path)


def unigram_tokens_py(
    word: str,
    logp: Mapping[str, int],
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> tuple[int, int]:
    """Unigram-LM Viterbi token count for one word (Kudo 2018, the
    SentencePiece ``unigram`` model): choose the segmentation
    maximizing ``(Σ logp_micro(piece), -n_pieces)`` lexicographically —
    integer micro-nat scores, so the optimum is exact and
    engine-portable. Returns ``(n_tokens, nll_micro)``.

    Iterative LEFT-TO-RIGHT DP — deliberately a different
    implementation from the recursive best-suffix reference in
    tools/build_unigram_vocab.py it is parity-tested against. Unknown
    single chars segment with a fixed ``UNIGRAM_UNK_LOGP_MICRO``
    penalty (byte-fallback stand-in); words longer than
    ``max_word_len`` tokenize as chars (O(L²) guard, same rule as
    ``bpe_merge_tokens_py``)."""
    L = len(word)
    if L > max_word_len:
        nll = -sum(
            logp.get(c, UNIGRAM_UNK_LOGP_MICRO) for c in word
        )
        return L, nll
    # dp[i] = best (score_micro, -count) over segmentations of word[:i]
    dp: list[tuple[int, int] | None] = [None] * (L + 1)
    dp[0] = (0, 0)
    for i in range(1, L + 1):
        best = None
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j != 1:
                    continue
                lp = UNIGRAM_UNK_LOGP_MICRO
            prev = dp[j]
            if prev is None:
                continue
            cand = (prev[0] + lp, prev[1] - 1)
            if best is None or cand > best:
                best = cand
        dp[i] = best
    score, negc = dp[L]  # type: ignore[misc]
    return -negc, -score


def unigram_token_counts(
    df: DataFrame,
    vocab: DataFrame | Mapping[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
) -> DataFrame:
    """Per-document unigram-LM token counts and total negative
    log-prob — the third tokenizer family next to greedy
    longest-match (WordPiece inference, ``bpe_token_counts_table``)
    and merge-rank BPE (``bpe_merge_token_counts``).

    Execution shape is the one that scales (identical to the other
    two): the piece table is a bounded model artifact collected once
    into a broadcast ``piece -> logp_micro`` dict; the corpus explodes
    to words; each DISTINCT word runs Viterbi exactly once in an
    Arrow-batched pandas UDF (Zipf collapses the work); results join
    back word-keyed and one per-doc sum restores the input grain.
    ``nll_micro`` is an integer micro-nat sum, so it is
    shuffle-order-free and SQL-oracle exact."""
    if isinstance(vocab, DataFrame):
        table = {
            r["piece"]: int(r["logp_micro"])
            for r in vocab.select("piece", "logp_micro").collect()
        }
    else:
        table = dict(vocab)
    bc = df.sparkSession.sparkContext.broadcast(table)

    @F.pandas_udf("n_tokens long, nll_micro long")
    def _tok(words: pd.Series) -> pd.DataFrame:
        t = bc.value
        out = words.map(
            lambda w: unigram_tokens_py(w, t, max_piece_len)
        )
        return pd.DataFrame(
            {
                "n_tokens": out.map(lambda p: p[0]).astype("int64"),
                "nll_micro": out.map(lambda p: p[1]).astype("int64"),
            }
        )

    warr = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )
    words = df.select(F.col(id_col), F.explode(warr).alias("__w"))
    wcounts = (
        words.select("__w")
        .distinct()
        .withColumn("__t", _tok(F.col("__w")))
        .select("__w", "__t.n_tokens", "__t.nll_micro")
    )
    sums = (
        words.join(wcounts, "__w")
        .groupBy(id_col)
        .agg(
            F.sum("n_tokens").cast("long").alias("unigram_tokens"),
            F.sum("nll_micro").cast("long").alias("nll_micro"),
        )
    )
    return df.join(sums, id_col, "left").withColumns(
        {
            "unigram_tokens": F.coalesce(
                F.col("unigram_tokens"), F.lit(0)
            ).cast("long"),
            "nll_micro": F.coalesce(F.col("nll_micro"), F.lit(0)).cast(
                "long"
            ),
        }
    )


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Vocabulary drift between two corpus slices (snapshot T vs T+1,
    source A vs source B): per-word occurrence counts on each side,
    ranked by the EXACT cross-product drift statistic

        ``drift_cross = |count_a * total_b - count_b * total_a|``

    — the integer numerator of ``|p_a(w) - p_b(w)|`` cleared of both
    denominators, so ranking needs no division at all (BIGINT-exact on
    both engines; the float rate difference would tie-break
    non-portably). ``tv_contrib`` = the word's contribution to total
    variation distance, ``drift_cross / (2 * total_a * total_b)`` — a
    single IEEE-exact division of exact integers, emitted for humans
    and still hash-stable. Σ tv_contrib over ALL words = TV(p_a, p_b).

    This is the standard drift monitor a corpus pipeline runs between
    ingestion snapshots (and the Monroe et al. "Fightin' Words" shape
    for what distinguishes corpus A from B, with raw-count evidence
    attached).

    Scale shape: two word-keyed partial-agg counts (map-side combined),
    one vocab-sized full-outer join on the word key, totals broadcast
    as one-row frames. Nothing corpus-sized survives the first
    aggregate; the optional ``top_n`` window ranks the VOCAB frame.
    At 100 TB note ``drift_cross`` spans ~2*log2(count*total) bits —
    beyond ~3e18 pre-scale counts to per-million rates first.
    """

    def _counts(df: DataFrame, out: str) -> DataFrame:
        wl = F.filter(
            F.split(normalized_text(text_col), " "),
            lambda w: F.length(w) > 0,
        )
        return (
            df.select(F.explode(wl).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    a = _counts(df_a, "count_a")
    b = _counts(df_b, "count_b")
    j = (
        a.join(b, "word", "full_outer")
        .withColumn("count_a", F.coalesce("count_a", F.lit(0)).cast("long"))
        .withColumn("count_b", F.coalesce("count_b", F.lit(0)).cast("long"))
    )
    totals = j.agg(
        F.sum("count_a").cast("long").alias("__ta"),
        F.sum("count_b").cast("long").alias("__tb"),
    )
    out = (
        j.crossJoin(F.broadcast(totals))
        .withColumn(
            "drift_cross",
            F.abs(
                F.col("count_a") * F.col("__tb")
                - F.col("count_b") * F.col("__ta")
            ).cast("long"),
        )
        .withColumn(
            "tv_contrib",
            # NULL (not NaN) when either side is empty — 0/0 must not
            # poison the hash gate
            F.when(
                (F.col("__ta") > 0) & (F.col("__tb") > 0),
                F.round(
                    F.col("drift_cross").cast("double")
                    / (
                        F.lit(2) * F.col("__ta") * F.col("__tb")
                    ).cast("double"),
                    9,
                )
                + F.lit(0.0),
            ),
        )
        .select("word", "count_a", "count_b", "drift_cross", "tv_contrib")
    )
    if top_n is not None:
        w = Window.orderBy(F.col("drift_cross").desc(), F.col("word").asc())
        out = (
            out.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= int(top_n))
        )
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_word_len: int = 32,
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merges from the corpus (Sennrich
    et al., ACL'16 — the algorithm behind GPT-2/LLaMA tokenizers),
    ON-CLUSTER: the distributed counterpart of the offline artifact
    builder (``tools/build_bpe_merges.py``), for the 100-TB regime
    where the tokenizer must be trained on the corpus being curated
    rather than on a laptop sample. Returns ``(rank, left, right,
    pair_count)`` — most-frequent adjacent symbol pair first,
    occurrence-weighted, lexicographic (left, right) tie-break.

    Scale shape: the corpus is touched ONCE (the distinct-word count
    shuffle — the same Zipf collapse every tokenizer op here rides);
    each merge iteration then runs on the bounded vocabulary table:
    one pair-count shuffle over ~|vocab| rows, a global top-1
    (TakeOrderedAndProject — no full sort), and a broadcast one-row
    cross join applying the merge as a LITERAL (non-regex) string
    replace over the spaced-symbol form. Per-iteration eager
    ``localCheckpoint`` keeps the vocab table's plan flat (the frames
    are vocab-sized, so the job barrier costs microseconds — the
    opposite trade from ``kmeans_fit``'s corpus-scale loop, which
    checkpoints only once at the end).

    Exactness: the merge pass is a string FOLD over the symbol array
    (Spark ``aggregate`` / DuckDB ``list_reduce``, '' sentinel
    accumulator): append ``x`` to the tail symbol when the tail
    equals ``left`` and ``x`` equals ``right``, else start a new
    symbol — exactly canonical greedy left-to-right non-overlapping
    merging ('a a a a a' under (a,a) → [aa, aa, a]; a freshly merged
    tail never re-matches because ``ends_with(acc, ' '||left)`` sees
    the merged symbol, not its suffix). A literal
    ``replace(' l l ', ' ll ')`` is NOT equivalent: each match
    consumes the shared separator space, skipping adjacent disjoint
    occurrences ('a b a b' would merge only the first pair). Pair
    counts are integer sums — no floating point anywhere.
    """
    merges, _ = _bpe_train_loop(
        df, text_col=text_col, n_merges=n_merges, max_word_len=max_word_len
    )
    if not merges:  # nothing learnable (empty corpus / single-char words)
        return df.sparkSession.createDataFrame(
            [], "rank long, left string, right string, pair_count long"
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_train_words(
    df: DataFrame, text_col: str, max_word_len: int
) -> DataFrame:
    """Distinct-word counts for BPE training: normalized lowercase
    words, empty and over-length words excluded."""
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(wlist).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bpe_train_loop(
    df: DataFrame, text_col: str, n_merges: int, max_word_len: int
) -> tuple[list[DataFrame], DataFrame]:
    """Shared merge-learning loop: returns the per-rank one-row merge
    frames AND the final word-state table ``(w, sym, c)`` — the word
    survives the loop so ``bpe_train_token_counts`` can tokenize the
    corpus by joining back on it (in rank-8 BPE the final training
    states ARE the tokenization under the learned merges)."""
    wc = _bpe_train_words(df, text_col, max_word_len)
    cur = wc.select(
        "w",
        F.concat(
            F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")
        ).alias("sym"),
        "c",
    ).transform(barrier)

    def fold_merge(acc: Column, x: Column) -> Column:
        hit = acc.endswith(F.concat(F.lit(" "), F.col("__l"))) & (
            x == F.col("__r")
        )
        return F.when(hit, F.concat(acc, x)).otherwise(
            F.concat(acc, F.lit(" "), x)
        )

    merges: list[DataFrame] = []
    for i in range(n_merges):
        arr = F.split(F.trim(F.col("sym")), " ")
        sz = F.size(arr)
        pairs = cur.select(
            "c",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, sz - 1),
                    F.slice(arr, 2, sz - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("pr"),
        )
        best = (
            pairs.groupBy(
                F.col("pr.l").alias("left"), F.col("pr.r").alias("right")
            )
            .agg(F.sum("c").cast("long").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .transform(barrier)
        )
        if best.isEmpty():  # vocabulary fully merged — nothing left
            break
        merges.append(
            best.select(
                F.lit(i + 1).cast("long").alias("rank"),
                "left",
                "right",
                "pair_count",
            )
        )
        cur = (
            cur.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("left").alias("__l"),
                        F.col("right").alias("__r"),
                    )
                )
            )
            .select(
                "w",
                F.concat(
                    F.aggregate(
                        F.split(F.trim(F.col("sym")), " "),
                        F.lit(""),
                        fold_merge,
                    ),
                    F.lit(" "),
                ).alias("sym"),
                "c",
            )
            .transform(barrier)
        )
    return merges, cur


def bpe_train_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_trained_tokens",
    n_merges: int = 8,
    max_word_len: int = 32,
) -> DataFrame:
    """Train BPE on the corpus, then tokenize the SAME corpus with the
    merges just learned — the end-to-end on-cluster tokenizer story
    (every other tokenizer entry applies a PRE-committed artifact).
    With merges applied in rank order, the training loop's final
    word-state table IS the tokenization, so application costs one
    vocab-sized broadcast join back to the exploded corpus — no
    second tokenization pass exists to disagree with training. Words
    longer than ``max_word_len`` (excluded from training) fall back
    to one-token-per-char, the same total-function convention as
    ``bpe_merge_token_counts``; documents with no words keep their
    row with 0 tokens. Output: ``(id_col, out_col)``."""
    _, states = _bpe_train_loop(
        df, text_col=text_col, n_merges=n_merges, max_word_len=max_word_len
    )
    ntok = states.select(
        "w",
        F.size(F.split(F.trim(F.col("sym")), " ")).cast("long").alias(
            "__nt"
        ),
    )
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(F.split(nt, " "), lambda x: F.length(x) > 0)
    words = df.select(
        F.col(id_col),
        F.explode_outer(
            F.when(F.col(text_col).isNotNull(), wlist)
        ).alias("w"),
    )
    return (
        words.join(F.broadcast(ntok), "w", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("w").isNull(), F.lit(0))
                .when(F.col("__nt").isNotNull(), F.col("__nt"))
                .otherwise(F.length(F.col("w")).cast("long"))
            )
            .cast("long")
            .alias(out_col)
        )
    )


def word_bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """``(u, w, n_uw)`` word-bigram type counts with the sentence-start
    ``<s>`` prepend — the shared count stage of the bigram-LM trainers
    and the persistable LM-count index: counts are ADD-MERGEABLE
    (``merge_bigram_counts`` of per-slice counts == counts over the
    union), so a nightly ingest extends the persisted table from the
    new batch alone and the model re-derives from the vocab²-bounded
    counts — history text is never re-tokenized (the
    ``content_hash_index`` / ``hyperplane_bucket_index`` maintenance
    contract applied to LM training)."""
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.concat(F.array(F.lit("<s>")), wlist).alias("ws")
    )
    arr = F.col("ws")
    n = F.size(arr)
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice(arr, 1, n - 1),
                F.slice(arr, 2, n - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("w")),
            )
        ).alias("bg")
    )
    return big.groupBy(
        F.col("bg.u").alias("u"), F.col("bg.w").alias("w")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_uw"))


def merge_bigram_counts(*parts: DataFrame) -> DataFrame:
    """Merge per-slice ``word_bigram_counts`` tables (union + keyed
    sum) — one shuffle over count rows, never over text."""
    if not parts:
        raise ValueError("merge_bigram_counts needs at least one part")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("u", "w").agg(
        F.sum("n_uw").cast("long").alias("n_uw")
    )


def train_bigram_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train the Laplace-smoothed word-bigram LM ON-CLUSTER — the
    distributed counterpart of the offline artifact builder
    (``tools/build_word_lm.py``) whose output the CCNet-style
    perplexity filter (``operators/perplexity.py``) consumes. One row
    per SEEN bigram: ``(u, w, n_uw, n_u, p)`` with
    ``p = round((n_uw + 1) / (n_u + V), prob_dp)`` where ``V`` =
    |vocab| + 1 ('<unk>') — exactly the builder's model, minus the
    ``ln``: log-probs are transcendental and belong in the artifact
    step (JVM/glibc ``ln`` is not correctly rounded), while the single
    IEEE division here IS correctly rounded on both engines, so the
    smoothed probability itself is hash-matchable.

    Scale shape: sentence-start bigrams via one array prepend (no
    self-join); ONE corpus-scale shuffle (the bigram groupBy, partial
    map-side combine); context totals derive from the bigram table
    (vocab²-bounded), never from a second corpus pass; V is a one-row
    broadcast cross join. Pass ``counts=`` (a ``word_bigram_counts``-
    shaped table — e.g. a persisted index extended via
    ``merge_bigram_counts``) to re-derive the model without touching
    corpus text — ``df`` is then unused and may be omitted (passing
    BOTH makes the no-text-touched contract ambiguous at call sites,
    so exactly one of ``df``/``counts`` is required)."""
    if counts is None:
        if df is None:
            raise ValueError("train_bigram_lm needs df or counts")
        # persist: the vocab²-bounded count table feeds the context
        # totals, the vocab count AND the model join — without the pin
        # each consumer re-runs the corpus tokenize + bigram shuffle
        # (the consumers' exchanges are not reuse-identical)
        counts = word_bigram_counts(df, text_col, max_word_len).transform(barrier)
    elif df is not None:
        raise ValueError(
            "train_bigram_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    ctx = counts.groupBy("u").agg(F.sum("n_uw").cast("long").alias("n_u"))
    # V = distinct target words + '<unk>' (targets only: '<s>' is a
    # context, never a prediction — mirrors build_word_lm.py's vocab)
    vocab = counts.select("w").distinct().agg(
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("__V")
    )
    return (
        counts.join(ctx, "u")
        .crossJoin(F.broadcast(vocab))
        .select(
            "u",
            "w",
            "n_uw",
            "n_u",
            F.round(
                (F.col("n_uw") + F.lit(1)).cast("double")
                / (F.col("n_u") + F.col("__V")).cast("double"),
                prob_dp,
            ).alias("p"),
        )
    )


def train_kn_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    keep_ratio: bool = False,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train an interpolated Kneser-Ney word-bigram LM ON-CLUSTER —
    the smoothing the production CCNet filter actually uses (KenLM is
    modified-KN; Kneser & Ney 1995, Chen & Goodman 1998), next to the
    Laplace variant (``train_bigram_lm``):

        P(w|u) = max(n_uw - D, 0)/n_u + D·N1+(u,·)/n_u · N1+(·,w)/N1+(·,·)

    with the Ney discount estimate ``D = n1/(n1 + 2·n2)`` (n1/n2 =
    bigram types seen exactly once/twice; textbook 3/4 fallback when
    the corpus has neither). Exactness: D is kept as the integer
    fraction ``dn/dd``, so the whole probability is ONE integer
    ratio::

        p = (max(n_uw·dd - dn, 0)·Nbb + dn·N1u·Ncw) / (n_u·dd·Nbb)

    — every term a BIGINT (shuffle-order-free), one final IEEE
    division rounded to ``prob_dp``. Summed over the full vocabulary
    (seen targets + continuation mass) each context distributes
    exactly 1 (tested with ``fractions.Fraction``). Overflow note:
    the numerator carries ``n_uw·dd·Nbb``; at extreme corpus scale
    (all three ~1e10) this exceeds BIGINT — shard the model by
    context hash and train per shard, or drop to the double form.

    Scale shape: identical to ``train_bigram_lm`` — ONE corpus-scale
    shuffle (the bigram groupBy, map-side combine); every other input
    (context totals, follower/predecessor type counts, the discount
    and type-total one-row frames) derives from the vocab²-bounded
    bigram-type table, never from a second corpus pass.

    Output: ``(u, w, n_uw, n_u, n1u, ncw, p)``; with
    ``keep_ratio=True`` the exact BIGINT ``p_num`` / ``p_den`` ride
    along (``p = p_num / p_den``) so downstream consumers can take
    transcendental-free Q20 log2 bits via ``intmath.with_ilog2_q20``
    (``p_num >= 1`` always: when the discount zeroes the count term,
    the continuation term is a product of positive counts). Pass
    ``counts=`` (a persisted ``word_bigram_counts`` index extended via
    ``merge_bigram_counts``) to re-derive the model without touching
    corpus text — ``df`` is then unused and may be omitted (exactly
    one of ``df``/``counts`` is required).
    """
    if counts is None:
        if df is None:
            raise ValueError("train_kn_lm needs df or counts")
        # persist: ctx/pred/glob/join all consume the count table —
        # without the pin each re-runs the corpus tokenize + shuffle
        counts = word_bigram_counts(df, text_col, max_word_len).transform(barrier)
    elif df is not None:
        raise ValueError(
            "train_kn_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    ctx = counts.groupBy("u").agg(
        F.sum("n_uw").cast("long").alias("n_u"),
        F.count(F.lit(1)).cast("long").alias("n1u"),
    )
    pred = counts.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")
    )
    glob = counts.agg(
        F.sum(F.when(F.col("n_uw") == 1, 1).otherwise(0))
        .cast("long")
        .alias("__n1"),
        F.sum(F.when(F.col("n_uw") == 2, 1).otherwise(0))
        .cast("long")
        .alias("__n2"),
        F.count(F.lit(1)).cast("long").alias("__nbb"),
    ).select(
        F.when(F.col("__n1") + 2 * F.col("__n2") > 0, F.col("__n1"))
        .otherwise(F.lit(3))
        .cast("long")
        .alias("__dn"),
        F.when(
            F.col("__n1") + 2 * F.col("__n2") > 0,
            F.col("__n1") + 2 * F.col("__n2"),
        )
        .otherwise(F.lit(4))
        .cast("long")
        .alias("__dd"),
        "__nbb",
    )
    num = (
        F.greatest(
            F.col("n_uw") * F.col("__dd") - F.col("__dn"),
            F.lit(0).cast("long"),
        )
        * F.col("__nbb")
        + F.col("__dn") * F.col("n1u") * F.col("ncw")
    ).cast("long")
    den = (F.col("n_u") * F.col("__dd") * F.col("__nbb")).cast("long")
    cols = ["u", "w", "n_uw", "n_u", "n1u", "ncw"]
    ratio = (
        [num.alias("p_num"), den.alias("p_den")] if keep_ratio else []
    )
    return (
        counts.join(ctx, "u")
        .join(pred, "w")
        .crossJoin(F.broadcast(glob))
        .select(
            *cols,
            *ratio,
            F.round(
                num.cast("double") / den.cast("double"), prob_dp
            ).alias("p"),
        )
    )


def train_mkn_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    keep_ratio: bool = False,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train a MODIFIED Kneser-Ney word-bigram LM ON-CLUSTER — the
    exact smoothing class KenLM (the published CCNet scorer) ships,
    closing the last model-class gap past the single-discount
    interpolated variant (``train_kn_lm``; Chen & Goodman 1998 §3,
    Kneser & Ney 1995). Three count-dependent discounts estimated from
    the count-of-count statistics n1..n4 (bigram types seen exactly
    1..4 times), with ``Y = n1/(n1 + 2 n2)``::

        D1  = 1 - 2 Y n2/n1    (applies when n_uw = 1)
        D2  = 2 - 3 Y n3/n2    (applies when n_uw = 2)
        D3+ = 3 - 4 Y n4/n3    (applies when n_uw >= 3)

        P(w|u) = (n_uw - D(n_uw))/n_u + gamma(u) * ncw/Nbb
        gamma(u) = (D1*nu1 + D2*nu2 + D3*nu3p)/n_u

    where nu1/nu2/nu3p count the types in context u seen exactly
    once/twice/three-plus times and ``ncw/Nbb`` is the usual
    continuation distribution. Exactness: each discount is kept as an
    integer fraction over the COMMON denominator
    ``Dd = n2*n3*(n1 + 2 n2)`` — the per-level denominators are
    ``yd`` (D1 = 1 - 2 Y n2/n1 reduces to n1/yd: the n1 cancels),
    ``n2*yd`` and ``n3*yd``, so their lcm-bound needs no n1 factor;
    round 14 shipped the unreduced ``n1*n2*n3*yd``, an n1-times-larger
    denominator that hit the integer boundary correspondingly earlier
    — and clamped into its textbook range ``[0, level]`` (``D1 in
    [0,1]``, ``D2 in [0,2]``, ``D3+ in [0,3]`` — KenLM asserts the
    same bounds; the clamp also makes the count term ``n_uw*Dd -
    d(n_uw)`` non-negative without a max(), since ``n_uw >= level``
    on each branch). The whole probability is then ONE integer
    ratio::

        p = ((n_uw*Dd - d(n_uw))*Nbb
             + (d1*nu1 + d2*nu2 + d3*nu3p)*ncw) / (n_u*Dd*Nbb)

    with ``d1 = n1*n2*n3``, ``d2 = (2 n2 yd - 3 n1 n3)*n3``,
    ``d3 = (3 n3 yd - 4 n1 n4)*n2`` — every term carried as
    DECIMAL(38,0) (exact integers to 1e38, shuffle-order-free; the
    round-14 BIGINT form wrapped SILENTLY past 2^63, well below the
    docstring's stated boundary), one final IEEE division rounded to
    ``prob_dp``. Summed over the full vocabulary each context
    distributes exactly 1 (tested with ``fractions.Fraction``; the
    boundary test drives n1..n4 = 4e5 — where the old form wraps —
    and matches the exact Fraction). Degenerate corpora where the
    count-of-count chain breaks (any of n1/n2/n3 = 0, so a discount
    denominator vanishes) fall back to the single-discount
    interpolated-KN estimate ``d1 = d2 = d3 = D`` with
    ``D = n1/(n1+2 n2)`` (textbook 3/4 when even that is undefined) —
    the same fallback ``train_kn_lm`` uses. Overflow note: past
    DECIMAL(38,0) (num ~ n_uw*Dd*Nbb; with n1..n3 ~ 1e9 type counts
    that is ~1e37, approaching the edge) Spark yields NULL, not a
    wrapped value — loud in any gate; shard the model by context hash
    and train per shard if a corpus ever reaches it.

    Scale shape: identical to ``train_kn_lm`` — ONE corpus-scale
    shuffle (the bigram groupBy, map-side combine); context
    count-of-count buckets, continuation counts, and the one-row
    discount frame all derive from the vocab²-bounded bigram-type
    table, never from a second corpus pass.

    Output: ``(u, w, n_uw, n_u, nu1, nu2, nu3p, ncw, p)``; with
    ``keep_ratio=True`` the exact DECIMAL(38,0) ``p_num``/``p_den``
    ride along (``p_num >= 1`` always: the continuation term is a
    product of positive counts). Pass ``counts=`` (a persisted
    ``word_bigram_counts`` index extended via ``merge_bigram_counts``)
    to re-derive the model without touching corpus text — exactly one
    of ``df``/``counts`` is required.
    """
    if counts is None:
        if df is None:
            raise ValueError("train_mkn_lm needs df or counts")
        # persist: ctx/pred/raw/join all consume the count table —
        # without the pin each re-runs the corpus tokenize + shuffle
        counts = word_bigram_counts(df, text_col, max_word_len).transform(barrier)
    elif df is not None:
        raise ValueError(
            "train_mkn_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    ctx = counts.groupBy("u").agg(
        F.sum("n_uw").cast("long").alias("n_u"),
        F.sum(F.when(F.col("n_uw") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nu1"),
        F.sum(F.when(F.col("n_uw") == 2, 1).otherwise(0))
        .cast("long")
        .alias("nu2"),
        F.sum(F.when(F.col("n_uw") >= 3, 1).otherwise(0))
        .cast("long")
        .alias("nu3p"),
    )
    pred = counts.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")
    )
    raw = counts.agg(
        *[
            F.sum(F.when(F.col("n_uw") == k, 1).otherwise(0))
            .cast("long")
            .alias(f"__n{k}")
            for k in (1, 2, 3, 4)
        ],
        F.count(F.lit(1)).cast("long").alias("__nbb"),
    )
    healthy = (
        (F.col("__n1") > 0) & (F.col("__n2") > 0) & (F.col("__n3") > 0)
    )
    DEC = "decimal(38,0)"
    # glob-frame arithmetic in DECIMAL(38,0) from the first product:
    # (3 n3 yd)*n2 alone wraps BIGINT near n1..n3 ~ 1e6 type counts
    n1d, n2d, n3d, n4d = (
        F.col(f"__n{k}").cast(DEC) for k in (1, 2, 3, 4)
    )
    yd = n1d + F.lit(2).cast(DEC) * n2d
    # common denominator and per-level numerators, clamped to [0, level]
    big_dd = n2d * n3d * yd

    def _clamp(expr, level):
        return F.least(
            F.greatest(expr, F.lit(0).cast(DEC)),
            F.lit(level).cast(DEC) * big_dd,
        )

    d1_raw = n1d * n2d * n3d
    d2_raw = (F.lit(2).cast(DEC) * n2d * yd - F.lit(3).cast(DEC) * n1d * n3d) * n3d
    d3_raw = (F.lit(3).cast(DEC) * n3d * yd - F.lit(4).cast(DEC) * n1d * n4d) * n2d
    # single-discount interpolated-KN fallback (train_kn_lm's estimate)
    fb_dn = F.when(yd > 0, n1d).otherwise(F.lit(3).cast(DEC))
    fb_dd = F.when(yd > 0, yd).otherwise(F.lit(4).cast(DEC))
    glob = raw.select(
        F.when(healthy, _clamp(d1_raw, 1)).otherwise(fb_dn)
        .cast(DEC)
        .alias("__d1"),
        F.when(healthy, _clamp(d2_raw, 2)).otherwise(fb_dn)
        .cast(DEC)
        .alias("__d2"),
        F.when(healthy, _clamp(d3_raw, 3)).otherwise(fb_dn)
        .cast(DEC)
        .alias("__d3"),
        F.when(healthy, big_dd).otherwise(fb_dd).cast(DEC).alias("__DD"),
        F.col("__nbb").cast(DEC).alias("__nbb"),
    )
    disc = (
        F.when(F.col("n_uw") == 1, F.col("__d1"))
        .when(F.col("n_uw") == 2, F.col("__d2"))
        .otherwise(F.col("__d3"))
    )
    num = (
        F.greatest(
            F.col("n_uw").cast(DEC) * F.col("__DD") - disc,
            F.lit(0).cast(DEC),
        )
        * F.col("__nbb")
        + (
            F.col("__d1") * F.col("nu1").cast(DEC)
            + F.col("__d2") * F.col("nu2").cast(DEC)
            + F.col("__d3") * F.col("nu3p").cast(DEC)
        )
        * F.col("ncw").cast(DEC)
    ).cast(DEC)
    den = (
        F.col("n_u").cast(DEC) * F.col("__DD") * F.col("__nbb")
    ).cast(DEC)
    cols = ["u", "w", "n_uw", "n_u", "nu1", "nu2", "nu3p", "ncw"]
    ratio = (
        [num.alias("p_num"), den.alias("p_den")] if keep_ratio else []
    )
    return (
        counts.join(ctx, "u")
        .join(pred, "w")
        .crossJoin(F.broadcast(glob))
        .select(
            *cols,
            *ratio,
            F.round(
                num.cast("double") / den.cast("double"), prob_dp
            ).alias("p"),
        )
    )


def word_trigram_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """``(u, v, w, n_uvw)`` word-trigram type counts with a DOUBLE
    sentence-start prepend (``<s> <s> w1 ...`` — the first real word
    gets the well-defined context ``(<s>, <s>)``) — the order-3 count
    stage of ``train_kn3_lm`` and a persistable LM-count index under
    the same add-mergeable contract as ``word_bigram_counts``:
    ``merge_trigram_counts`` of per-slice counts == counts over the
    union, so a nightly ingest extends the persisted table from the
    new batch alone and the model re-derives from the type-bounded
    counts — history text is never re-tokenized.

    Scale: one corpus-scale shuffle (the trigram groupBy, map-side
    combine); the slide is two array slices zipped in-plan, no
    self-join, no Python."""
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.concat(F.array(F.lit("<s>"), F.lit("<s>")), wlist).alias("ws")
    )
    arr = F.col("ws")
    n = F.size(arr)
    # zip the three 1-shifted views; slice length n-2 >= 0 always (the
    # two-token prepend guarantees n >= 2, and an empty word list
    # yields zero trigrams through the empty slices)
    uv = F.zip_with(
        F.slice(arr, 1, n - 2),
        F.slice(arr, 2, n - 2),
        lambda a, b: F.struct(a.alias("u"), b.alias("v")),
    )
    tri = toks.select(
        F.explode(
            F.zip_with(
                uv,
                F.slice(arr, 3, n - 2),
                lambda x, c: F.struct(
                    x["u"].alias("u"), x["v"].alias("v"), c.alias("w")
                ),
            )
        ).alias("tg")
    )
    return tri.groupBy(
        F.col("tg.u").alias("u"),
        F.col("tg.v").alias("v"),
        F.col("tg.w").alias("w"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_uvw"))


def merge_trigram_counts(*parts: DataFrame) -> DataFrame:
    """Merge per-slice ``word_trigram_counts`` tables (union + keyed
    sum) — one shuffle over count rows, never over text."""
    if not parts:
        raise ValueError("merge_trigram_counts needs at least one part")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("u", "v", "w").agg(
        F.sum("n_uvw").cast("long").alias("n_uvw")
    )


def train_kn3_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    keep_ratio: bool = False,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train an interpolated Kneser-Ney word-TRIGRAM LM ON-CLUSTER —
    one order up from ``train_kn_lm`` toward KenLM's order-5 CCNet
    scorer (Kneser & Ney 1995; Chen & Goodman 1998 §3: highest order
    uses raw counts, every lower order uses CONTINUATION type counts),
    with the full backoff chain derived from the ONE trigram type
    table::

        P3(w|u,v) = max(c3(uvw) - D3, 0)/c3(uv.)
                    + D3 * N1+(uv.)/c3(uv.) * P2(w|v)
        P2(w|v)   = max(c2'(vw) - D2, 0)/c2'(v.)
                    + D2 * N1+(v.)/c2'(v.) * P1(w)
        P1(w)     = N1+(.w) / N1+(..)

    where ``c2'(vw) = N1+(.vw)`` (distinct LEFT-extensions of the
    bigram — counted by grouping trigram TYPES on (v, w), never by a
    second corpus pass) and each order's Ney discount comes from that
    order's count-of-counts: ``D3 = t1/(t1 + 2 t2)`` over raw trigram
    counts, ``D2 = m1/(m1 + 2 m2)`` over the continuation-bigram
    counts (textbook 3/4 fallback when a level's statistic is
    degenerate — the ``train_kn_lm`` convention). Exactness: both
    discounts ride as integer fractions, so the whole probability is
    ONE integer ratio::

        p = (max(c3*e3d - e3n, 0) * (c2v * e2d * Nbb)
             + e3n * N1uv * (max(c2vw*e2d - e2n, 0) * Nbb
                             + e2n * N1v * ncw))
            / (c3(uv.) * e3d * c2v * e2d * Nbb)

    carried as DECIMAL(38,0) (exact to 1e38; Spark yields NULL past
    it, never a wrapped value), one final IEEE division rounded to
    ``prob_dp``. Summed over the full vocabulary each (u, v) context
    distributes exactly 1 — P2 itself sums to 1 because the
    continuation-unigram masses ``ncw`` total ``Nbb`` (tested with
    ``fractions.Fraction``). Overflow note: the denominator multiplies
    five type-count statistics; at extreme web scale (every factor
    ~1e8) it exceeds 1e38 — shard the model by (u, v) context hash
    and train per shard, as with the bigram trainers.

    Scale shape: ONE corpus-scale shuffle (the trigram groupBy,
    map-side combine); the context totals, continuation tables,
    count-of-count frames and the one-row discount frame all derive
    from the type-bounded trigram table, never from a second corpus
    pass. The model join fans the type table through four keyed joins
    plus a one-row broadcast — type-table-sized shuffles, not corpus.

    Output: ``(u, v, w, n_uvw, n_uv, n1uv, c2_vw, c2_v, n1v, ncw,
    p)``; with ``keep_ratio=True`` the exact DECIMAL(38,0)
    ``p_num``/``p_den`` ride along (``p_num >= 1`` always). Pass
    ``counts=`` (a persisted ``word_trigram_counts`` index extended
    via ``merge_trigram_counts``) to re-derive the model without
    touching corpus text — exactly one of ``df``/``counts`` is
    required."""
    if counts is None:
        if df is None:
            raise ValueError("train_kn3_lm needs df or counts")
        # persist: ctx3/c2/g3/join all consume the count table —
        # without the pin each re-runs the corpus tokenize + shuffle
        counts = word_trigram_counts(df, text_col, max_word_len).transform(barrier)
    elif df is not None:
        raise ValueError(
            "train_kn3_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    ctx3 = counts.groupBy("u", "v").agg(
        F.sum("n_uvw").cast("long").alias("n_uv"),
        F.count(F.lit(1)).cast("long").alias("n1uv"),
    )
    # continuation-bigram table: c2'(vw) = distinct left-extensions,
    # i.e. one row per (v, w) with the trigram-type count. Persisted:
    # ctx2/pred/g2/gbb/join all consume it — one type-table shuffle,
    # reused five times.
    c2 = counts.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c2_vw")
    ).transform(barrier)
    ctx2 = c2.groupBy("v").agg(
        F.sum("c2_vw").cast("long").alias("c2_v"),
        F.count(F.lit(1)).cast("long").alias("n1v"),
    )
    pred = c2.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")
    )
    DEC = "decimal(38,0)"

    def _ney(frame: DataFrame, cnt: str, n_alias: str, d_alias: str):
        """One-row (numerator, denominator) Ney discount from a count
        column's count-of-counts, 3/4 fallback on degenerate stats."""
        one = F.sum(F.when(F.col(cnt) == 1, 1).otherwise(0)).cast("long")
        two = F.sum(F.when(F.col(cnt) == 2, 1).otherwise(0)).cast("long")
        agg = frame.agg(one.alias("__o"), two.alias("__t"))
        yd = F.col("__o") + 2 * F.col("__t")
        return agg.select(
            F.when(yd > 0, F.col("__o")).otherwise(F.lit(3))
            .cast(DEC)
            .alias(n_alias),
            F.when(yd > 0, yd).otherwise(F.lit(4)).cast(DEC).alias(d_alias),
        )
    g3 = _ney(counts, "n_uvw", "__e3n", "__e3d")
    g2 = _ney(c2, "c2_vw", "__e2n", "__e2d")
    gbb = c2.agg(F.count(F.lit(1)).cast(DEC).alias("__nbb"))
    glob = g3.crossJoin(g2).crossJoin(gbb)
    p2num = (
        F.greatest(
            F.col("c2_vw").cast(DEC) * F.col("__e2d") - F.col("__e2n"),
            F.lit(0).cast(DEC),
        )
        * F.col("__nbb")
        + F.col("__e2n") * F.col("n1v").cast(DEC) * F.col("ncw").cast(DEC)
    )
    p2den = F.col("c2_v").cast(DEC) * F.col("__e2d") * F.col("__nbb")
    num = (
        F.greatest(
            F.col("n_uvw").cast(DEC) * F.col("__e3d") - F.col("__e3n"),
            F.lit(0).cast(DEC),
        )
        * p2den
        + F.col("__e3n") * F.col("n1uv").cast(DEC) * p2num
    ).cast(DEC)
    den = (F.col("n_uv").cast(DEC) * F.col("__e3d") * p2den).cast(DEC)
    cols = [
        "u", "v", "w", "n_uvw", "n_uv", "n1uv", "c2_vw", "c2_v",
        "n1v", "ncw",
    ]
    ratio = (
        [num.alias("p_num"), den.alias("p_den")] if keep_ratio else []
    )
    return (
        counts.join(ctx3, ["u", "v"])
        .join(c2, ["v", "w"])
        .join(ctx2, "v")
        .join(pred, "w")
        .crossJoin(F.broadcast(glob))
        .select(
            *cols,
            *ratio,
            F.round(
                num.cast("double") / den.cast("double"), prob_dp
            ).alias("p"),
        )
    )


_MKN_DEC = "decimal(38,0)"


def _mkn_bucket(cnt: str, k: int):
    """Aggregate: count of rows whose ``cnt`` equals ``k`` (or >= 3
    for k=3) — the per-context type buckets the modified-KN gamma
    weighs by its three discounts."""
    cond = F.col(cnt) == k if k < 3 else F.col(cnt) >= 3
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def mkn_discount_glob(frame: DataFrame, cnt: str, p: str) -> DataFrame:
    """One-row (d1, d2, d3, DD) modified-KN discount frame from a
    count column's count-of-counts — the ``train_mkn_lm`` glob with
    the reduced denominator (Chen & Goodman 1998 §3; the n1 factor
    cancels out of D1), name-prefixed ``__{p}1..__{p}3, __{p}D`` so
    several orders' levels coexist in one broadcast. Shared by
    ``train_mkn3_lm`` (prefixes t/e) and ``train_mkn4_lm``
    (a/b/e)."""
    DEC = _MKN_DEC
    raw = frame.agg(
        *[
            F.sum(F.when(F.col(cnt) == k, 1).otherwise(0))
            .cast("long")
            .alias(f"__c{k}")
            for k in (1, 2, 3, 4)
        ]
    )
    healthy = (
        (F.col("__c1") > 0)
        & (F.col("__c2") > 0)
        & (F.col("__c3") > 0)
    )
    c1, c2_, c3, c4 = (
        F.col(f"__c{k}").cast(DEC) for k in (1, 2, 3, 4)
    )
    yd = c1 + F.lit(2).cast(DEC) * c2_
    big = c2_ * c3 * yd

    def _clamp(expr, level):
        return F.least(
            F.greatest(expr, F.lit(0).cast(DEC)),
            F.lit(level).cast(DEC) * big,
        )

    d1r = c1 * c2_ * c3
    d2r = (F.lit(2).cast(DEC) * c2_ * yd
           - F.lit(3).cast(DEC) * c1 * c3) * c3
    d3r = (F.lit(3).cast(DEC) * c3 * yd
           - F.lit(4).cast(DEC) * c1 * c4) * c2_
    fb_dn = F.when(yd > 0, c1).otherwise(F.lit(3).cast(DEC))
    fb_dd = F.when(yd > 0, yd).otherwise(F.lit(4).cast(DEC))
    return raw.select(
        F.when(healthy, _clamp(d1r, 1)).otherwise(fb_dn)
        .cast(DEC)
        .alias(f"__{p}1"),
        F.when(healthy, _clamp(d2r, 2)).otherwise(fb_dn)
        .cast(DEC)
        .alias(f"__{p}2"),
        F.when(healthy, _clamp(d3r, 3)).otherwise(fb_dn)
        .cast(DEC)
        .alias(f"__{p}3"),
        F.when(healthy, big).otherwise(fb_dd)
        .cast(DEC)
        .alias(f"__{p}D"),
    )


def train_mkn3_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    keep_ratio: bool = False,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train a MODIFIED Kneser-Ney word-TRIGRAM LM ON-CLUSTER — the
    round-14 mKN estimator (KenLM's smoothing class: three
    count-dependent discounts per order, Chen & Goodman 1998 §3)
    applied to the round-15 order-3 backoff chain, i.e. exactly what
    KenLM computes at order 3. Each ORDER estimates its own D1/D2/D3+
    from its own count-of-counts — the trigram level from raw-count
    statistics t1..t4, the continuation-bigram level from the
    c2'(vw)-count statistics m1..m4 — with the reduced common
    denominators (``DD3 = t2*t3*(t1+2 t2)``, ``DD2 = m2*m3*(m1+2 m2)``
    — the n1 factor cancels out of each D1 as in ``train_mkn_lm``)::

        P3(w|u,v) = (n_uvw - D(n_uvw))/n_uv + gamma3(u,v) * P2(w|v)
        gamma3    = (D1*nu1uv + D2*nu2uv + D3*nu3puv)/n_uv
        P2(w|v)   = (c2'(vw) - E(c2'(vw)))/c2'(v.) + gamma2(v) * ncw/Nbb
        gamma2    = (E1*mv1 + E2*mv2 + E3*mv3p)/c2'(v.)

    where nu1uv/nu2uv/nu3puv bucket the types in context (u, v) by
    raw count 1/2/3+ and mv1/mv2/mv3p bucket v's continuation row by
    c2' count. All discounts are clamped integer fractions
    (``[0, level]`` — the clamp keeps every count term non-negative
    since the applicable count >= level on each branch); degenerate
    count-of-count chains fall back per order to the single-discount
    estimate (``train_kn_lm``'s convention). The whole probability is
    ONE exact integer ratio carried as DECIMAL(38,0) (HUGEINT on the
    DuckDB oracle; NULL/error past 1e38, never a silent wrap), one
    final IEEE division rounded to ``prob_dp``. Summed over the full
    vocabulary each (u, v) context distributes exactly 1 (tested with
    ``fractions.Fraction``).

    Scale shape: identical to ``train_kn3_lm`` — ONE corpus-scale
    shuffle (the trigram groupBy); every other input derives from the
    type-bounded trigram table. Output: ``(u, v, w, n_uvw, n_uv,
    nu1uv, nu2uv, nu3puv, c2_vw, c2_v, mv1, mv2, mv3p, ncw, p)``;
    ``keep_ratio=True`` adds the exact ``p_num``/``p_den``. Pass
    ``counts=`` (a persisted ``word_trigram_counts`` index extended
    via ``merge_trigram_counts``) to re-derive the model without
    touching corpus text — exactly one of ``df``/``counts`` is
    required."""
    if counts is None:
        if df is None:
            raise ValueError("train_mkn3_lm needs df or counts")
        # persist: ctx3/c2/g3/join all consume the count table —
        # without the pin each re-runs the corpus tokenize + shuffle
        counts = word_trigram_counts(df, text_col, max_word_len).transform(barrier)
    elif df is not None:
        raise ValueError(
            "train_mkn3_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    ctx3 = counts.groupBy("u", "v").agg(
        F.sum("n_uvw").cast("long").alias("n_uv"),
        _mkn_bucket("n_uvw", 1).alias("nu1uv"),
        _mkn_bucket("n_uvw", 2).alias("nu2uv"),
        _mkn_bucket("n_uvw", 3).alias("nu3puv"),
    )
    # persisted: ctx2/pred/g2/gbb/join all consume the continuation
    # table — one type-table shuffle, reused five times
    c2 = counts.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c2_vw")
    ).transform(barrier)
    ctx2 = c2.groupBy("v").agg(
        F.sum("c2_vw").cast("long").alias("c2_v"),
        _mkn_bucket("c2_vw", 1).alias("mv1"),
        _mkn_bucket("c2_vw", 2).alias("mv2"),
        _mkn_bucket("c2_vw", 3).alias("mv3p"),
    )
    pred = c2.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")
    )

    DEC = _MKN_DEC
    g3 = mkn_discount_glob(counts, "n_uvw", "t")
    g2 = mkn_discount_glob(c2, "c2_vw", "e")
    gbb = c2.agg(F.count(F.lit(1)).cast(DEC).alias("__nbb"))
    glob = g3.crossJoin(g2).crossJoin(gbb)
    disc3 = (
        F.when(F.col("n_uvw") == 1, F.col("__t1"))
        .when(F.col("n_uvw") == 2, F.col("__t2"))
        .otherwise(F.col("__t3"))
    )
    disc2 = (
        F.when(F.col("c2_vw") == 1, F.col("__e1"))
        .when(F.col("c2_vw") == 2, F.col("__e2"))
        .otherwise(F.col("__e3"))
    )
    gamma2 = (
        F.col("__e1") * F.col("mv1").cast(DEC)
        + F.col("__e2") * F.col("mv2").cast(DEC)
        + F.col("__e3") * F.col("mv3p").cast(DEC)
    )
    gamma3 = (
        F.col("__t1") * F.col("nu1uv").cast(DEC)
        + F.col("__t2") * F.col("nu2uv").cast(DEC)
        + F.col("__t3") * F.col("nu3puv").cast(DEC)
    )
    p2num = (
        F.greatest(
            F.col("c2_vw").cast(DEC) * F.col("__eD") - disc2,
            F.lit(0).cast(DEC),
        )
        * F.col("__nbb")
        + gamma2 * F.col("ncw").cast(DEC)
    )
    p2den = F.col("c2_v").cast(DEC) * F.col("__eD") * F.col("__nbb")
    num = (
        F.greatest(
            F.col("n_uvw").cast(DEC) * F.col("__tD") - disc3,
            F.lit(0).cast(DEC),
        )
        * p2den
        + gamma3 * p2num
    ).cast(DEC)
    den = (F.col("n_uv").cast(DEC) * F.col("__tD") * p2den).cast(DEC)
    cols = [
        "u", "v", "w", "n_uvw", "n_uv", "nu1uv", "nu2uv", "nu3puv",
        "c2_vw", "c2_v", "mv1", "mv2", "mv3p", "ncw",
    ]
    ratio = (
        [num.alias("p_num"), den.alias("p_den")] if keep_ratio else []
    )
    return (
        counts.join(ctx3, ["u", "v"])
        .join(c2, ["v", "w"])
        .join(ctx2, "v")
        .join(pred, "w")
        .crossJoin(F.broadcast(glob))
        .select(
            *cols,
            *ratio,
            F.round(
                num.cast("double") / den.cast("double"), prob_dp
            ).alias("p"),
        )
    )


def kn3_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """Train-then-score under the ORDER-3 interpolated Kneser-Ney LM —
    ``kn_doc_scores`` one order up: fit ``train_kn3_lm`` on the
    corpus, then score every document's trigram stream under the model
    the plan just learned, with NO committed artifact and NO
    transcendentals. Each trigram's cost is ``ilog2_q20(p_den) -
    ilog2_q20(p_num)`` (exact Q20 negative log2 of the integer ratio,
    ``intmath.with_ilog2_q20`` JVM-side), so the per-document sum is a
    BIGINT: shuffle-order-free and hash-exact cross-engine. A longer
    context sharpens the fluency signal the curriculum/perplexity
    gates consume — the published CCNet scorer is order-5 KenLM; this
    is the same family two orders closer.

    Exactness boundary: the trainer carries ``p_num``/``p_den`` as
    DECIMAL(38,0); the Q20 log2 stage is 64-bit integer arithmetic,
    so both are cast to BIGINT here — exact while the model
    denominator ``n_uv*e3d*c2_v*e2d*Nbb`` stays below 2^63 (holds
    far past test scale; at web-corpus type counts shard the model by
    (u, v) context hash as with training, which bounds every factor).
    The cast is ``try_cast``, which yields NULL on overflow (never a
    wrapped value) REGARDLESS of ``spark.sql.ansi.enabled`` — a plain
    cast would throw under ANSI and silently depend on session config
    otherwise — so a breach is loud in any gate.

    Scale: the trainer's one trigram shuffle, the ilog2 chain as pure
    codegen over the type-bounded model, one corpus-scale shuffle
    joining the per-doc trigram stream to the model on (u, v, w)
    (broadcastable when the model is small), one doc-keyed agg.
    Scoring the training corpus itself means every trigram is
    in-model (no OOV branch); a deployment scoring NEW text backs off
    through the same integer-ratio shapes.

    Output: ``(id_col, n_trigrams, nll_q20, bits_per_trigram_q20)``
    — total and truncated-mean negative log2-likelihood in Q20
    micro-bits.
    """
    from traits_data_spark.functions.intmath import with_ilog2_q20

    model = train_kn3_lm(
        df, text_col=text_col, max_word_len=max_word_len,
        keep_ratio=True,
    ).select(
        "u",
        "v",
        "w",
        F.col("p_num").try_cast("long").alias("p_num"),
        F.col("p_den").try_cast("long").alias("p_den"),
    )
    model = with_ilog2_q20(model, "p_num", "__iln")
    model = with_ilog2_q20(model, "p_den", "__ild")
    bits = model.select(
        "u", "v", "w",
        (F.col("__ild") - F.col("__iln")).alias("__bits_q20"),
    )
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col,
        F.concat(F.array(F.lit("<s>"), F.lit("<s>")), wlist).alias("ws"),
    )
    arr = F.col("ws")
    n = F.size(arr)
    uv = F.zip_with(
        F.slice(arr, 1, n - 2),
        F.slice(arr, 2, n - 2),
        lambda a, b: F.struct(a.alias("u"), b.alias("v")),
    )
    tri = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                uv,
                F.slice(arr, 3, n - 2),
                lambda x, c: F.struct(
                    x["u"].alias("u"), x["v"].alias("v"), c.alias("w")
                ),
            )
        ).alias("tg"),
    ).select(
        id_col,
        F.col("tg.u").alias("u"),
        F.col("tg.v").alias("v"),
        F.col("tg.w").alias("w"),
    )
    return (
        tri.join(bits, ["u", "v", "w"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum("__bits_q20").cast("long").alias("nll_q20"),
        )
        .withColumn(
            "bits_per_trigram_q20",
            # integer division (values are non-negative, so trunc ==
            # floor on both engines; no double round-trip)
            F.expr("nll_q20 DIV n_trigrams").cast("long"),
        )
    )


def kn_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """Train-then-score under the interpolated Kneser-Ney bigram LM —
    the ``bpe_train_tokens`` / ``dsir_train_select`` discipline applied
    to the CCNet-style perplexity gate: fit ``train_kn_lm`` on the
    corpus, then score every document under the model the plan just
    learned, with NO committed artifact and NO transcendentals. Each
    bigram's cost is ``ilog2_q20(p_den) - ilog2_q20(p_num)`` (exact
    Q20 negative log2-probability of the integer ratio ``p_num/p_den``
    — ``intmath.with_ilog2_q20`` JVM-side), so the per-document sum is
    a BIGINT: shuffle-order-free and hash-exact cross-engine.

    Scoring the training corpus itself means every bigram is in-model
    (no OOV branch); a deployment scoring NEW text backs off unseen
    bigrams to the continuation term, which is the same integer-ratio
    shape. Scale: the trainer's one bigram shuffle, the ilog2 chain as
    pure codegen over the vocab²-bounded model, one more corpus-scale
    shuffle joining the per-doc bigram stream to the model on (u, w)
    (broadcastable when the model is small), one doc-keyed agg.

    Output: ``(id_col, n_bigrams, nll_q20, bits_per_bigram_q20)`` —
    total and truncated-mean negative log2-likelihood in Q20 micro-bits
    (the decile-bucketing / gating step is ``lm_perplexity_sampled``'s
    job downstream).
    """
    from traits_data_spark.functions.intmath import with_ilog2_q20

    model = train_kn_lm(
        df, text_col=text_col, max_word_len=max_word_len,
        keep_ratio=True,
    )
    model = with_ilog2_q20(model, "p_num", "__iln")
    model = with_ilog2_q20(model, "p_den", "__ild")
    bits = model.select(
        "u", "w", (F.col("__ild") - F.col("__iln")).alias("__bits_q20")
    )
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col, F.concat(F.array(F.lit("<s>")), wlist).alias("ws")
    )
    arr = F.col("ws")
    n = F.size(arr)
    big = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(arr, 1, n - 1),
                F.slice(arr, 2, n - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("w")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.u").alias("u"), F.col("bg.w").alias("w"))
    return (
        big.join(bits, ["u", "w"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__bits_q20").cast("long").alias("nll_q20"),
        )
        .withColumn(
            "bits_per_bigram_q20",
            # integer division (values are non-negative, so trunc ==
            # floor on both engines; no double round-trip)
            F.expr("nll_q20 DIV n_bigrams").cast("long"),
        )
    )


# --- on-cluster unigram-LM (SentencePiece) training --------------------

UNIGRAM_TRAIN_MAX_PIECE_LEN = 4
UNIGRAM_TRAIN_MAX_WORD_LEN = 16
UNIGRAM_TRAIN_EM_ITERS = 2
UNIGRAM_TRAIN_VOCAB_SIZE = 150
UNIGRAM_TRAIN_SEED_CAP = 4096
# 2^-40 in Q20 micro-bits. In TRAINING this never fires (every corpus
# char is a seeded single); it exists for the apply path's totality on
# unseen text.
UNIGRAM_TRAIN_UNK_Q20 = -(40 << 20)


def unigram_train_viterbi_py(
    word: str,
    scores: Mapping[str, int],
    max_piece_len: int = UNIGRAM_TRAIN_MAX_PIECE_LEN,
) -> tuple[int, int, list[str]]:
    """Viterbi segmentation WITH backtrace for the unigram trainer's
    E-step: maximize ``(Σ score_q20, -n_pieces, last_piece_len)``
    lexicographically. The third key makes the CHOSEN PIECES (not just
    the optimum value) deterministic when two segmentations tie on
    score and count — the trainer counts pieces, so both engines must
    pick the same ones (the DuckDB oracle's ``list_sort(...)[-1]``
    realizes the identical order). Returns
    ``(n_tokens, total_score_q20, pieces)``. Unknown single chars take
    ``UNIGRAM_TRAIN_UNK_Q20``."""
    L = len(word)
    # dp[i] = best (score, -count, piece_len) for word[:i]
    dp: list[tuple[int, int, int]] = [(0, 0, 0)] + [None] * L  # type: ignore[list-item]
    for i in range(1, L + 1):
        best = None
        for l in range(1, min(max_piece_len, i) + 1):
            s = scores.get(word[i - l : i])
            if s is None:
                if l != 1:
                    continue
                s = UNIGRAM_TRAIN_UNK_Q20
            prev = dp[i - l]
            cand = (prev[0] + s, prev[1] - 1, l)
            if best is None or cand > best:
                best = cand
        dp[i] = best  # type: ignore[assignment]
    pieces: list[str] = []
    pos = L
    while pos > 0:
        l = dp[pos][2]
        pieces.append(word[pos - l : pos])
        pos -= l
    pieces.reverse()
    return -dp[L][1], dp[L][0], pieces


def _unigram_seed_counts(
    wc: DataFrame, max_piece_len: int, seed_cap: int
) -> DataFrame:
    """Substring-seeded piece counts from the distinct-word table:
    every substring of length ``1..max_piece_len`` of every word,
    occurrence-weighted — the standard unigram-LM candidate inventory
    (Kudo 2018 seeds from frequent substrings the same way). Single
    chars are ALWAYS kept (coverage); multi-char pieces are capped at
    the top ``seed_cap`` by ``(count DESC, piece ASC)`` so the driver
    collect that follows is bounded by the CAP, not by the corpus'
    substring diversity (the 100-TB guard: a CJK-heavy corpus has
    billions of distinct 4-grams; its top few thousand is a model
    artifact). The global rank window runs on the already-aggregated
    piece table — vocab-scale, one task, microseconds."""
    pieces = (
        wc.select(
            "c", "w", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i")
        )
        .select(
            "c",
            "w",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.col("i"))
                )
            ).alias("l"),
        )
        .select(
            F.col("w").substr(
                F.col("i") - F.col("l") + 1, F.col("l")
            ).alias("piece"),
            "c",
        )
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    singles = pieces.filter(F.length("piece") == 1)
    rk = Window.orderBy(F.col("c").desc(), F.col("piece").asc())
    multis = (
        pieces.filter(F.length("piece") > 1)
        .withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") <= int(seed_cap))
        .drop("__rk")
    )
    return singles.unionByName(multis)


def _unigram_train_loop(
    df: DataFrame,
    text_col: str,
    max_word_len: int,
    max_piece_len: int,
    em_iters: int,
    vocab_size: int,
    seed_cap: int,
) -> tuple[dict[str, int], list[tuple[str, int, int]]]:
    """Shared unigram-LM EM loop. Returns ``(scores, rows)`` where
    ``scores`` maps each kept piece to its final Q20 log2-prob and
    ``rows`` is the pruned ``(piece, em_count, logp2_q20)`` table.

    Execution shape (the one that scales): the corpus is touched ONCE
    (the distinct-word count shuffle — the same Zipf collapse every
    tokenizer op here rides, persisted across iterations); the seed
    pass and every E-step then run on vocab-scale frames. Per
    iteration: one driver collect of the ≤(seed_cap + alphabet)-row
    count table (a bounded model artifact, the same contract as
    ``_bpe_train_loop``'s per-merge collect), a driver-side
    count→score conversion via the transcendental-free
    ``ilog2_q20`` (``functions.intmath`` — NO libm anywhere, so the
    scores are engine-exact integers), one broadcast, one Arrow-batched
    Viterbi over the distinct words, and one vocab-scale re-count
    shuffle."""
    from traits_data_spark.functions.intmath import logp2_q20

    wc = _bpe_train_words(df, text_col, max_word_len).transform(barrier)
    seed = _unigram_seed_counts(wc, max_piece_len, seed_cap)
    counts = {r["piece"]: int(r["c"]) for r in seed.collect()}
    if not counts:
        return {}, []
    singles = sorted(p for p in counts if len(p) == 1)
    spark = df.sparkSession

    for _ in range(em_iters):
        total = sum(counts.values())
        scores = {p: logp2_q20(c, total) for p, c in counts.items()}
        bc = spark.sparkContext.broadcast(scores)

        @F.pandas_udf("array<string>")
        def _pieces(words: pd.Series) -> pd.Series:
            t = bc.value
            return words.map(
                lambda w: unigram_train_viterbi_py(w, t, max_piece_len)[2]
            )

        new = (
            wc.select(F.explode(_pieces(F.col("w"))).alias("piece"), "c")
            .groupBy("piece")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        counts = {r["piece"]: int(r["c"]) for r in new.collect()}
        for p in singles:
            counts.setdefault(p, 1)  # coverage floor

    # prune: singles always kept; multis by (count DESC, piece ASC)
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    kept = {p: counts[p] for p in singles}
    for p, c in multis[: max(0, vocab_size - len(kept))]:
        kept[p] = c
    total = sum(kept.values())
    rows = [
        (p, c, logp2_q20(c, total)) for p, c in sorted(kept.items())
    ]
    return {p: lp for p, _, lp in rows}, rows


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = UNIGRAM_TRAIN_MAX_WORD_LEN,
    max_piece_len: int = UNIGRAM_TRAIN_MAX_PIECE_LEN,
    em_iters: int = UNIGRAM_TRAIN_EM_ITERS,
    vocab_size: int = UNIGRAM_TRAIN_VOCAB_SIZE,
    seed_cap: int = UNIGRAM_TRAIN_SEED_CAP,
) -> DataFrame:
    """Train a SentencePiece-style unigram LM tokenizer ON-CLUSTER
    (Kudo, ACL'18) — the third and last member of the tokenizer-trainer
    triad next to ``bpe_train`` (merge learning) and
    ``train_bigram_lm`` (LM sufficient statistics), replacing the
    offline artifact builder ``tools/build_unigram_vocab.py`` for the
    100-TB regime where the tokenizer must be trained on the corpus
    being curated: substring-seeded candidate counts, ``em_iters``
    hard-EM refinements (Viterbi E-step over the distinct-word table;
    M-step count→log-prob via the engine-exact integer ``ilog2_q20``,
    never libm), then pruning to ``vocab_size`` with single-char
    coverage guaranteed.

    Returns the learned piece inventory ``(piece, em_count,
    logp2_q20)``: final E-step occurrence count and Q20 fixed-point
    ``log2(count/total)`` — all BIGINT, hash-exact against the oracle's
    recursive-CTE replay of the same seeding, the same square-and-shift
    log2, and the same ``(score, -n, len)`` tie-broken Viterbi."""
    _, rows = _unigram_train_loop(
        df, text_col, max_word_len, max_piece_len, em_iters, vocab_size,
        seed_cap,
    )
    from traits_data_spark.functions.literals import literal_frame

    return literal_frame(
        df.sparkSession,
        rows,
        "piece string, em_count long, logp2_q20 long",
    )


def unigram_train_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "unigram_trained_tokens",
    max_word_len: int = UNIGRAM_TRAIN_MAX_WORD_LEN,
    max_piece_len: int = UNIGRAM_TRAIN_MAX_PIECE_LEN,
    em_iters: int = UNIGRAM_TRAIN_EM_ITERS,
    vocab_size: int = UNIGRAM_TRAIN_VOCAB_SIZE,
    seed_cap: int = UNIGRAM_TRAIN_SEED_CAP,
    apply_max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> DataFrame:
    """Train the unigram LM on the corpus, then tokenize the SAME
    corpus with the pieces just learned — the end-to-end on-cluster
    chain (mirrors ``bpe_train_token_counts`` for the BPE family).
    Application is TOTAL: every word segments via Viterbi under the
    learned scores with single-char UNK fallback, and words longer
    than ``apply_max_word_len`` (excluded from training and from the
    O(L²) DP) tokenize as chars. Output: ``(id_col, out_col,
    nll_q20)`` — token count and total negative Q20 log2-prob;
    documents with no words keep their row with 0s."""
    scores, _ = _unigram_train_loop(
        df, text_col, max_word_len, max_piece_len, em_iters, vocab_size,
        seed_cap,
    )
    return unigram_apply_token_counts(
        df,
        scores,
        text_col=text_col,
        id_col=id_col,
        out_col=out_col,
        max_piece_len=max_piece_len,
        apply_max_word_len=apply_max_word_len,
    )


def unigram_apply_token_counts(
    df: DataFrame,
    vocab: DataFrame | Mapping[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "unigram_trained_tokens",
    max_piece_len: int = UNIGRAM_TRAIN_MAX_PIECE_LEN,
    apply_max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> DataFrame:
    """Tokenize a corpus under a FROZEN trained unigram vocabulary —
    the steady-state deployment path (train once with
    ``unigram_train``, persist ``(piece, logp2_q20)``, tokenize deltas
    forever — batch or inside a streaming ``foreachBatch``, exactly
    the ``pq_encode``-against-frozen-codebooks contract for the
    tokenizer family). ``vocab`` is the trained piece table (DataFrame
    with ``piece``/``logp2_q20``, or an equivalent mapping); the
    tokenization itself is ``unigram_train_token_counts``'s total
    apply (Viterbi + UNK single-char fallback + char segmentation
    beyond the DP length guard)."""
    if isinstance(vocab, DataFrame):
        scores = {
            r["piece"]: int(r["logp2_q20"])
            for r in vocab.select("piece", "logp2_q20").collect()
        }
    else:
        scores = dict(vocab)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(scores)

    @F.pandas_udf("n_tokens long, nll_q20 long")
    def _tok(words: pd.Series) -> pd.DataFrame:
        t = bc.value

        def one(w: str) -> tuple[int, int]:
            if len(w) > apply_max_word_len:
                s = sum(t.get(c, UNIGRAM_TRAIN_UNK_Q20) for c in w)
                return len(w), -s
            n, s, _ = unigram_train_viterbi_py(w, t, max_piece_len)
            return n, -s

        out = words.map(one)
        return pd.DataFrame(
            {
                "n_tokens": out.map(lambda p: p[0]).astype("int64"),
                "nll_q20": out.map(lambda p: p[1]).astype("int64"),
            }
        )

    nt = normalized_text(F.col(text_col), lowercase=True)
    warr = F.filter(F.split(nt, " "), lambda w: F.length(w) > 0)
    words = df.select(F.col(id_col), F.explode(warr).alias("__w"))
    percw = (
        words.select("__w")
        .distinct()
        .withColumn("__t", _tok(F.col("__w")))
        .select("__w", "__t.n_tokens", "__t.nll_q20")
    )
    sums = (
        words.join(F.broadcast(percw), "__w")
        .groupBy(id_col)
        .agg(
            F.sum("n_tokens").cast("long").alias(out_col),
            F.sum("nll_q20").cast("long").alias("nll_q20"),
        )
    )
    return (
        df.select(id_col)
        .distinct()
        .join(sums, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit(0)).cast("long").alias(out_col),
            F.coalesce(F.col("nll_q20"), F.lit(0)).cast("long").alias(
                "nll_q20"
            ),
        )
    )


def name_search(
    df: DataFrame,
    query: str,
    name_col: str = "name",
    id_col: str = "id",
    char_map: Mapping[str, str] | None = None,
) -> DataFrame:
    """Serving-layer name search — the QUERY-side twin of the
    normalized-generated-column + FULLTEXT DDL the RDBMS sink emits
    (``sinks.jdbc.normalized_column_sql`` / ``index_sql``; reference
    ``LOADERS/GOLD-data-loader.py:593-632``, which materializes
    ``fullNameNormalised`` via nested ø→o REPLACEs and a FULLTEXT
    index the API then searches in boolean ``term*`` mode).

    Semantics (MySQL boolean-mode prefix search, made deterministic):
    the name is normalized with the SAME char_map the DDL bakes into
    the generated column, lowercased, and tokenized on
    non-alphanumerics; each whitespace-separated query term (likewise
    normalized) scores

    - an **exact hit** if some token equals it,
    - a **prefix hit** if some token starts with it (``term*``);

    rows with at least one prefix hit are returned with BIGINT
    ``exact_hits`` / ``prefix_hits`` counts and a ``matched_all``
    flag (boolean-mode implicit AND). Ranking is left to the caller —
    the counts ARE the relevance signal and integer counts keep the
    result engine-exact, unlike MySQL's float relevance.

    Scale shape: one scan, pure codegen string ops, the query terms
    are plan literals — Catalyst folds them; no shuffle, no UDF. At
    serving scale the FULLTEXT index (which the sink's DDL creates)
    answers interactively; THIS operator is the batch/offline form —
    validating search behavior against the lake copy, backfilling
    search QA sets — where a full scan is the right plan.
    """
    import re as _re

    # the query passes through the SAME normalize+tokenize pipeline as
    # the name column (char_map → lower → split on non-alphanumerics):
    # MySQL boolean-mode FULLTEXT tokenizes the query with the column's
    # tokenizer, so "o'brien" must become the two terms [o, brien] or
    # a search for a name's own text would return nothing
    terms = []
    for raw in query.split():
        t = raw
        for s, d in (char_map or {"ø": "o", "Ø": "O"}).items():
            t = t.replace(s, d)
        for tok in _re.split(r"[^a-z0-9]+", t.lower()):
            if tok:
                terms.append(tok)
    if not terms:
        raise ValueError("query must contain at least one term")
    norm = F.col(name_col)
    for s, d in (char_map or {"ø": "o", "Ø": "O"}).items():
        norm = F.replace(norm, F.lit(s), F.lit(d))
    toks = F.filter(
        F.split(F.lower(norm), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    d = df.withColumn("__toks", toks)
    exact = None
    prefix = None
    for t in terms:
        e = F.when(F.array_contains("__toks", F.lit(t)), 1).otherwise(0)
        p = F.when(
            F.exists("__toks", lambda x: x.startswith(t)), 1
        ).otherwise(0)
        exact = e if exact is None else exact + e
        prefix = p if prefix is None else prefix + p
    return (
        d.withColumn("exact_hits", exact.cast("long"))
        .withColumn("prefix_hits", prefix.cast("long"))
        .withColumn("matched_all", F.col("prefix_hits") == len(terms))
        .filter(F.col("prefix_hits") > 0)
        .drop("__toks")
    )


def word_fourgram_counts(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """``(t, u, v, w, n_tuvw)`` word-FOURGRAM type counts with a
    TRIPLE sentence-start prepend (``<s> <s> <s> w1 ...`` — the first
    real word gets the well-defined context ``(<s>, <s>, <s>)``) —
    the order-4 count stage of ``train_mkn4_lm`` and a persistable
    LM-count index under the same add-mergeable contract as
    ``word_trigram_counts``: ``merge_fourgram_counts`` of per-slice
    counts == counts over the union, so a nightly ingest extends the
    persisted table from the new batch alone.

    Scale: one corpus-scale shuffle (the fourgram groupBy, map-side
    combine); the slide is three array slices zipped in-plan, no
    self-join, no Python."""
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.concat(
            F.array(F.lit("<s>"), F.lit("<s>"), F.lit("<s>")), wlist
        ).alias("ws")
    )
    arr = F.col("ws")
    n = F.size(arr)
    # zip the four 1-shifted views; slice length n-3 >= 0 always (the
    # three-token prepend guarantees n >= 3, and an empty word list
    # yields zero fourgrams through the empty slices)
    tu = F.zip_with(
        F.slice(arr, 1, n - 3),
        F.slice(arr, 2, n - 3),
        lambda a, b: F.struct(a.alias("t"), b.alias("u")),
    )
    tuv = F.zip_with(
        tu,
        F.slice(arr, 3, n - 3),
        lambda x, c: F.struct(
            x["t"].alias("t"), x["u"].alias("u"), c.alias("v")
        ),
    )
    fg = toks.select(
        F.explode(
            F.zip_with(
                tuv,
                F.slice(arr, 4, n - 3),
                lambda x, d: F.struct(
                    x["t"].alias("t"),
                    x["u"].alias("u"),
                    x["v"].alias("v"),
                    d.alias("w"),
                ),
            )
        ).alias("fg")
    )
    return fg.groupBy(
        F.col("fg.t").alias("t"),
        F.col("fg.u").alias("u"),
        F.col("fg.v").alias("v"),
        F.col("fg.w").alias("w"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_tuvw"))


def merge_fourgram_counts(*parts: DataFrame) -> DataFrame:
    """Merge per-slice ``word_fourgram_counts`` tables (union + keyed
    sum) — one shuffle over count rows, never over text."""
    if not parts:
        raise ValueError("merge_fourgram_counts needs at least one part")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("t", "u", "v", "w").agg(
        F.sum("n_tuvw").cast("long").alias("n_tuvw")
    )


#: Q40 fixed-point scale for the order-4 cross-level composition
#: (2^40 — chosen so the smallest representable probability step,
#: 2^-40 ~ 9.1e-13, sits three decades below the ``prob_dp=9``
#: output rounding).
MKN4_Q = 1 << 40
MKN4_Q_BITS = 40


def train_mkn4_lm(
    df: DataFrame | None = None,
    text_col: str = "text",
    max_word_len: int = 32,
    prob_dp: int = 9,
    keep_ratio: bool = False,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Train a MODIFIED Kneser-Ney word-FOURGRAM LM ON-CLUSTER — the
    ``train_mkn3_lm`` estimator one order up, one order short of
    KenLM's production order 5 (Chen & Goodman 1998 §3: highest order
    uses raw counts, every lower order uses CONTINUATION type counts;
    each order estimates its own three discounts D1/D2/D3+ from its
    own count-of-counts over the reduced common denominator)::

        P4(w|t,u,v) = (n_tuvw - A(n_tuvw))/n_tuv + gammaA * P3(w|u,v)
        P3(w|u,v)   = (c3'(uvw) - B(c3'))/c3'(uv.) + gammaB * P2(w|v)
        P2(w|v)     = (c2'(vw) - E(c2'))/c2'(v.) + gammaE * ncw/Nbb

    where ``c3'(uvw) = N1+(.uvw)`` (distinct left-extensions of the
    trigram, counted by grouping fourgram TYPES on (u, v, w)) and
    ``c2'(vw)`` groups the c3' table on (v, w).

    **Exactness boundary — the reduce-vs-round decision the order-3
    docstring deferred**: the order-3 full-product formulation carries
    ONE exact ratio whose denominator multiplies 5 statistics; at
    order 4 that chain has 7 factors (``n_tuv * AD * c3_uv * BD *
    c2_v * ED * Nbb``) and exceeds DECIMAL(38,0) even at modest
    corpus sizes, so this trainer ROUNDS at the level seams instead:
    each level's (numerator, denominator) stays an exact DECIMAL(38,0)
    integer pair, and levels compose in Q40 fixed point via floor
    division —

        p2_q = (num2 * 2^40 + gamma2 * p1_q) div (c2_v * ED)
        p3_q = (num3 * 2^40 + gamma3 * p2_q) div (c3_uv * BD)
        p4_q = (num4 * 2^40 + gamma4 * p3_q) div (n_tuv * AD)

    ``div`` is integral division on BOTH engines (Spark ``DIV`` on
    DECIMAL, DuckDB ``//`` on HUGEINT; all terms non-negative, so
    trunc == floor), making ``p_q40`` BIT-IDENTICAL cross-engine.
    The truncation injects < 2^-40 absolute error per seam (< 3e-12
    total — three decades under the ``prob_dp=9`` rounding); the
    per-level width bound is now ``count * DD * 2^40 < 1e38`` per
    LEVEL (DD cubic in that order's count-of-counts), which holds far
    past the 20x stress corpus; past it, Spark NULLs/ANSI-throws —
    loud in any gate — and the deployment path is pre-quantizing the
    one-row discount globs to Q30 before the per-row chain, which
    caps every term at ``count * 2^70`` regardless of corpus size.
    The final ``p`` is ``round(p_q40 / 2^40, prob_dp)`` — exact
    power-of-two division of a <=41-bit integer, deterministic IEEE
    on both engines.

    Scale shape: ONE corpus-scale shuffle (the fourgram groupBy);
    context totals, continuation tables, count-of-count frames and
    the one-row discount glob all derive from the type-bounded
    fourgram table. The model join fans the type table through six
    keyed joins plus a one-row broadcast — type-table-sized shuffles,
    not corpus.

    Output: ``(t, u, v, w, n_tuvw, n_tuv, nu1, nu2, nu3p, c3_uvw,
    c3_uv, mu1, mu2, mu3p, c2_vw, c2_v, mv1, mv2, mv3p, ncw, p)``;
    ``keep_ratio=True`` adds the exact BIGINT ``p_q40``. Pass
    ``counts=`` (a persisted ``word_fourgram_counts`` index extended
    via ``merge_fourgram_counts``) to re-derive the model without
    touching corpus text — exactly one of ``df``/``counts`` is
    required."""
    if counts is None:
        if df is None:
            raise ValueError("train_mkn4_lm needs df or counts")
        # persist: ctx4/c3/g4/join all consume the count table —
        # without the pin each re-runs the corpus tokenize + shuffle
        counts = (
            word_fourgram_counts(df, text_col, max_word_len)
            .transform(barrier)
        )
    elif df is not None:
        raise ValueError(
            "train_mkn4_lm: pass df OR counts, not both — with "
            "counts= the corpus text is never touched"
        )
    DEC = _MKN_DEC
    ctx4 = counts.groupBy("t", "u", "v").agg(
        F.sum("n_tuvw").cast("long").alias("n_tuv"),
        _mkn_bucket("n_tuvw", 1).alias("nu1"),
        _mkn_bucket("n_tuvw", 2).alias("nu2"),
        _mkn_bucket("n_tuvw", 3).alias("nu3p"),
    )
    # persisted: each continuation table has 4-5 consumers (contexts,
    # next level down, discount frames, the model join) — one
    # type-table shuffle apiece, reused
    c3 = counts.groupBy("u", "v", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c3_uvw")
    ).transform(barrier)
    ctx3 = c3.groupBy("u", "v").agg(
        F.sum("c3_uvw").cast("long").alias("c3_uv"),
        _mkn_bucket("c3_uvw", 1).alias("mu1"),
        _mkn_bucket("c3_uvw", 2).alias("mu2"),
        _mkn_bucket("c3_uvw", 3).alias("mu3p"),
    )
    c2 = c3.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c2_vw")
    ).transform(barrier)
    ctx2 = c2.groupBy("v").agg(
        F.sum("c2_vw").cast("long").alias("c2_v"),
        _mkn_bucket("c2_vw", 1).alias("mv1"),
        _mkn_bucket("c2_vw", 2).alias("mv2"),
        _mkn_bucket("c2_vw", 3).alias("mv3p"),
    )
    pred = c2.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")
    )
    g4 = mkn_discount_glob(counts, "n_tuvw", "a")
    g3 = mkn_discount_glob(c3, "c3_uvw", "b")
    g2 = mkn_discount_glob(c2, "c2_vw", "e")
    gbb = c2.agg(F.count(F.lit(1)).cast(DEC).alias("__nbb"))
    glob = g4.crossJoin(g3).crossJoin(g2).crossJoin(gbb)

    def _disc(cnt: str, p: str):
        return (
            F.when(F.col(cnt) == 1, F.col(f"__{p}1"))
            .when(F.col(cnt) == 2, F.col(f"__{p}2"))
            .otherwise(F.col(f"__{p}3"))
        )

    def _gamma(p: str, b1: str, b2: str, b3: str):
        return (
            F.col(f"__{p}1") * F.col(b1).cast(DEC)
            + F.col(f"__{p}2") * F.col(b2).cast(DEC)
            + F.col(f"__{p}3") * F.col(b3).cast(DEC)
        )

    Q = F.lit(MKN4_Q).cast(DEC)
    joined = (
        counts.join(ctx4, ["t", "u", "v"])
        .join(c3, ["u", "v", "w"])
        .join(ctx3, ["u", "v"])
        .join(c2, ["v", "w"])
        .join(ctx2, "v")
        .join(pred, "w")
        .crossJoin(F.broadcast(glob))
    )
    num2 = F.greatest(
        F.col("c2_vw").cast(DEC) * F.col("__eD") - _disc("c2_vw", "e"),
        F.lit(0).cast(DEC),
    )
    num3 = F.greatest(
        F.col("c3_uvw").cast(DEC) * F.col("__bD") - _disc("c3_uvw", "b"),
        F.lit(0).cast(DEC),
    )
    num4 = F.greatest(
        F.col("n_tuvw").cast(DEC) * F.col("__aD") - _disc("n_tuvw", "a"),
        F.lit(0).cast(DEC),
    )
    d = (
        joined.withColumn(
            "__p1q",
            F.expr(
                f"(CAST(ncw AS {DEC}) * CAST({MKN4_Q} AS {DEC}))"
                " DIV __nbb"
            ).cast(DEC),
        )
        .withColumn("__num2", num2)
        .withColumn("__gam2", _gamma("e", "mv1", "mv2", "mv3p"))
        .withColumn(
            "__p2q",
            F.expr(
                "(__num2 * CAST({q} AS {dec}) + __gam2 * __p1q)"
                " DIV (CAST(c2_v AS {dec}) * __eD)".format(
                    q=MKN4_Q, dec=DEC
                )
            ).cast(DEC),
        )
        .withColumn("__num3", num3)
        .withColumn("__gam3", _gamma("b", "mu1", "mu2", "mu3p"))
        .withColumn(
            "__p3q",
            F.expr(
                "(__num3 * CAST({q} AS {dec}) + __gam3 * __p2q)"
                " DIV (CAST(c3_uv AS {dec}) * __bD)".format(
                    q=MKN4_Q, dec=DEC
                )
            ).cast(DEC),
        )
        .withColumn("__num4", num4)
        .withColumn("__gam4", _gamma("a", "nu1", "nu2", "nu3p"))
        .withColumn(
            "__p4q",
            F.expr(
                "(__num4 * CAST({q} AS {dec}) + __gam4 * __p3q)"
                " DIV (CAST(n_tuv AS {dec}) * __aD)".format(
                    q=MKN4_Q, dec=DEC
                )
            ),
        )
    )
    cols = [
        "t", "u", "v", "w", "n_tuvw", "n_tuv", "nu1", "nu2", "nu3p",
        "c3_uvw", "c3_uv", "mu1", "mu2", "mu3p",
        "c2_vw", "c2_v", "mv1", "mv2", "mv3p", "ncw",
    ]
    ratio = (
        [F.col("__p4q").cast("long").alias("p_q40")] if keep_ratio else []
    )
    return d.select(
        *cols,
        *ratio,
        F.round(
            F.col("__p4q").cast("double") / F.lit(float(MKN4_Q)), prob_dp
        ).alias("p"),
    )


def kn4_doc_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """Train-then-score under the ORDER-4 modified Kneser-Ney LM —
    ``kn3_doc_scores`` one order up: fit ``train_mkn4_lm`` on the
    corpus, then score every document's fourgram stream under the
    model the plan just learned, with NO committed artifact and NO
    transcendentals. The Q40 fixed-point probability makes the cost a
    single log: ``bits_q20 = 40*2^20 - ilog2_q20(p_q40)`` (vs the
    order-3 two-log ratio form), so the per-document sum is a BIGINT
    — shuffle-order-free and hash-exact cross-engine.

    Exactness boundary: ``p_q40`` is the trainer's bit-identical
    cross-engine fixed-point probability; a fourgram whose model
    probability floors to 0 in Q40 (< 2^-40 — only reachable through
    a saturated D1 clamp plus an extreme backoff chain) is charged
    exactly 40 bits via ``greatest(p_q40, 1)`` — the documented cost
    ceiling of the fixed-point grid, applied identically on both
    engines.

    Scale: the trainer's one fourgram shuffle, the ilog2 chain as
    pure codegen over the type-bounded model, one corpus-scale
    shuffle joining the per-doc fourgram stream to the model on
    (t, u, v, w) (broadcastable when the model is small), one
    doc-keyed agg. Scoring the training corpus itself means every
    fourgram is in-model (no OOV branch).

    Output: ``(id_col, n_fourgrams, nll_q20, bits_per_fourgram_q20)``
    — total and truncated-mean negative log2-likelihood in Q20
    micro-bits.
    """
    from traits_data_spark.functions.intmath import with_ilog2_q20

    model = train_mkn4_lm(
        df, text_col=text_col, max_word_len=max_word_len,
        keep_ratio=True,
    ).select(
        "t",
        "u",
        "v",
        "w",
        F.greatest(F.col("p_q40"), F.lit(1)).cast("long").alias("p_q40"),
    )
    model = with_ilog2_q20(model, "p_q40", "__il")
    bits = model.select(
        "t", "u", "v", "w",
        (F.lit(MKN4_Q_BITS * (1 << 20)).cast("long") - F.col("__il"))
        .alias("__bits_q20"),
    )
    nt = normalized_text(F.col(text_col), lowercase=True)
    wlist = F.filter(
        F.split(nt, " "),
        lambda x: (F.length(x) > 0) & (F.length(x) <= max_word_len),
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        id_col,
        F.concat(
            F.array(F.lit("<s>"), F.lit("<s>"), F.lit("<s>")), wlist
        ).alias("ws"),
    )
    arr = F.col("ws")
    n = F.size(arr)
    tu = F.zip_with(
        F.slice(arr, 1, n - 3),
        F.slice(arr, 2, n - 3),
        lambda a, b: F.struct(a.alias("t"), b.alias("u")),
    )
    tuv = F.zip_with(
        tu,
        F.slice(arr, 3, n - 3),
        lambda x, c: F.struct(
            x["t"].alias("t"), x["u"].alias("u"), c.alias("v")
        ),
    )
    fg = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                tuv,
                F.slice(arr, 4, n - 3),
                lambda x, d: F.struct(
                    x["t"].alias("t"),
                    x["u"].alias("u"),
                    x["v"].alias("v"),
                    d.alias("w"),
                ),
            )
        ).alias("fg"),
    ).select(
        id_col,
        F.col("fg.t").alias("t"),
        F.col("fg.u").alias("u"),
        F.col("fg.v").alias("v"),
        F.col("fg.w").alias("w"),
    )
    return (
        fg.join(bits, ["t", "u", "v", "w"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fourgrams"),
            F.sum("__bits_q20").cast("long").alias("nll_q20"),
        )
        .withColumn(
            "bits_per_fourgram_q20",
            # integer division (values are non-negative, so trunc ==
            # floor on both engines; no double round-trip)
            F.expr("nll_q20 DIV n_fourgrams").cast("long"),
        )
    )

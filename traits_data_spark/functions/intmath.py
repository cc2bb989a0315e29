"""Engine-portable integer fixed-point math.

The repo's oracle gate compares Spark and DuckDB outputs by exact
value hash, so transcendental functions (``ln``/``exp``/``log2``) may
NEVER run in a query plan: libm results are not correctly rounded and
differ across the JVM, glibc and DuckDB's own math layer (see
``tools/build_word_lm.py`` and ``train_bigram_lm`` for the
artifact-side-``ln`` rule this codifies). When a data-dependent
logarithm is genuinely required inside a training loop — the unigram
LM trainer's M-step turns piece counts into log-probabilities every
EM iteration — the fix is to stop asking libm at all: compute a
fixed-point ``log2`` with the classic square-and-shift digit
recurrence using ONLY integer multiply/shift/compare, which every
engine executes bit-identically.

``ilog2_q20(x)`` returns ``round-ish(log2(x) * 2**20)`` computed as:

- ``b = bit_length(x) - 1`` (the integer part; both engines expose it
  portably as ``length(bin(x)) - 1``),
- normalize the mantissa to Q30 in ``[2**30, 2**31)`` (a right shift
  for wide inputs floors identically on both engines),
- 20 rounds of ``m = (m*m) >> 30; if m >= 2**31: bit=1, m >>= 1`` —
  each round extracts one fractional bit of ``log2`` (squaring
  doubles the exponent), max intermediate ``2**62`` so everything
  stays in BIGINT.

Truncation error is in ``[0, 2**-20)`` — deterministic, not rounded —
and identical in this Python form (driver-side model math) and in the
generated recursive-CTE SQL form (``catalog``'s oracle builders), so
micro-bit log-probs derived from counts hash-match across engines by
construction. The tests pin Python==SQL equality on a value sweep and
the ``< 2**-20 + true-log2`` error bound.
"""

from __future__ import annotations

ILOG2_FRAC_BITS = 20
_Q30 = 1 << 30
_Q31 = 1 << 31


def ilog2_q20(x: int) -> int:
    """Fixed-point ``log2(x)`` in Q20 for BIGINT ``x >= 1`` using only
    integer ops (square-and-shift; see module docstring). Raises
    ``ValueError`` on ``x < 1`` — the caller owns zero/negative
    semantics (a count of 0 has no log-probability)."""
    if x < 1:
        raise ValueError(f"ilog2_q20 requires x >= 1, got {x}")
    b = x.bit_length() - 1
    m = x << (30 - b) if b <= 30 else x >> (b - 30)
    f = 0
    for _ in range(ILOG2_FRAC_BITS):
        m = (m * m) >> 30
        f <<= 1
        if m >= _Q31:
            f |= 1
            m >>= 1
    return (b << ILOG2_FRAC_BITS) + f


def logp2_q20(count: int, total: int) -> int:
    """Q20 fixed-point ``log2(count / total)`` for positive integer
    counts: ``ilog2_q20(count) - ilog2_q20(total)`` — the integer
    micro-bit log-probability the unigram trainer assigns to a piece.
    Always ``<= 0`` for ``count <= total``."""
    return ilog2_q20(count) - ilog2_q20(total)


def with_ilog2_q20(df, x_col: str, out_col: str):
    """IN-PLAN ``ilog2_q20``: append ``out_col = ilog2_q20(x_col)`` to
    a Spark DataFrame as pure JVM-side integer column arithmetic — the
    distributed twin of the Python scalar above and of the oracle
    recursive CTE (``catalog.text._ilog2_ctes``), bit-identical to
    both because all three run the same square-and-shift recurrence on
    BIGINTs.

    The 20 fraction rounds unroll into 20 chained projections (each
    referencing the previous round's ``m`` by COLUMN, so there is no
    exponential expression blowup — the reason this is a DataFrame
    transform and not one giant ``F.expr`` string). Whole-stage
    codegen fuses the chain into one pass; no UDF, no shuffle, scales
    to any row count — unlike the driver-side trainer collects, this
    form can score a billion-row count table.

    ``x_col`` must be BIGINT >= 1 (same contract as ``ilog2_q20``;
    under ANSI mode a bad input surfaces as a wrong bit-length, so
    callers guard zeros with ``+ 1`` Laplace shifts the way the DSIR
    trainer does).
    """
    from pyspark.sql import functions as F

    d = df.withColumn(
        "__il_b", F.expr(f"CAST(length(bin({x_col})) - 1 AS BIGINT)")
    ).withColumn(
        "__il_m",
        F.expr(
            f"CASE WHEN __il_b <= 30"
            f" THEN {x_col} * shiftleft(CAST(1 AS BIGINT),"
            f"                          CAST(30 - __il_b AS INT))"
            f" ELSE shiftright({x_col}, CAST(__il_b - 30 AS INT)) END"
        ),
    ).withColumn("__il_f", F.lit(0).cast("long"))
    for _ in range(ILOG2_FRAC_BITS):
        d = (
            d.withColumn("__il_t", F.expr("shiftright(__il_m * __il_m, 30)"))
            .withColumn(
                "__il_f",
                F.expr(
                    "__il_f * 2 + CASE WHEN __il_t >= 2147483648"
                    " THEN 1 ELSE 0 END"
                ),
            )
            .withColumn(
                "__il_m",
                F.expr(
                    "CASE WHEN __il_t >= 2147483648"
                    " THEN shiftright(__il_t, 1) ELSE __il_t END"
                ),
            )
            .drop("__il_t")
        )
    return d.withColumn(
        out_col,
        F.expr(f"shiftleft(__il_b, {ILOG2_FRAC_BITS}) + __il_f"),
    ).drop("__il_b", "__il_m", "__il_f")

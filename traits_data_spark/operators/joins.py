"""Join helpers (SURVEY.md §2.3).

All of the reference's joins are equi-joins with small dimension
sides (competitions, teams, lineups — pandas frames of at most
thousands of rows: ADAPTERS/SILVER-adapter-wyscout.py:364-373).
``dim_join`` makes the broadcast explicit so a misestimated dimension
can never fall back to a 100 TB shuffle join; ``mismatch_join`` is the
subset-detection join (J14).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1-J3: fact ⋈ dimension with an explicit broadcast hint.

    The reference's dims (competitions, teams, national teams) are
    always small; broadcasting removes the shuffle entirely — the fact
    side streams through map-side hash joins.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, list(on), how)


def mismatch_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_col: str,
    right_col: str,
) -> DataFrame:
    """J14: subset-detection join — rows whose attribute disagrees
    between two sources (inner join on keys, keep ``left_col !=
    right_col``). Reference: players whose assigned position differs
    (DEPRECATED/champion-gold-copy.py:314-328).
    """
    return left.join(right, list(on), "inner").filter(
        F.col(left_col) != F.col(right_col)
    )

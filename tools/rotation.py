"""Driver-window rotation queue generator (VERDICT r11 items 1 + 5).

The driver oracle-checks the FIRST 50 registry entries each round
(``_PRIORITY`` in ``mapreducenonequijoin_spark/plans/__init__.py``).
Until round 11 the window was hand-curated each round; this tool makes
the "oldest driver-green first" cadence a generated, testable artifact:

- It parses every committed ``CORRECTNESS_r*.json`` and computes, per
  registry key, the latest round in which the DRIVER saw it fully green
  (rows+schema+hash all true).  ``err == 'no_oracle'`` rows-only
  appearances and errored rows do NOT count as green.
- The next window is: flagship first (``join_self_band`` — the driver's
  smoke-entry contract), then every oracled key the driver has NEVER
  seen green (newest additions), then the oracled keys with the OLDEST
  last-green round, ties broken alphabetically, up to 50.
- Keys without a DuckDB oracle (the 5 rows-only-by-design approximate /
  streaming ids) are excluded: they can never produce a hash-green
  driver row; their correctness rotates via their hash-checked gate
  rows (sim_knn_recall_gate, sim_ann_recall_matrix,
  dedup_minhash_estimate_gate, stream_late_accounting_gate).

Usage:
    python tools/rotation.py              # print the computed next window
    python tools/rotation.py --ages       # per-key last-green age table
    python tools/rotation.py --freeze N   # write tools/rotation_window.json
                                          # (the round-N frozen window)
    python tools/rotation.py --check      # exit 1 if _PRIORITY[:50] does not
                                          # match the frozen window

The freeze file exists so that operators added MID-round (which are
"never driver-checked" and would otherwise jump into the window) do not
disturb a window the driver may already be consuming: freeze once at
round start, keep ``_PRIORITY`` equal to the frozen list, and re-freeze
at the next round start.  tests/test_registry.py enforces the match.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FREEZE_PATH = os.path.join(REPO, "tools", "rotation_window.json")
WINDOW = 50
FLAGSHIP = "join_self_band"


def last_green_rounds() -> dict[str, int]:
    """Latest driver round in which each key was fully hash-green."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for key, row in json.load(open(path)).items():
            if (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                last[key] = max(last.get(key, 0), rnd)
    return last


def compute_window() -> list[str]:
    from mapreducenonequijoin_spark.plans import QUERIES, oracle_sql_map

    oracled = [k for k in QUERIES if k in oracle_sql_map()]
    green = last_green_rounds()
    never = sorted(k for k in oracled if k not in green and k != FLAGSHIP)
    aged = sorted(
        (k for k in oracled if k in green and k != FLAGSHIP),
        key=lambda k: (green[k], k),
    )
    window = [FLAGSHIP] + never + aged
    return window[:WINDOW]


def main() -> int:
    args = sys.argv[1:]
    if "--ages" in args:
        green = last_green_rounds()
        from mapreducenonequijoin_spark.plans import QUERIES, oracle_sql_map

        oracled = [k for k in QUERIES if k in oracle_sql_map()]
        dist: dict[int, int] = {}
        for k in sorted(oracled, key=lambda k: (green.get(k, 0), k)):
            rnd = green.get(k, 0)
            dist[rnd] = dist.get(rnd, 0) + 1
            print(f"r{rnd or '--'}  {k}")
        print("\nlast-driver-green distribution (0 = never):")
        for rnd in sorted(dist):
            print(f"  r{rnd:02d}: {dist[rnd]} keys")
        return 0
    if args and args[0] == "--freeze":
        rnd = int(args[1])
        window = compute_window()
        json.dump(
            {"round": rnd, "window": window},
            open(FREEZE_PATH, "w"),
            indent=1,
        )
        print(f"froze round-{rnd} window ({len(window)} keys) -> {FREEZE_PATH}")
        return 0
    if "--check" in args:
        frozen = json.load(open(FREEZE_PATH))["window"]
        from mapreducenonequijoin_spark.plans import QUERIES

        head = list(QUERIES)[: len(frozen)]
        if head != frozen:
            print("MISMATCH: _PRIORITY head != frozen rotation window")
            for i, (a, b) in enumerate(zip(head, frozen)):
                if a != b:
                    print(f"  slot {i + 1}: registry={a!r} frozen={b!r}")
            return 1
        print(f"registry head matches frozen round-{json.load(open(FREEZE_PATH))['round']} window")
        return 0
    for i, k in enumerate(compute_window(), 1):
        print(f"{i:2d}  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

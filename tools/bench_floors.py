"""Repair/derive per-key noise floors (VERDICT r13 item 3).

Round 13 committed isolated 5-repeat medians as per-key "floors"
(tools/bench_headline_last.json), but several of those isolated runs
themselves landed in host stall windows: funnel_conversion was
recorded 1.479 s while BOTH full-registry soaks had it at 0.50/0.62 s,
sessionize_events 1.752 s vs 0.38/0.39 s. A floor that exceeds its own
soak minimum is not a floor — and next round's bench_diff would
"confirm" phantom regressions against it.

This tool re-derives the floor per key as the MIN across every
artifact named on the command line (isolated headline runs, full-soak
runs — any JSON with a top-level or "parsed" ``queries`` map), drops
crashed (-1) readings, and writes ``tools/bench_floors.json`` in the
same shape bench.py emits, so ``bench_diff.py tools/bench_floors.json
BENCH_rN.json`` works unchanged. By construction no repaired floor can
exceed any source artifact's reading, satisfying the r13 "no floor
>1.5x its own soak minimum" gate.

Usage:
    python tools/bench_floors.py tools/bench_headline_r13_local.json \
        tools/bench_all_r13.json tools/bench_all_r13_run2.json
    python tools/bench_floors.py --check   # gate: floors vs soak minima
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tools" / "bench_floors.json"

DEFAULT_SOURCES = [
    "tools/bench_headline_r13_local.json",
    "tools/bench_all_r13.json",
    "tools/bench_all_r13_run2.json",
]


def load_queries(path: Path) -> dict[str, float]:
    data = json.loads(path.read_text())
    if "parsed" in data:
        data = data.get("parsed") or {}
    return {
        k: float(v)
        for k, v in (data.get("queries") or {}).items()
        if float(v) >= 0  # -1 marks a crashed key; never a floor
    }


def derive(sources: list[str]) -> dict:
    floors: dict[str, float] = {}
    for s in sources:
        for k, v in load_queries(REPO / s).items():
            if k not in floors or v < floors[k]:
                floors[k] = round(v, 3)
    return {
        "metric": "noise_floor_repaired",
        "unit": "sec",
        "sf": 0.1,
        "derived": "per-key min across sources (stall-window tolerant)",
        "sources": sources,
        "queries": dict(sorted(floors.items())),
    }


def check() -> int:
    """Gate: every floor <= every soak reading for that key (i.e. no
    floor exceeds its soak minimum — the r13 'Done' condition)."""
    floors = json.loads(OUT.read_text())
    bad = []
    for s in floors["sources"]:
        for k, v in load_queries(REPO / s).items():
            f = floors["queries"].get(k)
            if f is not None and f > v + 1e-9:
                bad.append((k, f, v, s))
    if bad:
        for k, f, v, s in bad:
            print(f"FLOOR VIOLATION {k}: floor {f} > {v} in {s}")
        return 1
    n = len(floors["queries"])
    print(f"floors ok: {n} keys, each <= every source reading")
    return 0


def main() -> int:
    args = sys.argv[1:]
    if args == ["--check"]:
        return check()
    sources = args or DEFAULT_SOURCES
    payload = derive(sources)
    OUT.write_text(json.dumps(payload, indent=1) + "\n")
    print(f"wrote {OUT.relative_to(REPO)}: {len(payload['queries'])} keys")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Streaming state-store audit: rows and bytes of operator state per
streaming query, from StreamingQueryProgress.stateOperators — the
number that decides whether a stateful operator survives unbounded
input (state must be watermark-bounded, not input-bounded).

Covers EVERY registry ``stream_*`` query (VERDICT r6 item 6): the
queries run exactly as registered, and the streaming runner
(streaming/windows._run) records the final stateOperators snapshot in
``LAST_STATE_OPERATORS`` for this tool to read — no re-implementation,
so the audit can't drift from the product plans.

Usage: python tools/state_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.sources.io import load_table  # noqa: E402
from mapreducenonequijoin_spark.plans import QUERIES  # noqa: E402
from mapreducenonequijoin_spark.streaming import windows as W  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or sorted(
        n
        for n in QUERIES
        if n.startswith(("stream_", "pipeline_stream_"))
    )
    spark = get_spark("state-audit")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = load_table(spark, sf_dir, "events").count()

    print(f"| stream query | state rows | state memory | ops | input rows {n_events:,} |")
    print("| --- | --- | --- | --- | --- |")
    for name in names:
        W.LAST_STATE_OPERATORS.clear()
        out_rows = QUERIES[name].fn(spark, sf_dir).count()
        ops = list(W.LAST_STATE_OPERATORS)
        rows = sum(o.get("numRowsTotal", 0) for o in ops)
        mem = sum(o.get("memoryUsedBytes", 0) for o in ops)
        kinds = ",".join(sorted({o.get("operatorName", "?") for o in ops})) or "-"
        print(
            f"| {name} | {rows:,} | {mem / 1024:,.0f} KiB | {kinds} |"
            f" out={out_rows:,} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()

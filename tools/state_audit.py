"""Streaming state-store audit: rows and bytes of operator state per
streaming query, from StreamingQueryProgress.stateOperators — the
number that decides whether a stateful operator survives unbounded
input (state must be watermark-bounded, not input-bounded).

Usage: python tools/state_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.sources.io import load_table  # noqa: E402
from mapreducenonequijoin_spark.streaming import windows as W  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("state-audit")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = load_table(spark, sf_dir, "events").count()

    cases = {
        "tumbling_1h_window": W.tumbling_counts(W.events_stream(spark, sf_dir)),
        "sliding_1h_by_15m": W.sliding_counts(W.events_stream(spark, sf_dir)),
        "session_30m_gap": W.session_window_agg(
            W.events_stream(spark, sf_dir), "30 minutes"
        ),
    }
    print(f"| stream query | state rows | state memory | input rows {n_events} |")
    print("| --- | --- | --- | --- |")
    import uuid

    for name, frame in cases.items():
        qname = "sa" + uuid.uuid4().hex[:10]
        q = (
            frame.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            prog = json.loads(q.lastProgress.json) if q.lastProgress else {}
        finally:
            q.stop()
        ops = prog.get("stateOperators", [])
        rows = sum(o.get("numRowsTotal", 0) for o in ops)
        mem = sum(o.get("memoryUsedBytes", 0) for o in ops)
        print(f"| {name} | {rows:,} | {mem/1024:,.0f} KiB | |")
    spark.stop()


if __name__ == "__main__":
    main()

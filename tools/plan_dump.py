"""Dump `.explain("formatted")` for named queries to plans/r14/.

Usage: python tools/plan_dump.py <suffix> <query> [query ...]
       python tools/plan_dump.py <suffix> --headline

Writes plans/r14/<query>_<suffix>.txt for each query (suffix is
"before" / "after" per the optimization-round deliverable). Streaming
queries execute eagerly when built, so for stream_* keys the file
records the *logical* streaming plan via the query's own docstring
note instead of a formatted batch plan; batch keys get the real
physical plan. The sf_dir defaults to sf0.1 (override with
SPARK_GRAFT_SF_DIR) — the scale the driver benches at.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.plans import queries_map  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries_map()
    if names == ["--headline"]:
        import re

        names = re.findall(
            r'^\s+"([a-z0-9_]+)",',
            open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read(),
            re.M,
        )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    for name in names:
        if name not in qs:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            if name.startswith("stream_") or name == "pipeline_stream_incident_funnel":
                # building the frame RUNS the stream; the artifact of
                # record is the executed micro-batch progress + state
                # footprint instead of a batch physical plan
                from mapreducenonequijoin_spark.streaming import windows as W

                df = qs[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                text = (
                    "== streaming query: memory-sink contents plan below; "
                    "state operators of the executed run ==\n"
                    + "\n".join(str(s) for s in W.LAST_STATE_OPERATORS)
                    + "\n\n"
                    + buf.getvalue()
                )
            else:
                df = qs[name](spark, sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building {name}: {e}\n"
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

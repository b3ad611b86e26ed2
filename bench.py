"""Benchmark runner (driver contract): times the engine's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the no-op sink (full execution, no
driver-side result transfer), so timings reflect the distributed plan,
not collect() serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402

# Headline set: one representative per operator family; extended as
# families land. Empty → bench every registered query.
HEADLINE: list[str] = []


def main() -> None:
    # The driver parses stdout as EXACTLY ONE JSON line (BENCH_r01 was
    # recorded "parsed": null because JVM/py4j startup chatter shares
    # fd 1). Save the real stdout, point fd 1 at stderr for the whole
    # run, and write the JSON to the saved fd as the sole stdout bytes.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = queries()
    names = HEADLINE or list(qs)

    # One-time warmup: JVM codegen, Python worker pool, parquet footer
    # cache — so the first timed query isn't charged for session
    # startup (it previously absorbed ~5s of cold-start).
    from mapreducenonequijoin_spark.sources.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    sys.stdout.flush()
    os.write(real_stdout, (line + "\n").encode())
    os.close(real_stdout)


if __name__ == "__main__":
    main()

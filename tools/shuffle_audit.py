"""Shuffle-volume audit: measured bytes/records shuffled and spill per
query, from Spark's SQL status store (the same numbers the SQL UI
shows). This is the direct evidence for the engine's central scale
claim — that the non-equi rewrites shuffle O(input × small constant),
never O(n²) — and the early-warning signal for spills.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Defaults to the headline bench set at sf0.1.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.plans import QUERIES  # noqa: E402

_UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3}


def _parse(val: str) -> float:
    """'28.0 KiB' → bytes; '1,981' → count; 'total (min, med, max...' →
    leading total."""
    val = val.strip().splitlines()[0]
    m = re.match(r"([\d.,]+)\s*(B|KiB|MiB|GiB)?", val)
    if not m:
        return 0.0
    num = float(m.group(1).replace(",", ""))
    return num * _UNITS.get(m.group(2), 1)


def measure(spark, fn, sf_dir):
    store = spark._jsparkSession.sharedState().statusStore()
    # snapshot BEFORE running: plans with driver-side stats passes or
    # persisted pre-passes (pagerank, incremental ETL, IVF fitting)
    # register SEVERAL SQL executions; summing only the last one
    # under-reports exactly the multi-pass queries this audit is most
    # interested in
    before = store.executionsList().size()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    execs = store.executionsList()
    out = {"shuffle_bytes": 0.0, "shuffle_records": 0.0, "spill_bytes": 0.0,
           "executions": 0}
    for idx in range(before, execs.size()):
        e = execs.apply(idx)
        mets = store.executionMetrics(e.executionId())
        vals = {}
        it = mets.iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2()
        di = e.metrics().iterator()
        while di.hasNext():
            d = di.next()
            if d.accumulatorId() not in vals:
                continue
            v = _parse(vals[d.accumulatorId()])
            if d.name() == "shuffle bytes written":
                out["shuffle_bytes"] += v
            elif d.name() == "shuffle records written":
                out["shuffle_records"] += v
            elif d.name() == "spill size":
                out["spill_bytes"] += v
        out["executions"] += 1
    return out


def main() -> None:
    import bench

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in QUERIES]
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"| query | shuffled | records | spill | execs |  ({sf_dir})")
    print("| --- | --- | --- | --- | --- |")
    for name in names:
        if name.startswith("stream_"):
            continue  # streaming executions register differently
        m = measure(spark, QUERIES[name].fn, sf_dir)
        mb = m["shuffle_bytes"] / 1024**2
        sp = m["spill_bytes"] / 1024**2
        print(
            f"| {name} | {mb:8.1f} MiB | {int(m['shuffle_records']):>9,} |"
            f" {sp:5.1f} MiB | {m['executions']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()

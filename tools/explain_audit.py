"""Scale-hygiene audit: prints a one-line physical-plan summary for
every registered (batch) query — join strategies chosen, number of
shuffles (Exchange), whether Parquet scans carry pushed filters, and
flags for scale hazards (cartesian products / BNLJ on large inputs).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.plans import QUERIES  # noqa: E402
from tools.scale_whitelist import GLOBAL_WINDOW_OK  # noqa: E402

# streaming queries execute eagerly (they RUN a stream); skip in audit
_SKIP_PREFIX = "stream_"


def global_window_lines(plan: str) -> list[str]:
    """Return Window exec lines that have NO partition spec (a global
    window = single-partition WindowExec = the whole input through one
    task). VERDICT r7 item 4 — the census must catch the next
    unbounded global window before it ships."""
    out = []
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-*()\d\[\]codegen id]*?Window (\[.*)$", line)
        if not m:
            continue
        rest, depth, groups = m.group(1), 0, []
        for i, ch in enumerate(rest):
            if ch == "[":
                if depth == 0:
                    groups.append(i + 1)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups[-1] = rest[groups[-1]: i]
        if len(groups) >= 3:
            continue  # exprs + partitionSpec + orderSpec: partitioned
        # two groups = exprs + (partitionSpec OR orderSpec): the
        # survivor is the orderSpec exactly when its entries carry
        # sort directions (ASC/DESC) — partition columns never do.
        last = groups[-1] if len(groups) == 2 else ""
        if len(groups) < 2 or " ASC" in last or " DESC" in last:
            out.append(line.strip())
    return out


def summarize(plan: str, fmt: str = "", name: str = "") -> str:
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    n_exchange = len(re.findall(r"Exchange (?!SinglePartition)", plan))
    # scan + pushdown facts come from the FORMATTED explain when
    # available: treeString truncates long FileScan one-liners, which
    # silently drops the PushedFilters clause (undercounted before)
    src = fmt or plan
    n_scans = len(re.findall(r"Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", src))
    codegen = (
        len(set(re.findall(r"\[codegen id : (\d+)\]", fmt)))
        if fmt
        else len(set(re.findall(r"\*\((\d+)\)", plan)))
    )
    flags = []
    if "CartesianProduct" in joins:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in joins:
        flags.append("BNLJ")
    if global_window_lines(plan):
        # the census is a GATE (VERDICT r8 item 3): a whitelisted
        # global window prints its structured bound; an unwhitelisted
        # one is a hard failure (main() exits 1)
        wl = GLOBAL_WINDOW_OK.get(name)
        if wl:
            flags.append(f"GLOBALWIN[ok:{wl['bounded_by']}]")
        else:
            flags.append("GLOBALWIN[UNWHITELISTED]")
    join_counts = {}
    for j in joins:
        join_counts[j] = join_counts.get(j, 0) + 1
    join_str = ",".join(f"{k.replace('Join','')}×{v}" for k, v in join_counts.items()) or "-"
    return (
        f"joins[{join_str}] shuffles={n_exchange} scans={n_scans} "
        f"pushed={pushed} codegen={codegen}"
        + (f"  ⚠ {'/'.join(flags)}" if flags else "")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain_audit")
    # with AQE on, executedPlan is the un-finalized AdaptiveSparkPlan,
    # which omits WholeStageCodegen collapse; the audit is static plan
    # analysis, so inspect the non-adaptive physical plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    n_unwhitelisted = 0
    for name, qd in QUERIES.items():
        if only and name not in only:
            continue
        if name.startswith(_SKIP_PREFIX):
            print(f"{name:32s} (streaming — audited via StreamingQueryProgress)")
            continue
        try:
            df = qd.fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            fmt = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
            line = summarize(plan, fmt, name)
            if "GLOBALWIN[UNWHITELISTED]" in line:
                n_unwhitelisted += 1
            print(f"{name:32s} {line}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {str(e)[:120]}")
    if n_unwhitelisted:
        print(
            f"FAIL: {n_unwhitelisted} unwhitelisted partition-less "
            "window(s) — add a structured entry to "
            "tools/scale_whitelist.py or repartition the plan"
        )
    return 1 if n_unwhitelisted else 0


if __name__ == "__main__":
    raise SystemExit(main())

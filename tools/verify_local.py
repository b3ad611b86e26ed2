"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at a given sf_dir and compares it to its
``oracle_sql()`` twin executed by DuckDB over the same Parquet files:
row count, column names, and order-insensitive values (floats compared
with tolerance; the driver's hash compare is stricter, so queries
should round float aggregates — this tool warns when a float column is
present). Usage:

    python tools/verify_local.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs under a BARE SparkSession (master local[8] only, no
engine confs) — the driver's environment. Catches conf-dependence bugs
like the round-4 NTZ cascade: the engine must set every conf it needs
at runtime (sources/io.load_table does), never rely on session setup.

Oracle memoization (r15-opt, VERDICT r14 item 5 — TOOLING ONLY): the
DuckDB side of a sweep is deterministic in (oracle SQL, fixture files),
yet dominates the full sf0.1 sweep wall (~2.6 h, e.g. dedup_clusters'
recursive CTE alone 1,450 s). Oracle RESULTS are therefore cached under
tools/oracle_cache/ keyed on md5(oracle SQL + sf_dir + per-table file
size/mtime) — any change to a query's oracle or to a fixture misses the
cache and recomputes. The SPARK side is always computed fresh; nothing
in any timed/benched path reads this cache. Disable with
SPARK_GRAFT_ORACLE_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from mapreducenonequijoin_spark.session import get_spark  # noqa: E402
from mapreducenonequijoin_spark.sources.io import TABLES  # noqa: E402
from __spark_entry__ import oracle_sql, queries  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns {s_cols} != oracle {d_cols}")
    if problems:
        return problems
    for c in s_cols:
        sd, dd = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        # datetime64 unit (ns vs us) is a pandas conversion artifact:
        # both engines' logical type is a microsecond timestamp
        if sd.startswith("datetime64") and dd.startswith("datetime64"):
            continue
        if sd != dd:
            problems.append(f"col {c}: dtype {sd} != oracle {dd}")
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bf = pd.to_numeric(b[c]).to_numpy(dtype=float)
            ok = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(f"col {c}: value mismatch at sorted row {i}: {af[i]} vs {bf[i]}")
        else:
            if not (pd.Series(av).fillna("§null") == pd.Series(bv).fillna("§null")).all():
                neq = (pd.Series(av).fillna("§null") != pd.Series(bv).fillna("§null"))
                i = int(neq.idxmax())
                problems.append(f"col {c}: value mismatch at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_cache")


def _oracle_cache_key(name: str, sql: str, sf_dir: str) -> str:
    """Content key: the oracle SQL text plus the identity (path, size,
    mtime_ns) of every fixture table file — a fixture regeneration or
    an oracle edit both invalidate the entry."""
    h = hashlib.md5()
    h.update(sql.encode())
    h.update(sf_dir.encode())
    for t in sorted(TABLES):
        p = f"{sf_dir}/{t}.parquet"
        try:
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns};".encode())
        except OSError:
            h.update(f"{t}:missing;".encode())
    return f"{name}.{h.hexdigest()[:20]}.pkl"


def _oracle_fetch(con, name: str, sql: str, sf_dir: str) -> pd.DataFrame:
    """DuckDB result with on-disk memoization (see module docstring)."""
    if os.environ.get("SPARK_GRAFT_ORACLE_CACHE", "1") == "0":
        return con.execute(sql).fetchdf()
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR, _oracle_cache_key(name, sql, sf_dir))
    if os.path.exists(path):
        try:
            return pd.read_pickle(path)
        except Exception:  # noqa: BLE001 — corrupt entry: recompute
            pass
    pdf = con.execute(sql).fetchdf()
    tmp = path + ".tmp"
    pdf.to_pickle(tmp)
    os.replace(tmp, path)
    return pdf


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = _oracle_fetch(con, name, oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = _compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            passed.append(name)
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed"
        + (f": {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

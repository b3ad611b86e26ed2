"""Bit-exact comparison sweep: flags queries where Spark vs DuckDB
values differ AT ALL (the driver hash-compares; verify_local tolerates
1e-9). Reports only the gap set.

Usage: python tools/strict_check.py [--hashes out.json] [name ...]
Positional names restrict the sweep; --hashes additionally writes a
sha256 of each canonicalized Spark result, so two fresh-JVM runs can
be diffed for cross-session byte-identity (VERDICT r8 item 5 — the
GAP SET only proves Spark==DuckDB within one session; identical hash
files across sessions prove the results never moved between JVMs)."""
import hashlib
import json
import sys
sys.path.insert(0, ".")
import duckdb
import numpy as np
import pandas as pd
from mapreducenonequijoin_spark.session import get_spark
from mapreducenonequijoin_spark.sources.io import TABLES
from __spark_entry__ import oracle_sql, queries

args = sys.argv[1:]
hash_out = None
if args and args[0] == "--hashes":
    hash_out = args[1]
    args = args[2:]
only = set(args)

sf_dir = "/root/testdata/sf0.01"
spark = get_spark("strict")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, oracles = queries(), oracle_sql()
unknown = only - set(qs)
if unknown:
    # a path or typo silently filtering the sweep to nothing produced a
    # vacuous "GAP SET []" once (round 11) — fail loudly instead
    raise SystemExit(
        f"unknown query name(s) {sorted(unknown)} — positional args are "
        "registry keys, not an sf_dir (sf0.01 is hardcoded)"
    )
gap = []
hashes = {}
for name, fn in qs.items():
    if name not in oracles or (only and name not in only):
        continue
    try:
        s = canon(fn(spark, sf_dir).toPandas())
        if hash_out is not None:
            hashes[name] = hashlib.sha256(
                s.to_csv(index=False, float_format="%.17g").encode()
            ).hexdigest()
        d = canon(con.execute(oracles[name]).fetchdf())
    except Exception as e:
        print(f"ERR {name}: {e}", flush=True)
        continue
    if len(s) != len(d) or sorted(s.columns) != sorted(d.columns):
        print(f"SHAPE {name}", flush=True)
        continue
    exact = True
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(np.asarray(b).dtype, np.floating):
            af, bf = pd.to_numeric(s[c]).to_numpy(float), pd.to_numeric(d[c]).to_numpy(float)
            same = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not same.all():
                i = int(np.argmin(same))
                print(f"INEXACT {name}.{c}: {af[i]!r} vs {bf[i]!r} ({(~same).sum()} rows)", flush=True)
                exact = False
        else:
            if not (pd.Series(a).fillna("§") == pd.Series(b).fillna("§")).all():
                print(f"DIFF {name}.{c}", flush=True)
                exact = False
    if not exact:
        gap.append(name)
print("GAP SET:", gap, flush=True)
if hash_out is not None:
    with open(hash_out, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)

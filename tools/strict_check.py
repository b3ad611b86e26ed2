"""Bit-exact comparison sweep: flags queries where Spark vs DuckDB
values differ AT ALL (the driver hash-compares; verify_local tolerates
1e-9). Reports only the gap set."""
import sys
sys.path.insert(0, ".")
import duckdb
import numpy as np
import pandas as pd
from mapreducenonequijoin_spark.session import get_spark
from mapreducenonequijoin_spark.sources.io import TABLES
from __spark_entry__ import oracle_sql, queries

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
gap = []
for name, fn in qs.items():
    if name not in oracles:
        continue
    try:
        s = canon(fn(spark, sf_dir).toPandas())
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

#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: read each
queries() parquet dump, run the matching oracleSql in DuckDB over the
same sf tables, and compare (column names sorted, values compared with
exact equality after pandas normalization). Usage:
  python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
This is a builder-side dev tool only (driver-side python env), not part
of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{out_dir}/{name}")
        exp = con.sql(sql).df()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL  {name}: {type(e).__name__}: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                a = pd.to_datetime(a).astype("datetime64[ns]")
                b = pd.to_datetime(b).astype("datetime64[ns]")
                eq = a.equals(b)
            elif a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = ((a.astype(float) == b.astype(float)) | (a.isna() & b.isna())).all()
            else:
                eq = a.astype(object).equals(b.astype(object))
        except Exception as e:  # noqa: BLE001
            eq = False
            bad.append((c, f"compare error: {e}"))
        if not eq:
            diff = None
            try:
                m = ~((a == b) | (a.isna() & b.isna()))
                i = m.idxmax()
                diff = f"row {i}: {a[i]!r} != {b[i]!r}"
            except Exception:  # noqa: BLE001
                pass
            bad.append((c, diff))
    if bad:
        print(f"FAIL  {name}: {bad[:3]}")
        fails += 1
    else:
        print(f"OK    {name} ({len(got)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)

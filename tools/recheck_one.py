#!/usr/bin/env python3
"""Re-run the DuckDB oracle comparison for a SINGLE query (same logic
as check_oracle_par.check_one) and patch its record into an existing
CORRECTNESS-style artifact — for retrying a query whose first attempt
failed on infrastructure (e.g. ENOSPC during a parallel run).

Usage: python3 tools/recheck_one.py <out_dir> <sf_dir> <name> <artifact.json>
Builder-side dev tool only (driver python env), not part of the library.
"""
import json
import os
import sys

# anchor the import on this file's directory, not the cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle_par import check_one  # noqa: E402

out_dir, sf_dir, name, artifact = sys.argv[1:5]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if name not in oracle:
    print(f"unknown query '{name}'; available:", file=sys.stderr)
    for k in sorted(oracle):
        print(f"  {k}", file=sys.stderr)
    sys.exit(2)
n, rec, secs = check_one((name, oracle[name], out_dir, sf_dir))
status = "OK  " if rec["hash_match"] else "FAIL"
print(f"{status}  {n} ({rec['spark_rows']} rows, {secs:.1f}s)  "
      f"{rec['err'] or ''}", flush=True)
try:
    art = json.load(open(artifact))
except FileNotFoundError:
    art = {}
art[name] = rec
# atomic replace: never truncate the artifact on an interrupted dump
tmp = artifact + ".tmp"
with open(tmp, "w") as f:
    json.dump(art, f, indent=1, sort_keys=True)
os.replace(tmp, artifact)
sys.exit(0 if rec["hash_match"] else 1)

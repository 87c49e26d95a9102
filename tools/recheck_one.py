#!/usr/bin/env python3
"""Re-run the DuckDB oracle comparison for a SINGLE query (same logic
as check_oracle_par.check_one) and patch its record into an existing
CORRECTNESS-style artifact — for retrying a query whose first attempt
failed on infrastructure (e.g. ENOSPC during a parallel run).

Usage: python3 tools/recheck_one.py <out_dir> <sf_dir> <name> <artifact.json>
Builder-side dev tool only (driver python env), not part of the library.
"""
import json
import sys

sys.path.insert(0, "tools")
from check_oracle_par import check_one  # noqa: E402

out_dir, sf_dir, name, artifact = sys.argv[1:5]
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
n, rec, secs = check_one((name, sql, out_dir, sf_dir))
status = "OK  " if rec["hash_match"] else "FAIL"
print(f"{status}  {n} ({rec['spark_rows']} rows, {secs:.1f}s)  "
      f"{rec['err'] or ''}", flush=True)
try:
    art = json.load(open(artifact))
except FileNotFoundError:
    art = {}
art[name] = rec
json.dump(art, open(artifact, "w"), indent=1, sort_keys=True)
sys.exit(0 if rec["hash_match"] else 1)

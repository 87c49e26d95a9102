#!/usr/bin/env python3
"""Carry-aware variant of check_oracle_par.py for re-verifying a FINAL
tree at a big scale factor without re-paying multi-hour DuckDB oracle
queries that cannot have changed:

For each query in NEW_DIR's oracle_sql.json:
  - if OLD_ARTIFACT says hash_match, the oracle SQL text is IDENTICAL,
    and the NEW Spark parquet result is VALUE-IDENTICAL to the OLD one
    (machine-checked here, exact compare), the old verdict carries —
    the DuckDB side would re-run the same SQL over the same tables and
    compare against the same values. mode = "carried_equal_result".
  - otherwise the query is checked FRESH against DuckDB
    (mode = "fresh"), sharded across NPROCS workers.

This makes the carry a machine-checked equivalence, not an argument:
a changed plan/kernel that alters any value forces a fresh check.

Usage:
  python3 tools/check_oracle_carry.py NEW_DIR OLD_DIR OLD_ARTIFACT \
      SF_DIR NPROCS OUT_ARTIFACT [CARRY_ELIGIBLE]

CARRY_ELIGIBLE: optional comma-separated query names allowed to carry
(use for only the multi-hour oracle queries); every other query is
checked fresh even when its result is unchanged. Default: all eligible.

Builder-side dev tool only (driver python env).
"""
import json
import multiprocessing as mp
import sys

import pyarrow.parquet as pq

from check_oracle_par import check_one


def tables_equal(a, b) -> bool:
    if sorted(a.column_names) != sorted(b.column_names):
        return False
    if a.num_rows != b.num_rows:
        return False
    for c in a.column_names:
        if str(a.schema.field(c).type) != str(b.schema.field(c).type):
            return False
        if a.column(c).to_pylist() != b.column(c).to_pylist():
            return False
    return True


def main():
    new_dir, old_dir, old_art_path, sf_dir, nprocs, out_path = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
        int(sys.argv[5]), sys.argv[6])
    eligible = set(sys.argv[7].split(",")) if len(sys.argv) > 7 else None
    new_oracle = json.load(open(f"{new_dir}/oracle_sql.json"))
    old_oracle = json.load(open(f"{old_dir}/oracle_sql.json"))
    old_art = json.load(open(old_art_path))
    results, fresh = {}, []
    for name, sql in sorted(new_oracle.items()):
        rec = old_art.get(name)
        if (eligible is None or name in eligible) and rec \
                and rec.get("hash_match") and old_oracle.get(name) == sql:
            try:
                neq = tables_equal(pq.read_table(f"{new_dir}/{name}"),
                                   pq.read_table(f"{old_dir}/{name}"))
            except Exception:  # noqa: BLE001
                neq = False
            if neq:
                results[name] = dict(rec, mode="carried_equal_result")
                print(f"CARRY {name} ({rec['spark_rows']} rows)", flush=True)
                continue
        fresh.append((name, sql, new_dir, sf_dir))
    if fresh:
        with mp.Pool(nprocs) as pool:
            for name, rec, secs in pool.imap_unordered(check_one, fresh):
                results[name] = dict(rec, mode="fresh")
                status = "OK  " if rec["hash_match"] else "FAIL"
                extra = "" if rec["hash_match"] else f"  {rec['err']}"
                print(f"{status}  {name} ({rec['spark_rows']} rows, "
                      f"{secs:.1f}s){extra}", flush=True)
    results = {k: results[k] for k in sorted(results)}
    json.dump(results, open(out_path, "w"), indent=0)
    ok = sum(1 for r in results.values() if r["hash_match"])
    ncar = sum(1 for r in results.values()
               if r["mode"] == "carried_equal_result")
    print(f"\n{ok}/{len(new_oracle)} queries match "
          f"({ncar} carried by machine-checked result equality, "
          f"{len(new_oracle) - ncar} fresh)")
    sys.exit(0 if ok == len(new_oracle) else 1)


if __name__ == "__main__":
    main()

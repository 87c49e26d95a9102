#!/usr/bin/env python3
"""Driver for the full-scale sf10 oracle campaign (r14 verdict Missing
#3 → r15): runs check_oracle_par over the feasible query set and merges
the documented non-checks into a driver-CORRECTNESS-style artifact.

The non-check set is r13's 14 plus ss12 (r15): the IVF-family oracles
unroll the Lloyd chain as CTEs, which at sf10's corpus-scaled cell
count is a multi-billion-row join per round in DuckDB (INFEASIBLE);
cp02/sp06 exceeded 3h (TIMEOUT, measured r13); cp03/dd09 spill >70 GB
(SPILL, measured r13). Each non-check is covered engine-side by
Sf10SelfConsistencySpec.

Usage: python3 tools/sf10_oracle_campaign.py <verify_out> <sf_dir> <nprocs> <artifact>
"""
import json
import os
import subprocess
import sys

NONCHECKS = {
    "cp02_training_batches": "TIMEOUT: oracle timeout at sf10: DuckDB ran >3h (measured r13); covered by Sf10SelfConsistencySpec packing contract",
    "sp06_sequence_pack": "TIMEOUT: oracle timeout at sf10: DuckDB ran >3h (r13: 1h at sf1.0, ~10h at sf10); covered by Sf10SelfConsistencySpec packing contract",
    "cp03_manifest_v2": "SPILL: oracle spill exceeds this box's disk at sf10 (DuckDB temp >70 GB, measured r13); covered by Sf10SelfConsistencySpec keep-reason consistency",
    "dd09_cluster_keeper": "SPILL: oracle spill exceeds this box's disk at sf10 (DuckDB temp >70 GB, measured r13); covered by Sf10SelfConsistencySpec labeling conventions",
    "dd07_embedding_neardup": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells is a multi-billion-row DuckDB join per round; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "dd10_semantic_clusters": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss02_knn_ivf": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss04_knn_ivf_multiprobe": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss05_knn_recall_audit": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss07_knn_ivfpq": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss08_range_search": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss09_knn_filtered": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss10_range_filtered": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss11_ivf_cap_audit": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells; proof scale sf1.0 hash-green; sf10 covered by Sf10SelfConsistencySpec",
    "ss12_knn_ivf_adaptive": "INFEASIBLE: unrolled-Lloyd oracle at corpus-scaled cells (same chain as ss02); proof scale sf0.01/sf1.0/natural hash-green; sf10 covered by Sf10SelfConsistencySpec adaptive-dominance",
}


def main():
    out_dir, sf_dir, nprocs, artifact = sys.argv[1:5]
    sql_path = os.path.join(out_dir, "oracle_sql.json")
    with open(sql_path) as f:
        sql = json.load(f)
    missing = [q for q in NONCHECKS if q not in sql]
    if missing:
        print(f"WARNING: non-check queries absent from oracle_sql: {missing}")
    feasible = {q: s for q, s in sql.items() if q not in NONCHECKS}
    print(f"{len(sql)} queries; {len(feasible)} feasible, "
          f"{len(NONCHECKS)} documented non-checks")
    # check_oracle_par reads oracle_sql.json from out_dir: write the
    # feasible subset next to it and point the checker at a view dir
    with open(sql_path + ".full", "w") as f:
        json.dump(sql, f, indent=1)
    with open(sql_path, "w") as f:
        json.dump(feasible, f, indent=1)
    try:
        rc = subprocess.call([sys.executable, "tools/check_oracle_par.py",
                              out_dir, sf_dir, nprocs, artifact])
    finally:
        os.replace(sql_path + ".full", sql_path)
    with open(artifact) as f:
        res = json.load(f)
    for q, why in NONCHECKS.items():
        res[q] = {"rows_match": False, "schema_match": False,
                  "hash_match": False, "spark_rows": None,
                  "oracle_rows": None, "err": why}
    with open(artifact, "w") as f:
        json.dump(res, f, indent=1)
    green = sum(1 for v in res.values() if v.get("hash_match"))
    print(f"artifact {artifact}: {green}/{len(res)} hash-green, "
          f"{len(NONCHECKS)} documented non-checks (rc={rc})")


if __name__ == "__main__":
    main()

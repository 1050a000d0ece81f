#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_check.py <sf_dir> <verify_out_dir>

Loads each query's Spark parquet output from <verify_out_dir>/<name>/,
runs the matching oracle SQL from oracle_sql.json in DuckDB (with views
named after the testdata tables), and compares:
  - row count
  - schema (column names sorted, with types)
  - exact values (cells compared after sorting columns by name; rows in
    file order AND as sorted multiset, so we can tell ordering issues
    from value issues)
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v  # exact compare on purpose
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    results = {}
    # Expected set = full query list dumped by Verify (plus oracle keys as a
    # fallback), NOT just the directories that exist: a query that crashed in
    # Verify writes no directory and must show up as FAIL, not vanish.
    dirs = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    expected_file = Path(out_dir) / "query_names.json"
    expected = set(json.loads(expected_file.read_text())) if expected_file.exists() \
        else dirs | set(oracle)
    for name in sorted(expected | dirs):
        if name not in dirs:
            results[name] = {"status": "missing_output",
                             "error": "query wrote no output (crashed in Verify?)",
                             "ok": False}
            continue
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        spark_cols = list(spark_rel.columns)
        spark_types = [str(t) for t in spark_rel.types]
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            results[name] = {
                "status": "rows_only",
                "rows": len(spark_rows),
                "ok": len(spark_rows) > 0,
            }
            continue
        try:
            oracle_rel = con.sql(oracle[name])
            o_cols = list(oracle_rel.columns)
            o_types = [str(t) for t in oracle_rel.types]
            o_rows = oracle_rel.fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "error": str(e)[:300], "ok": False}
            continue

        entry = {"status": "compared", "rows_spark": len(spark_rows),
                 "rows_oracle": len(o_rows)}
        # column name sets
        entry["cols_match"] = sorted(spark_cols) == sorted(o_cols)
        if not entry["cols_match"]:
            entry["cols_spark"] = sorted(spark_cols)
            entry["cols_oracle"] = sorted(o_cols)
            entry["ok"] = False
            results[name] = entry
            continue
        # Oracle-side column TYPES must match the Spark parquet types:
        # the driver hashes typed values, so an un-cast HUGEINT (any
        # SUM over BIGINT DuckDB promotes) hash-mismatches even when
        # every Python int compares equal below. Compare DuckDB's view
        # of both relations per column name so that class fails HERE.
        s_tmap = dict(zip(spark_cols, spark_types))
        o_tmap = dict(zip(o_cols, o_types))
        type_diffs = {c: {"spark": s_tmap[c], "oracle": o_tmap[c]}
                      for c in s_tmap if s_tmap[c] != o_tmap[c]}
        entry["types_match"] = not type_diffs
        if type_diffs:
            entry["type_diffs"] = type_diffs
        # reorder columns by sorted name, like the driver
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        s_vals = [tuple(norm(r[i]) for i in s_idx) for r in spark_rows]
        o_vals = [tuple(norm(r[i]) for i in o_idx) for r in o_rows]
        entry["rows_match"] = len(s_vals) == len(o_vals)
        entry["values_in_order"] = s_vals == o_vals
        entry["values_as_set"] = sorted(map(repr, s_vals)) == sorted(map(repr, o_vals))
        entry["ok"] = (entry["rows_match"] and entry["values_in_order"]
                       and entry["types_match"])
        if not entry["ok"] and entry["rows_match"]:
            # show first mismatching row
            for i, (a, b) in enumerate(zip(s_vals, o_vals)):
                if a != b:
                    entry["first_diff"] = {"row": i, "spark": repr(a)[:300],
                                           "oracle": repr(b)[:300]}
                    break
        results[name] = entry

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    if json_out:  # machine-readable artifact (oracle-robustness sweeps)
        Path(json_out).write_text(json.dumps(results, indent=1, default=str))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_ok}/{len(results)} OK ==")
    for name, r in results.items():
        flag = "OK " if r.get("ok") else "FAIL"
        print(f"  [{flag}] {name} ({r['status']})")


if __name__ == "__main__":
    main()

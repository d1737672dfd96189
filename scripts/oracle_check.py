#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir parquet
tables, sorts columns by name + rows by all columns, and compares values
exactly. Exit 0 iff everything matches.
"""
import json
import os
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [cols[i] for i in order], [types[i] for i in order], rows


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    results = {}
    con = duckdb.connect()
    # let blocking operators spill — but CAPPED: the sf1-scale PQ
    # oracles otherwise fill the disk (observed 79 GB of temp blocks
    # before OOM). An oracle that cannot recompute inside the cap is
    # recorded as oracle-infeasible at that scale, not retried bigger.
    spill = os.environ.get("ORACLE_SPILL_DIR", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET max_temp_directory_size='20GB'")
    for t in TABLES:
        # driver testdata is one file per table; GenScale scale-ups are
        # directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    # A requested query that the dump doesn't know is an ERROR, not a
    # silent skip — stale outputs (e.g. after a failed compile) must not
    # read as green.
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL unknown queries (not in oracle_sql.json): {sorted(unknown)}")
        failed.extend(sorted(unknown))
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_cols, got_types, got = fetch_sorted(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want_cols, want_types, want = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            results[name] = {"match": False, "err": str(e)[:300]}
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            failed.append(name)
            results[name] = {"match": False, "err": "column mismatch"}
        # The real driver gate hashes typed values, so a HUGEINT-vs-BIGINT
        # divergence fails it even when stringified values agree (r1 q19).
        elif got_types != want_types:
            print(f"FAIL {name}: types {list(zip(got_cols, got_types))} != {list(zip(want_cols, want_types))}")
            failed.append(name)
            results[name] = {"match": False, "err": "type mismatch"}
        elif got != want:
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows", flush=True)
            diff_shown = 0
            gs, ws = set(got), set(want)
            for r in list(gs - ws)[:3]:
                print(f"   spark-only: {r}")
            for r in list(ws - gs)[:3]:
                print(f"   oracle-only: {r}")
            failed.append(name)
            results[name] = {"match": False,
                             "err": f"value mismatch ({len(got)} vs {len(want)} rows)"}
        else:
            print(f"OK   {name} ({len(got)} rows)")
            results[name] = {"match": True, "rows": len(got), "err": None}
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "checked": len(results),
                       "matched": sum(1 for r in results.values() if r["match"]),
                       "queries": results}, f, indent=1)
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()

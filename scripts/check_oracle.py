#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Reads the parquet dumps written by graft.Verify plus oracle_sql.json, runs
each oracle statement in DuckDB over the same source tables, and compares
row-by-row with columns sorted by name (the driver hashes values after a
column-name sort, so names, types, row order, and values must all line up).

Dev-only tool (driver-side python/duckdb stack); the Scala library never
depends on it.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision; exact-match policy
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(canon(v) for v in row) for row in
                         con.sql(f"SELECT {', '.join(want_cols)} FROM want").fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(canon(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark result unreadable: {str(e)[:300]}")
            n_fail += 1
            continue
        if want_cols != got_cols:
            print(f"FAIL {name}: columns differ  oracle={want_cols}  spark={got_cols}")
            n_fail += 1
            continue
        want_types = [str(t) for t in con.sql(f"DESCRIBE SELECT {', '.join(want_cols)} FROM want").fetchall()]
        got_types = [str(t) for t in con.sql(f"DESCRIBE SELECT {', '.join(got_cols)} FROM got").fetchall()]
        if want_types != got_types:
            print(f"WARN {name}: dtypes differ\n  oracle={want_types}\n  spark ={got_types}")
        if want_rows != got_rows:
            n_fail += 1
            print(f"FAIL {name}: rows differ  oracle={len(want_rows)} spark={len(got_rows)}")
            for i, (a, b) in enumerate(zip(want_rows, got_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n    oracle={a}\n    spark ={b}")
                    break
            else:
                if len(want_rows) != len(got_rows):
                    longer = want_rows if len(want_rows) > len(got_rows) else got_rows
                    who = "oracle" if len(want_rows) > len(got_rows) else "spark"
                    print(f"  extra row in {who}: {longer[min(len(want_rows), len(got_rows))]}")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(got_rows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets the builder run
the DuckDB-oracle compare without waiting for the driver).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

For every query dumped by graft.Verify: run the oracle SQL in DuckDB over
the same parquet tables, load the Spark parquet result, sort columns by
name, and compare row-by-row (exact, after canonicalising NaN/None).
"""
import json, sys, math
import duckdb

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            wcols, gcols = sorted(want.column_names), sorted(got.column_names)
            if wcols != gcols:
                print(f"FAIL {name}: columns want={wcols} got={gcols}")
                n_fail += 1
                continue
            want = want.select(wcols)
            got = got.select(gcols)
            if want.num_rows != got.num_rows:
                print(f"FAIL {name}: rows want={want.num_rows} got={got.num_rows}")
                n_fail += 1
                continue
            wrows = [tuple(canon(v) for v in r) for r in want.to_pylist()
                     for r in [list(r.values())]]
            grows = [tuple(canon(v) for v in r) for r in got.to_pylist()
                     for r in [list(r.values())]]
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(wrows, grows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: first diff at row {i}:\n  want={a}\n  got ={b} "
                      f"({len(bad)} rows differ, schema want={want.schema} got={got.schema})")
                n_fail += 1
            else:
                print(f"PASS {name} ({want.num_rows} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets the builder run
the DuckDB-oracle compare without waiting for the driver).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [subsetQuery ...]

With subset names (matching the trailing names passed to graft.Verify),
queries outside the subset are SKIPped before their oracle SQL runs.
WITHOUT a declared subset the run is treated as full-board: a missing
dump is a FAILURE (Verify swallows per-query exceptions and dumps
nothing for a crashed query — tallying that as a skip let automation
gating on the exit code pass a crashed query silently).

For every query dumped by graft.Verify: run the oracle SQL in DuckDB over
the same parquet tables, load the Spark parquet result, sort columns by
name, and compare row-by-row (exact, after canonicalising NaN/None).

Round-6 lesson: this gate passed 136/136 while the driver failed 4 —
value-equality alone is NOT the binding instrument. The driver sorts in
pandas and hashes dtyped columns, so it distinguishes shapes this script
used to collapse. Two hardenings replicate that behavior:

 1. DTYPE STRICTNESS — arrow schemas are canonicalised into the classes
    the driver's pandas hash distinguishes (all int widths fold to
    "int", float32/64 to "float", string flavors to "string"; DECIMAL
    stays its own class and therefore FAILS against int — exactly the
    x54/x62 miss where DuckDB's windowed SUM returns DECIMAL128 and
    Spark emits BIGINT with every value equal).
 2. SCALAR-ONLY — any list/struct/map column in either side's output is
    an immediate FAIL (the driver's pandas sorter dies on ndarray cells
    — the s10/s11 miss). The Scala-side twin of this rule is
    OutputContractSpec.
"""
import glob, json, sys, math
import duckdb
import pyarrow as pa


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def dtype_class(t):
    """Fold an arrow dtype into the equivalence class the driver's
    pandas sort+hash treats as one type. DECIMAL deliberately does NOT
    fold into int/float: pandas keeps it as object-dtype Decimal and the
    driver hash-fails it against int64 even when values are equal."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        # all decimal(p,s) fold together: pandas keeps them as
        # object-dtype Decimal where equal values hash equal regardless
        # of precision/scale (x48's decimal(31,1) vs decimal(27,1) is
        # driver-green) — but decimal NEVER folds into int/float
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    return str(t)


def nonscalar_cols(table):
    return [f.name for f in table.schema
            if pa.types.is_nested(f.type)]


def main(sf_dir, out_dir, subset=None):
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Shared-CTE materialization (round-10, ADVICE r9): 8 oracles embed
    # the trained-quantizer chain verbatim; materialize it ONCE into a
    # temp table and substitute an exact-text reference, instead of
    # retraining the quantizer per oracle query (the chain is ~10
    # Lloyd rounds — minutes each at sf0.1). Purely an optimization:
    # the SQL in oracle_sql.json stays self-contained and the driver
    # (which ignores oracle_shared.json) runs it unmodified.
    shared = {}
    shared_path = f"{out_dir}/oracle_shared.json"
    try:
        shared = json.load(open(shared_path))
    except FileNotFoundError:
        pass  # older Verify dumps carry no shared manifest — per-query SQL is self-contained
    except Exception as e:
        # a malformed manifest silently disables shared-CTE
        # materialization and every tcent oracle retrains the quantizer
        # from scratch (minutes each) — make the slow path attributable
        print(f"WARN {shared_path} exists but failed to load ({e}); "
              "falling back to per-query quantizer materialization", flush=True)
    materialized = set()

    def substitute_shared(sql):
        for key, ent in shared.items():
            if ent["chain"] in sql:
                if key not in materialized:
                    con.execute(ent["materialize"])
                    materialized.add(key)
                sql = sql.replace(ent["chain"], ent["replacement"])
        return sql

    n_pass = n_fail = n_skip = 0
    # a typo'd subset name would otherwise be silently ignored (the
    # loop only visits declared oracle keys)
    for unknown in sorted((subset or set()) - set(oracle)):
        print(f"FAIL {unknown}: declared in subset but no such oracle query")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            # subset runs (graft.Verify with trailing query names) dump
            # only some queries — when the caller DECLARES that subset,
            # skip the oracle SQL for everything else BEFORE running it
            # (some oracles are expensive by design: s12's 25-round
            # unroll at sf0.1 runs ~10 min). On an undeclared
            # (full-board) run a missing dump is a FAILURE, not a skip:
            # Verify swallows per-query exceptions, so "not in dump"
            # there means the query CRASHED — an exit-0 would let
            # automation pass it silently.
            if subset is not None and name not in subset:
                print(f"SKIP {name}: outside declared subset")
                n_skip += 1
                continue
            if not glob.glob(f"{out_dir}/{name}/*.parquet"):
                if subset is None:
                    print(f"FAIL {name}: not in dump on a full-board run "
                          f"(crashed inside Verify?)")
                    n_fail += 1
                else:
                    print(f"FAIL {name}: declared in subset but not in dump "
                          f"(crashed inside Verify?)")
                    n_fail += 1
                continue
            want = con.execute(substitute_shared(sql)).fetch_arrow_table()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            wcols, gcols = sorted(want.column_names), sorted(got.column_names)
            if wcols != gcols:
                print(f"FAIL {name}: columns want={wcols} got={gcols}")
                n_fail += 1
                continue
            want = want.select(wcols)
            got = got.select(gcols)
            # scalar-only contract: the driver's pandas sorter cannot
            # hash ndarray cells — any nested column is driver-red
            ns = sorted(set(nonscalar_cols(want) + nonscalar_cols(got)))
            if ns:
                print(f"FAIL {name}: non-scalar output columns {ns} "
                      f"(driver sorter crashes on list/struct/map)")
                n_fail += 1
                continue
            # dtype-strict: DECIMAL128 vs int64 must FAIL even with
            # equal values (the driver hashes them differently)
            wdt = [dtype_class(f.type) for f in want.schema]
            gdt = [dtype_class(f.type) for f in got.schema]
            if wdt != gdt:
                diffs = [f"{c}: want={a} got={b}"
                         for c, a, b in zip(wcols, wdt, gdt) if a != b]
                print(f"FAIL {name}: dtype mismatch {diffs}")
                n_fail += 1
                continue
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
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    names = set(sys.argv[3:]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))

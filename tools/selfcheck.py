#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from `outDir/oracle_sql.json` in DuckDB over the
sf parquet tables, loads the engine's `outDir/<name>/` parquet dump, and
compares: schema (column names), row count, and a hash over all values with
columns sorted by name and rows sorted canonically.

Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = ["\x1f".join(canon(v) for v in row) for row in zip(*data)]
    rows.sort()
    return cols, rows


def digest(cols, rows):
    h = hashlib.sha256()
    h.update("\x1e".join(cols).encode())
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    dirs = {n for n in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{n}")}
    for name in sorted(set(oracle) - dirs):
        print(f"✗ {name}: declared oracle but engine produced NO OUTPUT")
        failures += 1
    for name in sorted(dirs):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracle:
            n = got.num_rows if got is not None else -1
            print(f"  {name}: NO-ORACLE rows={n}")
            continue
        try:
            exp = con.sql(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        # Round-1 lesson: the driver's hash is decimal-representation-
        # sensitive (all 11 r1 hash failures were decimal-typed outputs while
        # this script's str() canonicalization passed them). Treat ANY
        # decimal column — on either side — as a hard failure so local green
        # implies driver green.
        dec_cols = [f.name for t in (got, exp) if t is not None
                    for f in t.schema if pa.types.is_decimal(f.type)]
        if dec_cols:
            failures += 1
            print(f"✗ {name}: BANNED decimal output column(s) {sorted(set(dec_cols))} "
                  "— emit BIGINT cents/micros instead (graft.functions.Exact)")
            continue
        gc, gr = table_rows(got)
        ec, er = table_rows(exp)
        ok_schema = gc == ec
        ok_rows = len(gr) == len(er)
        ok_hash = digest(gc, gr) == digest(ec, er)
        if ok_schema and ok_rows and ok_hash:
            print(f"✓ {name}: rows={len(gr)}")
        else:
            failures += 1
            print(f"✗ {name}: schema={ok_schema} rows={len(gr)}/{len(er)} hash={ok_hash}")
            if not ok_schema:
                print(f"    got cols {gc}\n    exp cols {ec}")
            elif not ok_hash:
                for i, (a, b) in enumerate(zip(gr, er)):
                    if a != b:
                        print(f"    first diff row {i}:\n      got {a[:300]}\n      exp {b[:300]}")
                        break
                if len(gr) != len(er):
                    print(f"    row count {len(gr)} vs {len(er)}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

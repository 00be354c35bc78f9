#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB-oracle compare (SURVEY §7.5).

Usage: python3 tools/crosscheck.py <verifyOutDir> <sfDir> [query ...]

Reads <verifyOutDir>/<name>/ (Spark parquet) and oracle_sql.json, runs each
oracle SQL in DuckDB 1.0 with views over <sfDir>/*.parquet, and compares:
row count, column names (sorted), and exact cell values row-by-row.
Stricter than any plausible driver hash — if this passes, a value-hash does.
"""
import json, sys, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact double compare via repr; both engines must emit the same bits
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values — do the same
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wperm = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        bad = 0
        for ri, (g, w) in enumerate(zip(got, want)):
            gr = [canon(g[i]) for i in gperm]
            wr = [canon(w[i]) for i in wperm]
            if gr != wr:
                if bad == 0:
                    print(f"FAIL {name}: row {ri}\n  spark : {gr}\n  oracle: {wr}")
                bad += 1
        if bad:
            print(f"  ({bad}/{len(got)} rows differ)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-only correctness checker replicating the driver's DuckDB oracle gate.

Reads the Verify output dir (spark parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same testdata parquet tables, and
compares: schema (column names sorted), row count, and values (rows sorted
by all columns). NOT part of the shipped library — the engine itself is
pure Scala/Spark.

Usage: tools/check.py [sfdir] [verify_outdir]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact-match discipline
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    vacuous = []  # gates that "pass" on 0 rows compare nothing (r10 t31)
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failed.append(name)
            continue
        try:
            duck_rel = con.sql(sql)
            d_cols = list(duck_rel.columns)
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        # Type parity: the driver's hasher distinguishes e.g. DuckDB HUGEINT
        # (list_sum/SUM results) from Spark BIGINT even when values agree.
        s_types = dict(zip(s_cols, [str(t) for t in spark_rel.types]))
        d_types = dict(zip(d_cols, [str(t) for t in duck_rel.types]))
        tdiff = {c: (s_types.get(c), d_types[c]) for c in d_types
                 if s_types.get(c) != d_types[c]}
        if tdiff:
            print(f"FAIL {name}: column types differ (spark, duck): {tdiff}")
            failed.append(name)
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failed.append(name)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            failed.append(name)
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first 3:")
            for a, b in bad[:3]:
                print(f"  spark={a}\n  duck ={b}")
            failed.append(name)
        else:
            if len(sr) == 0:
                vacuous.append(name)
                print(f"WARN {name}: VACUOUS gate — both sides 0 rows, "
                      f"nothing was actually compared")
            else:
                print(f"OK   {name} ({len(sr)} rows)")
    ok = len(oracle) - len(failed) - len(vacuous)
    tail = f", {len(vacuous)} vacuous" if vacuous else ""
    print(f"\n{ok}/{len(oracle)} queries match{tail}")
    if vacuous:
        print(f"vacuous (0-row) gates: {vacuous}")
    sys.exit(1 if failed or vacuous else 0)


if __name__ == "__main__":
    main()

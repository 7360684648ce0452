#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each
<outDir>/<name> parquet produced by graft.Verify, run the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sf parquet tables, and compare (schema, row count, values).

Usage: python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_df, duck_df):
    issues = []
    scols = sorted(spark_df.columns)
    dcols = sorted(duck_df.columns)
    if scols != dcols:
        return [f"schema cols differ: spark={scols} duck={dcols}"]
    if len(spark_df) != len(duck_df):
        issues.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
        return issues
    s = spark_df[scols].reset_index(drop=True)
    d = duck_df[dcols].reset_index(drop=True)
    n_bad = 0
    first = None
    for c in scols:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            a, b = norm(a), norm(b)
            eq = (a == b) or (a is None and b is None) or \
                 (isinstance(a, float) and isinstance(b, float) and a == b)
            # pandas NaT/None handling
            if not eq and pd.isna(a) and pd.isna(b):
                eq = True
            if not eq:
                n_bad += 1
                if first is None:
                    first = f"col={c} row={i}: spark={a!r} duck={b!r}"
    if n_bad:
        issues.append(f"{n_bad} cell mismatches; first: {first}")
    return issues


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            print(f"[warn] view {t}: {e}")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            bad.append((name, [f"spark result unreadable: {e}"]))
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            bad.append((name, [f"oracle SQL error: {e}"]))
            continue
        issues = compare(name, spark_df, duck_df)
        if issues:
            bad.append((name, issues))
        else:
            ok.append(name)
    for name in ok:
        print(f"  OK   {name}")
    for name, issues in bad:
        print(f" FAIL  {name}")
        for i in issues:
            print(f"       {i}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

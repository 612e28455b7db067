#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query parquet under verifyOutDir, runs the matching SQL from
oracle_sql.json in DuckDB (with the sfDir tables registered as views) and
compares schema (column names + values) and full row content in order.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    status = {}
    try:
        status = json.load(open(f"{out_dir}/status.json"))
    except FileNotFoundError:
        pass
    n_pass = n_fail = 0
    for name in sorted(set(list(oracle) + list(status))):
        if name not in oracle:
            print(f"[noora] {name}: no oracle (rows-only check), status={status.get(name)}")
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"[FAIL ] {name}: no spark result ({str(e).splitlines()[0]})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL ] {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            problems.append(
                f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            s = spark_df[sorted(spark_df.columns)]
            d = duck_df[sorted(duck_df.columns)]
            for c in s.columns:
                sv, dv = s[c].tolist(), d[c].tolist()
                if str(s[c].dtype) != str(d[c].dtype):
                    problems.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv))
                       if a != b and not (a != a and b != b)]
                if bad:
                    i, a, b = bad[0]
                    problems.append(
                        f"value[{c}] {len(bad)} diffs, first@{i}: spark={a!r} duck={b!r}")
        if problems:
            n_fail += 1
            print(f"[FAIL ] {name}: " + "; ".join(problems[:4]))
        else:
            n_pass += 1
            print(f"[ok   ] {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (the Spark result)
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    with the sf tables registered as views
  - compares: row count, column names (sorted), and exact values.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(spark_df)}")
            continue
        try:
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        problems = []
        if len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        if list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        if not problems:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                # dtype-KIND mismatch (int vs float) hash-diverges in the
                # driver even when values compare equal — DuckDB HUGEINT
                # results (count_if, integer //) come back as float64 while
                # Spark emits int64. r04 shipped exactly that (q70/x56/x61):
                # fail here so local can never be greener than the driver.
                fam = lambda k: "i" if k in "iu" else k
                if fam(a.dtype.kind) != fam(b.dtype.kind):
                    problems.append(f"col {c}: dtype kind spark={a.dtype} duck={b.dtype}")
                    continue
                try:
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        # bit-exact float64 compare (NaN payloads, ±0.0 and
                        # all): the driver gate HASHES values, so a `==`
                        # compare here could pass while the driver fails —
                        # r01 shipped exactly that discrepancy (x05/x12).
                        import numpy as np

                        av = a.astype("float64").to_numpy()
                        bv = b.astype("float64").to_numpy()
                        same = av.tobytes() == bv.tobytes()
                    else:
                        same = (a.astype(object).where(~a.isna(), None)
                                == b.astype(object).where(~b.isna(), None)).all()
                except Exception as e:
                    same = False
                    problems.append(f"col {c}: compare error {e}")
                if not same:
                    bad = (a != b) & ~(a.isna() & b.isna())
                    idx = list(bad[bad].index[:3])
                    problems.append(
                        f"col {c}: {int(bad.sum())} diffs, e.g. idx {idx} "
                        f"spark={[a.iloc[i] for i in idx]} duck={[b.iloc[i] for i in idx]}"
                    )
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            print(f"[ok] {name}: rows={len(spark_df)}")
    missing = sorted(set(oracle) - set(names))
    if missing:
        # a query that crashed in Verify writes no result dir — that IS a failure
        print(f"[FAIL] oracle entries with no result dir (query crashed?): {missing}")
        failures += len(missing)
    print(f"\n{len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

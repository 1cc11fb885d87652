#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB against
views over <sfDir>/*.parquet, load the Spark result parquet, sort columns by
name and rows by all columns, then compare cell-by-cell EXACTLY — floats
included (any nonzero difference is a failure; each float failure line shows
the absolute diff to aid debugging). Exit nonzero if any query mismatches.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()[:10] if type(v).__name__ == "date" else v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def compare(name, spark_df, oracle_df):
    issues = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_df) != len(oracle_df):
        return [f"row count mismatch: spark={len(spark_df)} oracle={len(oracle_df)}"]
    s = canon(spark_df)
    o = canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a, b = norm_cell(a), norm_cell(b)
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                issues.append(f"float diff col={c} row={i}: {a!r} vs {b!r} (d={abs(a - b):.3e})")
                if len(issues) > 5:
                    return issues
                continue
            issues.append(f"value diff col={c} row={i}: {a!r} ({type(a).__name__}) vs {b!r} ({type(b).__name__})")
            if len(issues) > 5:
                return issues
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        try:
            odf = con.execute(sql).arrow().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sdf = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL {name}: rows={len(sdf)}")
            for msg in issues[:6]:
                print(f"   {msg}")
            n_fail += 1
        else:
            print(f"OK   {name}: rows={len(sdf)}, cols={sorted(sdf.columns)}")
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle_sql:
            continue
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS {name}: {n}")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_fail += 1
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check — TYPE-STRICT.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB against
views over <sfDir>/*.parquet, load the Spark result parquet, and compare

  1. arrow column TYPES (strict: decimal128 vs int64, int32 vs int64, float vs
     double all FAIL — this is the class the driver's type-sensitive hash sees
     and that value-level comparison cannot, cf. round-4 verdict: 9 queries
     passed a value compare locally and hash-failed on the driver because
     DuckDB SUM(int) returns HUGEINT=decimal128(38,0) while Spark returns
     int64),
  2. values, cell-by-cell EXACTLY after sorting columns by name and rows by
     all columns — floats included (any nonzero diff fails).

A built-in self-test runs first on every invocation: a deliberately un-cast
DuckDB SUM(int) probe against an int64 Spark-like column MUST be flagged as a
type mismatch, otherwise the checker aborts — so the gate can never silently
regress back to type-blindness.

Exit nonzero if any query mismatches.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_key(t: pa.DataType) -> str:
    """Canonical key for an arrow type. Only equivalences PROVEN driver-equal
    are collapsed — i.e. type pairs that occur in queries hash-GREEN in
    CORRECTNESS_r04/r05:
      - integer widths (q49 rank int32 vs BIGINT, q53 grouping() int8 vs
        BIGINT, both green) — consistent with pandas value hashing, where
        every int width hashes by value;
      - timestamp units, tz-naive (q58 ts[ns] vs ts[us], green) — pandas
        converts both to datetime64;
      - string vs large_string / binary vs large_binary (reader-side artifact).
    Everything else stays distinct: decimal128 vs int64 is exactly the class
    that hash-failed 9 queries in r04 (DuckDB HUGEINT SUM), and float32 vs
    float64 has no green evidence so it stays strict."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_timestamp(t):
        return f"timestamp[tz={t.tz}]"
    return str(t)


def schema_diff(name, spark_schema: pa.Schema, oracle_schema: pa.Schema):
    s = {f.name: f.type for f in spark_schema}
    o = {f.name: f.type for f in oracle_schema}
    if sorted(s) != sorted(o):
        return [f"column mismatch: spark={sorted(s)} oracle={sorted(o)}"]
    out = []
    for c in sorted(s):
        if type_key(s[c]) != type_key(o[c]):
            out.append(f"TYPE mismatch col={c}: spark={s[c]} oracle={o[c]}")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    """Value-level canonicalization ONLY (types are checked separately above):
    dates/timestamps to iso strings so pandas Timestamp == datetime.date works."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()[:10] if type(v).__name__ == "date" else v.isoformat()
    return v


def compare_values(spark_df, oracle_df):
    issues = []
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


def self_test(con):
    """The checker must flag an un-cast DuckDB SUM(int) (HUGEINT) vs int64."""
    probe = con.execute("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)").arrow()
    sparklike = pa.table({"s": pa.array([3], type=pa.int64())})
    diff = schema_diff("selftest", sparklike.schema, probe.schema)
    if not any("TYPE mismatch" in d for d in diff):
        print("SELF-TEST FAILED: un-cast SUM(int) probe was NOT flagged — "
              "checker is type-blind, refusing to run")
        sys.exit(2)
    # and a cast one must pass
    probe2 = con.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)").arrow()
    if schema_diff("selftest2", sparklike.schema, probe2.schema):
        print("SELF-TEST FAILED: CAST(SUM(..) AS BIGINT) flagged as mismatch")
        sys.exit(2)


def main():
    # optional: --json <path> writes the per-query status map as the round's
    # committed correctness record (round-12 verdict item 1: the driver's
    # CORRECTNESS_r12.json shipped as an empty {} and nothing noticed — the
    # round close must produce its own full record and FAIL if it is empty).
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    # optional 3rd arg: comma-separated query names — check ONLY those
    # oracles (pairs with `graft.Verify <sf> <out> <names>` for iteration;
    # the full run still checks everything).
    only = set(argv[2].split(",")) if len(argv) > 2 else None
    record = {}
    con = duckdb.connect()
    self_test(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        missing = only - set(oracle_sql)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            sys.exit(2)
        oracle_sql = {k: v for k, v in oracle_sql.items() if k in only}
    n_fail = 0
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        try:
            otab = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = {"status": "fail", "issue": f"oracle SQL error: {e}"[:300]}
            n_fail += 1
            continue
        try:
            stab = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            record[name] = {"status": "fail", "issue": f"spark result unreadable: {e}"[:300]}
            n_fail += 1
            continue
        issues = schema_diff(name, stab.schema, otab.schema)
        if not issues:
            issues = compare_values(stab.to_pandas(), otab.to_pandas())
        if issues:
            print(f"FAIL {name}: rows={stab.num_rows}")
            for msg in issues[:6]:
                print(f"   {msg}")
            record[name] = {"status": "fail", "rows": stab.num_rows,
                            "issue": issues[0][:300]}
            n_fail += 1
        else:
            print(f"OK   {name}: rows={stab.num_rows}, cols={sorted(stab.schema.names)}")
            record[name] = {"status": "ok", "rows": stab.num_rows}
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle_sql:
            continue
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS {name}: {n}")
            record[name] = {"status": "rows_only", "rows": n}
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            record[name] = {"status": "fail", "issue": f"unreadable: {e}"[:300]}
            n_fail += 1
    if json_out:
        if not record:
            print(f"FAIL: refusing to write an EMPTY correctness record to {json_out}")
            sys.exit(2)
        # Pin the commit the record certifies (round-13 verdict item 7) —
        # without it the artifact cannot prove it covers HEAD — and whether
        # the working tree was DIRTY at check time (round-15: a dirty tree
        # means the pin names a commit that is not what ran; round_close.sh
        # refuses such a record).
        try:
            import subprocess
            commit = subprocess.check_output(
                ["git", "rev-parse", "HEAD"], text=True).strip()
        except Exception:
            commit = None
        try:
            import subprocess
            dirty = bool(subprocess.check_output(
                ["git", "status", "--porcelain"], text=True).strip())
        except Exception:
            dirty = None
        with open(json_out, "w") as f:
            json.dump({"n_queries": len(record),
                       "n_fail": n_fail,
                       "all_ok": n_fail == 0,
                       "sf_dir": sf_dir,
                       "commit": commit,
                       "dirty": dirty,
                       "queries": record}, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_out}: {len(record)} queries, {n_fail} failures")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

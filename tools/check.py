#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each parquet table as a DuckDB view
  3. runs every oracle_sql.json query, compares against the Spark
     parquet dump: row count, column names, and exact values
     (column-name-sorted, row-sorted).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def duck_canon_type(t: str) -> str:
    """Collapse DuckDB type spellings that hash identically driver-side.

    TIMESTAMP vs TIMESTAMP WITH TIME ZONE differ only in parquet logical
    annotation (Spark writes isAdjustedToUTC), and DATE vs TIMESTAMP both
    reach pandas as datetime64 (DuckDB date_trunc('day') yields DATE where
    Spark's yields midnight TIMESTAMP — r7 driver hashed those equal);
    everything else — notably HUGEINT vs BIGINT and INTEGER vs BIGINT —
    must match exactly.
    """
    t = t.replace(" WITH TIME ZONE", "")
    return "TIMESTAMP" if t == "DATE" else t

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Un-foolable gate: assert the FULL SparkEntry.queries key set is
    # present — a thrown query must show as a red row, never a missing key.
    keys_path = f"{out_dir}/query_keys.json"
    if os.path.exists(keys_path):
        all_keys = set(json.load(open(keys_path)))
        for name in sorted(all_keys):
            if not glob.glob(f"{out_dir}/{name}/*.parquet"):
                print(f"FAIL {name}: query key has NO spark output (dropped from dump)")
                n_bad += 1
        extra = set(oracle) - all_keys
        if extra:
            print(f"FAIL: oracle keys with no queries entry: {sorted(extra)}")
            n_bad += 1
    fails_path = f"{out_dir}/verify_failures.json"
    if os.path.exists(fails_path):
        for name, err in sorted(json.load(open(fails_path)).items()):
            print(f"FAIL {name}: threw during verify: {err[:300]}")
            n_bad += 1
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not glob.glob(f"{spark_path}/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_bad += 1
            continue
        try:
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        spark = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        d, s = canon(duck), canon(spark)
        if list(d.columns) != list(s.columns):
            print(f"FAIL {name}: columns duck={list(d.columns)} spark={list(s.columns)}")
            n_bad += 1
            continue
        if len(d) != len(s):
            print(f"FAIL {name}: rows duck={len(d)} spark={len(s)}")
            n_bad += 1
            continue
        # Schema probe at the DuckDB type level: the driver's hash is
        # dtype-sensitive, so an oracle emitting HUGEINT (uncast SUM of
        # BIGINT) or INTEGER where Spark wrote BIGINT must fail HERE,
        # even when pandas maps both to the same numpy dtype.
        dt = dict(con.sql(f"SELECT column_name, column_type FROM (DESCRIBE ({sql}))")
                  .fetchall())
        st = dict(con.sql(
            "SELECT column_name, column_type FROM (DESCRIBE ("
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')))")
            .fetchall())
        tmism = {c: (dt[c], st[c]) for c in dt
                 if duck_canon_type(dt[c]) != duck_canon_type(st.get(c, "?"))}
        if tmism:
            print(f"FAIL {name}: oracle/spark type mismatch: {tmism}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(d, s, check_dtype=True, check_exact=True)
            print(f"OK   {name}: {len(d)} rows")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

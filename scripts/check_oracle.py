#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Mimics the driver: for each query parquet in <verify_out_dir>, runs the
matching oracle SQL from oracle_sql.json in DuckDB (views over the sf
parquet tables), sorts columns by name, sorts rows, and compares values
exactly. Queries without oracle SQL get a rows>0 check.
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison: timestamps → ns, ints → int64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame):
    if sorted(a.columns) != sorted(b.columns):
        return f"COLUMNS differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS differ: spark={len(a)} oracle={len(b)}"
    # STRICT dtype family check (the r10 lesson): the driver's hash is
    # dtype-sensitive across the int/float divide — DuckDB SUM(BIGINT)
    # returns HUGEINT which pandas converts to float64, so an uncast sum
    # hash-mismatches an int64 Spark column even when every value is
    # equal. Flag the cross loudly instead of silently coercing.
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            return (f"DTYPE FAMILY differs in {c}: spark={a[c].dtype} oracle={b[c].dtype}"
                    " (driver hash would mismatch — CAST the oracle output to BIGINT)")
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            an, bn = av.astype(float).to_numpy(), bv.astype(float).to_numpy()
            eq = (an == bn) | (np.isnan(an) & np.isnan(bn))
            if not eq.all():
                i = int(np.argmin(eq))
                return f"VALUES differ in {c} (exact): row {i}: {an[i]!r} vs {bn[i]!r} (maxdiff={np.nanmax(np.abs(an-bn))})"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return f"VALUES differ in {c}: row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return None


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(out_dir.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(qdir.glob("*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = f"READ FAIL: {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY(!)")
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL: {e}"
            continue
        diff = compare(spark_df, odf)
        results[name] = "MATCH" if diff is None else diff
    missing = set(oracle) - {d.name for d in out_dir.iterdir() if d.is_dir()}
    for name, res in sorted(results.items()):
        print(f"{name:28s} {res}")
    for m in sorted(missing):
        print(f"{m:28s} SPARK OUTPUT MISSING")
    n_match = sum(1 for r in results.values() if r == "MATCH" or r.startswith("rows-only") and "OK" in r)
    print(f"\n{n_match}/{len(results)} OK  (duckdb {duckdb.__version__})")
    (out_dir / "check_manifest.json").write_text(json.dumps(
        {"duckdb_version": duckdb.__version__,
         "pandas_version": pd.__version__,
         "results": results}, indent=1))


if __name__ == "__main__":
    main()

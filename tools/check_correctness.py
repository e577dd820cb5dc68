"""Local mirror of the driver's correctness gate.

For every registry query: run the Spark builder and the DuckDB oracle on the
same sf dir, sort columns by name and rows by value, and compare exactly.
Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

from datafusion_ducklake_spark.queries import REGISTRY
from datafusion_ducklake_spark.queries._util import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object and len(s) and not isinstance(s.iloc[0], (str, bytes, type(None))):
            df[c] = s.astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if pd.api.types.is_float_dtype(a[c]):
                eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
            else:
                eq = (av == bv) | (pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy())
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(f"col {c}: first diff at row {i}: spark={av[i]!r} oracle={bv[i]!r} "
                                f"({int((~eq).sum())}/{len(eq)} rows differ)")
    return problems


def run_one(spark, con, name: str, sf_dir: str) -> list[str]:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    odf = con.sql(spec.oracle).df()
    return compare(name, sdf, odf)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    from datafusion_ducklake_spark.sparkutil import build_spark
    spark = build_spark("correctness-check", cpus=8)
    con = duckdb_con(sf_dir)
    failed = []
    for name in names:
        try:
            problems = run_one(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        status = "OK" if not problems else "FAIL"
        print(f"[{status}] {name}")
        for p in problems:
            print(f"       {p}")
        if problems:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed on {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

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


_NULL = "\x00NULL"


def _cell(x) -> str:
    """Canonical string form of one value: nulls unified, Decimal==float,
    dates/timestamps ISO, arrays recursed, bytes hexed. Numeric exactness
    is preserved via repr(float) (round-trips IEEE doubles)."""
    import datetime
    from decimal import Decimal
    if x is None:
        return _NULL
    if not isinstance(x, (list, tuple, np.ndarray, dict)):
        # arrays/lists are not isna-able (and numpy deprecates the
        # ambiguous truth value of an empty array)
        try:
            if pd.isna(x):
                return _NULL
        except (TypeError, ValueError):
            pass
    if isinstance(x, Decimal):
        # same canon as the float branch: one engine may surface a DECIMAL
        # column as float64 (duckdb .df()) while the other keeps Decimal —
        # integral values must render identically on both paths
        f = float(x)
        if f.is_integer() and abs(f) < 2 ** 63:
            return str(int(f))
        return repr(f)
    if isinstance(x, (np.bool_, bool)):
        return str(bool(x))
    if isinstance(x, (np.floating, float)):
        f = float(x)
        # DuckDB surfaces HUGEINT sums as float64; canonicalize integral
        # floats so SUM(bigint) compares equal across engines
        if f.is_integer() and abs(f) < 2 ** 63:
            return str(int(f))
        return repr(f)
    if isinstance(x, (np.integer, int)):
        return str(int(x))
    if isinstance(x, (pd.Timestamp, datetime.datetime)):
        # engines disagree on whether DATE comes back as date or midnight
        # timestamp (duckdb .df() varies) — canonicalize midnight to date
        if (x.hour, x.minute, x.second, x.microsecond) == (0, 0, 0, 0):
            return x.date().isoformat()
        return x.isoformat()
    if isinstance(x, datetime.date):
        return x.isoformat()
    if isinstance(x, (bytes, bytearray)):
        return bytes(x).hex()
    if isinstance(x, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(e) for e in x) + "]"
    return str(x)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = [_cell(x) for x in df[c]]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def binary_columns(df: pd.DataFrame) -> list[str]:
    """Columns containing raw bytes/bytearray cells. The driver's pandas
    canonicalizer sorts object columns as-is and crashes on bytearrays
    (r4 CORRECTNESS: `TypeError: unhashable type: 'bytearray'`), while
    this checker hexes them in _cell() — so a binary output column can
    pass locally yet fail the gate. Flag it as a hard local failure
    (r4 verdict "What's wrong" #2): gate queries must project a digest
    (md5/hex) instead of raw payload bytes."""
    out = []
    for c in df.columns:
        if df[c].dtype == object and any(
                isinstance(x, (bytes, bytearray)) for x in df[c]):
            out.append(c)
    return out


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame,
            strict_dtypes: bool = True) -> list[str]:
    problems = []
    # registry/driver-parity mode only: the slt runner (strict_dtypes=
    # False) compares BLOB columns engine-vs-mirror locally, where _cell's
    # hexing is correct and no driver canonicalizer is involved
    if strict_dtypes:
        for side, df in (("spark", spark_df), ("oracle", oracle_df)):
            for c in binary_columns(df):
                problems.append(
                    f"col {c} ({side}): raw binary cells — the driver's "
                    f"canonicalizer cannot sort bytearrays; project "
                    f"md5()/hex() in the gate query instead")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    # The driver's value-hash is representation-strict: DuckDB surfacing
    # SUM(BIGINT) as HUGEINT->float64 while Spark returns int64 fails there
    # even though _cell() canonicalizes it away here. Flag kind mismatches
    # as hard failures so oracle-typing bugs are caught locally (round-3
    # verdict "What's wrong #1"). The slt runner compares against raw
    # DuckDB mirror SQL (no repo-authored casts) and passes
    # strict_dtypes=False — only value equality matters there.
    for c in sorted(spark_df.columns) if strict_dtypes else []:
        sk = spark_df[c].dtype.kind
        ok = oracle_df[c].dtype.kind
        if {sk, ok} == {"i", "f"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype} (driver hash would fail — "
                f"CAST the oracle aggregate to BIGINT/DOUBLE to match)")
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            eq = av == bv
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(f"col {c}: first diff at row {i}: spark={av[i]!r} oracle={bv[i]!r} "
                                f"({int((~eq).sum())}/{len(eq)} rows differ)")
    return problems


def run_one(spark, con, name: str, sf_dir: str) -> list[str]:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return [f"col {c}: raw binary cells (driver canonicalizer crash)"
                for c in binary_columns(sdf)]
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

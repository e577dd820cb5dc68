"""Official TPC-H (22) and TPC-DS (99) query texts, cross-engine.

The reference benchmarks the ACTUAL suite texts (benchmark/src/tpch.rs,
tpcds.rs:52-66); DuckDB's bundled tpch/tpcds extensions ship those texts
plus the official generators, both available offline — so this runs every
official query through OUR engine's SQL surface (Spark over the generated
parquet) AND DuckDB, and compares full result sets exactly (2dp on
numerics — decimal-vs-double rendering differs, values must not).

Dialect shim applied to the Spark side only: ANSI double-quoted
identifiers become backticks (Spark's quoting); everything else runs
verbatim.

Usage:
    python tools/official_suites.py [sf] [--tpch-only|--tpcds-only]
Prints one JSON line and writes OFFICIAL_SUITES.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TPCH_TABLES = ["region", "nation", "customer", "supplier", "part",
               "partsupp", "orders", "lineitem"]


def dq_to_backticks(sql: str) -> str:
    """ANSI "quoted identifiers" -> Spark `backticks`, leaving
    single-quoted string literals untouched."""
    out, in_str, in_ident = [], False, False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    out.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == '"':
            out.append("`")
            in_ident = not in_ident
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def build_fixture(kind: str, sf: float) -> tuple[str, list[str]]:
    """Generate (once, cached by sf) the official data as parquet."""
    import duckdb
    tag = str(sf).replace(".", "_")
    root = f"/tmp/{kind}_official_{tag}"
    done = f"{root}/.done"
    if os.path.exists(done):
        return root, open(done).read().split(",")
    os.makedirs(root, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"LOAD {kind}")
    con.execute(f"CALL {'dbgen' if kind == 'tpch' else 'dsdgen'}(sf={sf})")
    tables = ([t for t in TPCH_TABLES] if kind == "tpch"
              else [r[0] for r in con.sql("SHOW TABLES").fetchall()])
    for t in tables:
        con.execute(f"COPY {t} TO '{root}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    with open(done, "w") as f:
        f.write(",".join(tables))
    return root, tables


def query_texts(kind: str) -> list[tuple[int, str]]:
    import duckdb
    con = duckdb.connect()
    con.execute(f"LOAD {kind}")
    return con.sql(
        f"SELECT query_nr, query FROM {kind}_queries()").fetchall()


def _cell(v):
    if isinstance(v, (float, Decimal)):
        return round(float(v), 2)
    return None if v is None else str(v)


def normalize(rows) -> list[tuple]:
    return sorted((tuple(_cell(v) for v in r) for r in rows),
                  key=lambda r: tuple((x is None, str(x)) for x in r))


def run_suite(spark, kind: str, sf: float,
              only: "set[int] | None" = None) -> dict:
    """Every suite text runs on the engine THROUGH the DuckLake catalog
    (CTAS'd tables, scan_table read path) vs DuckDB over the same
    parquet — so the official queries exercise the full lake stack, not
    a bare parquet view."""
    import duckdb

    from datafusion_ducklake_spark.catalog import DuckLakeSession
    root, tables = build_fixture(kind, sf)
    db = f"{root}/ducklake_catalog.sqlite"
    marker = f"{root}/.lake_done"
    if not os.path.exists(marker):
        if os.path.exists(db):
            os.remove(db)
        dl = DuckLakeSession(spark, db, data_path=f"{root}/lake")
        for t in tables:
            dl.create_table(f"main.{t}", spark.read.parquet(
                f"{root}/{t}.parquet"), single_file=False)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        dl = DuckLakeSession(spark, db)
    dl.register_views()
    ducks = duckdb.connect()
    for t in tables:
        ducks.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{root}/{t}.parquet')")
    ok, failed = [], []
    spark_s = duck_s = 0.0
    for n, q in query_texts(kind):
        if only is not None and n not in only:
            continue
        try:
            t0 = time.time()
            ours = [tuple(r) for r in dl.sql(dq_to_backticks(q)).collect()]
            spark_s += time.time() - t0
            t0 = time.time()
            theirs = ducks.sql(q).fetchall()
            duck_s += time.time() - t0
            if normalize(ours) == normalize(theirs):
                ok.append(n)
            else:
                failed.append({"query": n, "kind": "mismatch",
                               "rows": [len(ours), len(theirs)]})
        except Exception as e:
            failed.append({"query": n, "kind": "error",
                           "detail": " ".join(str(e).split())[:160]})
    ducks.close()
    return {"ok": ok, "failed": failed, "n_ok": len(ok),
            "spark_sec": round(spark_s, 2), "duckdb_sec": round(duck_s, 2)}


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("-") else 0.01
    from datafusion_ducklake_spark.sparkutil import build_spark
    spark = build_spark("official-suites",
                        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf": sf}
    if "--tpcds-only" not in sys.argv:
        out["tpch"] = run_suite(spark, "tpch", sf)
    if "--tpch-only" not in sys.argv:
        out["tpcds"] = run_suite(spark, "tpcds", sf)
    line = json.dumps(out)
    (REPO / "OFFICIAL_SUITES.json").write_text(json.dumps(out, indent=1))
    print(line)


if __name__ == "__main__":
    main()

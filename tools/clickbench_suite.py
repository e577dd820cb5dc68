"""Run the official ClickBench query texts cross-engine.

The reference vendors the 40 adapted ClickBench queries
(tests/sqllogictests/sql/clickbench/clickbench.test_slow) but marks the
file ``mode skip`` — it needs the real 14 GB hits.parquet. Offline, we
run the SAME texts over a DETERMINISTIC synthetic ``hits`` table
(hash-derived columns, seeded constants for the queries' literal
filters) loaded through the DuckLake engine, and compare every result
against DuckDB on identical data.

Two documented adaptations, applied IDENTICALLY to both engines:
- ``ORDER BY ... LIMIT`` clauses gain deterministic tie-break keys
  (the group-by columns). Any tie choice is a valid answer to the
  official text; the augmentation just makes cross-engine equality
  checkable on data where count ties are common.
- Spark-side dialect shims only: STRLEN -> length, regex backreference
  ``\\1`` -> ``$1``, and q31's literal-ordinal GROUP BY 1 (DuckDB groups
  by the constant; Spark rejects literal grouping, which is a no-op).

Usage: python tools/clickbench_suite.py [rows]
Prints one JSON line and writes CLICKBENCH.json at the repo root.
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

HITS_GEN = """
CREATE TABLE hits AS
SELECT
  (hash(i * 131) % 40000)::BIGINT               AS WatchID,
  CASE WHEN i % 997 = 0 THEN 435090932899640449
       ELSE (hash(i * 7) % 2000)::BIGINT END    AS UserID,
  CASE WHEN i % 10 < 6 THEN 62
       ELSE (1 + hash(i * 13) % 80)::INT END    AS CounterID,
  (hash(i * 17) % 3000)::INT                    AS ClientIP,
  (1 + hash(i * 19) % 60)::INT                  AS RegionID,
  (CASE WHEN i % 5 = 0 THEN 1 + hash(i * 23) % 8 ELSE 0 END)::SMALLINT
                                                AS AdvEngineID,
  (hash(i * 29) % 12)::SMALLINT                 AS SearchEngineID,
  ((hash(i * 31) % 9)::INT - 1)::SMALLINT       AS TraficSourceID,
  (hash(i * 37) % 4)::SMALLINT                  AS MobilePhone,
  CASE WHEN i % 3 = 0 THEN ''
       ELSE 'model_' || (hash(i * 41) % 25) END AS MobilePhoneModel,
  CASE WHEN i % 4 = 0 THEN ''
       ELSE 'phrase ' || (hash(i * 43) % 300) END AS SearchPhrase,
  CASE WHEN i % 11 = 0 THEN ''
       WHEN i % 7 = 0 THEN 'http://google.com/page' || (hash(i * 47) % 120)
       ELSE 'http://site' || (hash(i * 53) % 40) || '.com/p'
            || (hash(i * 59) % 200) END         AS URL,
  CASE WHEN i % 13 = 0 THEN ''
       WHEN i % 9 = 0 THEN 'Google results ' || (hash(i * 61) % 50)
       ELSE 'Title ' || (hash(i * 67) % 150) END AS Title,
  CASE WHEN i % 6 = 0 THEN ''
       WHEN i % 2 = 0 THEN 'http://www.domain0.com/ref'
            || (hash(i * 71) % 90)
       ELSE 'https://d' || (hash(i * 73) % 3) || '.org/r'
            || (hash(i * 79) % 90) END          AS Referer,
  (DATE '2013-07-01' + ((hash(i * 83) % 62)::INT) * INTERVAL 1 DAY)::DATE
                                                AS EventDate,
  TIMESTAMP '2013-07-01 00:00:00'
      + ((hash(i * 89) % 5356800)::BIGINT) * INTERVAL 1 SECOND
                                                AS EventTime,
  (hash(i * 97) % 2)::SMALLINT                  AS IsRefresh,
  (hash(i * 101) % 2)::SMALLINT                 AS IsLink,
  (CASE WHEN i % 17 = 0 THEN 1 ELSE 0 END)::SMALLINT AS IsDownload,
  (CASE WHEN i % 19 = 0 THEN 1 ELSE 0 END)::SMALLINT AS DontCountHits,
  (800 + (hash(i * 103) % 1200))::INT           AS ResolutionWidth,
  (200 + (hash(i * 107) % 1800))::INT           AS WindowClientWidth,
  (100 + (hash(i * 109) % 1200))::INT           AS WindowClientHeight,
  CASE WHEN i % 37 = 0 THEN 2868770270353813622
       ELSE (hash(i * 113) % 100000)::BIGINT END AS URLHash,
  CASE WHEN i % 41 = 0 THEN 3594120000172545465
       ELSE (hash(i * 127) % 100000)::BIGINT END AS RefererHash
FROM range({rows}) t(i)
"""

# The 40 vendored texts (clickbench.test_slow), `ducklake.hits` -> hits,
# with the deterministic tie-break keys appended to LIMITed ORDER BYs.
QUERIES = [
 "SELECT COUNT(*) FROM hits",
 "SELECT COUNT(*) FROM hits WHERE AdvEngineID <> 0",
 "SELECT SUM(AdvEngineID), COUNT(*), AVG(ResolutionWidth) FROM hits",
 "SELECT AVG(UserID) FROM hits",
 "SELECT COUNT(DISTINCT UserID) FROM hits",
 "SELECT COUNT(DISTINCT SearchPhrase) FROM hits",
 "SELECT MIN(EventDate), MAX(EventDate) FROM hits",
 "SELECT AdvEngineID, COUNT(*) FROM hits WHERE AdvEngineID <> 0 "
 "GROUP BY AdvEngineID ORDER BY COUNT(*) DESC",
 "SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits GROUP BY RegionID "
 "ORDER BY u DESC, RegionID LIMIT 10",
 "SELECT RegionID, SUM(AdvEngineID), COUNT(*) AS c, AVG(ResolutionWidth), "
 "COUNT(DISTINCT UserID) FROM hits GROUP BY RegionID "
 "ORDER BY c DESC, RegionID LIMIT 10",
 "SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits "
 "WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel "
 "ORDER BY u DESC, MobilePhoneModel LIMIT 10",
 "SELECT MobilePhone, MobilePhoneModel, COUNT(DISTINCT UserID) AS u "
 "FROM hits WHERE MobilePhoneModel <> '' "
 "GROUP BY MobilePhone, MobilePhoneModel "
 "ORDER BY u DESC, MobilePhone, MobilePhoneModel LIMIT 10",
 "SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' "
 "GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10",
 "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits "
 "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
 "ORDER BY u DESC, SearchPhrase LIMIT 10",
 "SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits "
 "WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase "
 "ORDER BY c DESC, SearchEngineID, SearchPhrase LIMIT 10",
 "SELECT UserID, COUNT(*) FROM hits GROUP BY UserID "
 "ORDER BY COUNT(*) DESC, UserID LIMIT 10",
 "SELECT UserID, COALESCE(NULLIF(SearchPhrase, ''), NULL) AS SearchPhrase "
 ", COUNT(*) FROM hits GROUP BY UserID, "
 "COALESCE(NULLIF(SearchPhrase, ''), NULL) "
 "ORDER BY COUNT(*) DESC, UserID, SearchPhrase LIMIT 10",
 "SELECT COUNT(*) AS count FROM (SELECT UserID, SearchPhrase FROM "
 "(SELECT UserID, SearchPhrase, COUNT(*) FROM hits "
 "GROUP BY UserID, SearchPhrase LIMIT 10) "
 "GROUP BY UserID, SearchPhrase) t",
 "SELECT * FROM (SELECT UserID, extract(minute FROM EventTime) AS m, "
 "COALESCE(NULLIF(SearchPhrase, ''), NULL) AS p, COUNT(*) FROM hits "
 "GROUP BY UserID, m, COALESCE(NULLIF(SearchPhrase, ''), NULL) "
 "ORDER BY COUNT(*) DESC, UserID, m, p LIMIT 10) ORDER BY 4 DESC, 1, 2, 3",
 "SELECT UserID FROM hits WHERE UserID = 435090932899640449",
 "SELECT COUNT(*) FROM hits WHERE URL LIKE '%google%'",
 "SELECT * FROM (SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits "
 "WHERE URL LIKE '%google%' AND SearchPhrase <> '' GROUP BY SearchPhrase "
 "ORDER BY c DESC, SearchPhrase LIMIT 10) "
 "ORDER BY c DESC, SearchPhrase LIMIT 8",
 "SELECT * FROM (SELECT SearchPhrase, MIN(URL), MIN(Title), COUNT(*) AS c, "
 "COUNT(DISTINCT UserID) FROM hits WHERE Title LIKE '%Google%' AND "
 "URL NOT LIKE '%.google.%' AND SearchPhrase <> '' GROUP BY SearchPhrase "
 "ORDER BY c DESC, SearchPhrase LIMIT 10) "
 "ORDER BY c DESC, SearchPhrase LIMIT 10",
 "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' "
 "ORDER BY SearchPhrase LIMIT 10",
 "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' "
 "ORDER BY EventTime, SearchPhrase LIMIT 10",
 "SELECT CounterID, AVG(STRLEN(URL)) AS l, COUNT(*) AS c FROM hits "
 "WHERE URL <> '' GROUP BY CounterID HAVING COUNT(*) > 100000 "
 "ORDER BY l DESC, CounterID LIMIT 25",
 "SELECT REGEXP_REPLACE(Referer, '^https?://(?:www\\.)?([^/]+)/.*$', "
 "'\\1') AS k, AVG(STRLEN(Referer)) AS l, COUNT(*) AS c, MIN(Referer) "
 "FROM hits WHERE Referer <> '' GROUP BY k "
 "HAVING COUNT(*) > 100000 ORDER BY l DESC, k LIMIT 25",
 None,  # q27 (the 90-SUM query) inserted programmatically below
 "SELECT * FROM (SELECT * FROM (SELECT SearchEngineID, ClientIP, "
 "COUNT(*) AS c, SUM(IsRefresh), AVG(ResolutionWidth) FROM hits "
 "WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP "
 "ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 10) "
 "ORDER BY c DESC, SearchEngineID, ClientIP) "
 "ORDER BY c DESC, SearchEngineID, ClientIP LIMIT 9",
 "SELECT MIN(c), MAX(c), COUNT(*) FROM (SELECT WatchID, ClientIP, "
 "COUNT(*) AS c, SUM(IsRefresh), AVG(ResolutionWidth) FROM hits "
 "WHERE SearchPhrase <> '' GROUP BY WatchID, ClientIP) t",
 "SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL "
 "ORDER BY c DESC, URL LIMIT 10",
 "SELECT 1, URL, COUNT(*) AS c FROM hits GROUP BY 1, URL "
 "ORDER BY c DESC, URL LIMIT 10",
 "SELECT ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3, "
 "COUNT(*) AS c FROM hits GROUP BY ClientIP, ClientIP - 1, "
 "ClientIP - 2, ClientIP - 3 ORDER BY c DESC, ClientIP LIMIT 10",
 "SELECT URL, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND "
 "EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND "
 "DontCountHits = 0 AND IsRefresh = 0 AND URL <> '' GROUP BY URL "
 "ORDER BY PageViews DESC, URL LIMIT 10",
 "SELECT Title, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND "
 "EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND "
 "DontCountHits = 0 AND IsRefresh = 0 AND Title <> '' GROUP BY Title "
 "ORDER BY PageViews DESC, Title LIMIT 10",
 "SELECT MIN(PageViews), MAX(PageViews), COUNT(*) FROM (SELECT URL, "
 "COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND "
 "EventDate >= '2013-07-01' AND EventDate <= '2013-07-31' AND "
 "IsRefresh = 0 AND IsLink <> 0 AND IsDownload = 0 GROUP BY ALL "
 "ORDER BY PageViews DESC, URL LIMIT 10 OFFSET 1000) t",
 "SELECT MIN(PageViews), MAX(PageViews), COUNT(*) FROM (SELECT "
 "TraficSourceID, SearchEngineID, AdvEngineID, CASE WHEN "
 "(SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END "
 "AS Src, URL AS Dst, COUNT(*) AS PageViews FROM hits WHERE "
 "CounterID = 62 AND EventDate >= '2013-07-01' AND "
 "EventDate <= '2013-07-31' AND IsRefresh = 0 GROUP BY TraficSourceID, "
 "SearchEngineID, AdvEngineID, Src, Dst ORDER BY PageViews DESC, "
 "TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst "
 "LIMIT 10 OFFSET 1000) t",
 "SELECT * FROM (SELECT URLHash, EventDate, COUNT(*) AS PageViews FROM "
 "hits WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND "
 "EventDate <= '2013-07-31' AND IsRefresh = 0 AND TraficSourceID IN "
 "(-1, 6) AND RefererHash = 3594120000172545465 GROUP BY URLHash, "
 "EventDate ORDER BY PageViews DESC, URLHash, EventDate "
 "LIMIT 10 OFFSET 100) t ORDER BY PageViews DESC, URLHash, EventDate "
 "OFFSET 2 LIMIT 5",
 "SELECT MIN(PageViews), MAX(PageViews), COUNT(*) FROM (SELECT "
 "WindowClientWidth, WindowClientHeight, COUNT(*) AS PageViews FROM hits "
 "WHERE CounterID = 62 AND EventDate >= '2013-07-01' AND "
 "EventDate <= '2013-07-31' AND IsRefresh = 0 AND DontCountHits = 0 AND "
 "URLHash = 2868770270353813622 GROUP BY WindowClientWidth, "
 "WindowClientHeight ORDER BY PageViews DESC, WindowClientWidth, "
 "WindowClientHeight LIMIT 10 OFFSET 10000) t",
 "SELECT DATE_TRUNC('minute', EventTime) AS M, COUNT(*) AS PageViews "
 "FROM hits WHERE CounterID = 62 AND EventDate >= '2013-07-14' AND "
 "EventDate <= '2013-07-15' AND IsRefresh = 0 AND DontCountHits = 0 "
 "GROUP BY DATE_TRUNC('minute', EventTime) "
 "ORDER BY DATE_TRUNC('minute', EventTime) LIMIT 10 OFFSET 1000",
]
QUERIES[27] = ("SELECT " + ", ".join(
    f"SUM(ResolutionWidth + {k})" if k else "SUM(ResolutionWidth)"
    for k in range(90)) + " FROM hits")


def spark_dialect(q: str) -> str:
    q = q.replace("STRLEN(", "length(")
    q = q.replace("'\\1'", "'$1'")
    # literal ordinal grouping (q31): Spark rejects grouping by the
    # constant; dropping it is a semantic no-op
    q = q.replace("GROUP BY 1, URL", "GROUP BY URL")
    # Spark only accepts LIMIT-then-OFFSET order (q37)
    q = q.replace("OFFSET 2 LIMIT 5", "LIMIT 5 OFFSET 2")
    return q


def _cell(v):
    if isinstance(v, (float, Decimal)):
        return float(f"{float(v):.10g}")
    return None if v is None else str(v)


def normalize(rows) -> list[tuple]:
    return sorted((tuple(_cell(v) for v in r) for r in rows),
                  key=lambda r: tuple((x is None, str(x)) for x in r))


def run(rows: int = 200_000, spark=None) -> dict:
    import duckdb

    from datafusion_ducklake_spark.catalog import DuckLakeSession

    root = f"/tmp/clickbench_synth_{rows}"
    pq_path = f"{root}/hits.parquet"
    if not os.path.exists(pq_path):
        os.makedirs(root, exist_ok=True)
        con = duckdb.connect()
        con.execute(HITS_GEN.format(rows=rows))
        con.execute(f"COPY hits TO '{pq_path}' (FORMAT PARQUET)")
        con.close()

    if spark is None:
        from datafusion_ducklake_spark.sparkutil import build_spark
        spark = build_spark("clickbench",
                            cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
        spark.sparkContext.setLogLevel("ERROR")

    # the engine side reads hits THROUGH the DuckLake scan (catalog
    # table), not a bare parquet view — the reference's COPY FROM
    # DATABASE shape
    db = f"{root}/cb_catalog.sqlite"
    if not os.path.exists(db):
        dl = DuckLakeSession(spark, db, data_path=f"{root}/lake")
        dl.create_table("main.hits", spark.read.parquet(pq_path),
                        single_file=False)
    else:
        dl = DuckLakeSession(spark, db)
    dl.register_views()

    ducks = duckdb.connect()
    ducks.sql(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{pq_path}')")

    ok, failed = [], []
    spark_s = duck_s = 0.0
    for n, q in enumerate(QUERIES):
        try:
            t0 = time.time()
            ours = [tuple(r) for r in dl.sql(spark_dialect(q)).collect()]
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
                           "detail": " ".join(str(e).split())[:200]})
    ducks.close()
    return {"rows": rows, "ok": ok, "failed": failed, "n_ok": len(ok),
            "n_total": len(QUERIES),
            "spark_sec": round(spark_s, 2), "duckdb_sec": round(duck_s, 2)}


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out = run(rows)
    (REPO / "CLICKBENCH.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

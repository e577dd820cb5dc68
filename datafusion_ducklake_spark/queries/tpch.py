"""TPC-H-style relational query suite over the driver's synthetic star schema.

These pin down the engine-operator surface the reference proves through its
test corpus (ref: SURVEY.md §2B — TPC-H via
tests/sqllogictests/sql/tpch/tpch_sf1.test_slow:28-43 and
benchmark/src/tpch.rs:36-64): multi-way equi joins, outer joins, semi/anti
joins (EXISTS / NOT EXISTS / IN-subquery), hash aggregation with multiple
aggregates, scalar subqueries, theta-OR join predicates, top-k sort/limit.

Queries are adapted to the synthetic schema (subset of TPC-H columns,
date range 1995..2001, nations named NATION_0..24). Each Spark builder has a
matching DuckDB oracle in ORACLES with identical aliases and deterministic
numerics (see _util docstring).

Scale notes (100 TB design intent):
- nation/region/part/supplier are dimension tables → Spark auto-broadcasts
  (verified in plans); fact-fact joins (orders⋈lineitem) shuffle on the join
  key only after pushed-down filters reduce the fact side.
- All aggregates are expressed declaratively so Catalyst does partial
  (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import back_to_double, davg, dsum, exact_cast, t


# --- q01: pricing summary (TPC-H Q1: scan-heavy multi-aggregate) -----------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q03: shipping priority (join + agg + top-k) ---------------------------

def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    # r11 opt (guide §2.3 — project before the exchange): the orderkey
    # exchange shipped (l_extendedprice, l_discount) while the aggregate
    # only ever consumes their product; computing rev_row below the
    # shuffle cuts the lineitem side from 3 to 2 columns (24 -> 16 B/row).
    # Same per-row values feed the same dsum — the join only drops rows.
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01 00:00:00").cast("timestamp")
    ).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        .alias("rev_row"))
    # Join-order rewrite: reduce the build side BEFORE it meets lineitem.
    # orders x customer(BUILDING) keeps ~1/5 of the date-filtered orders,
    # so the hash table lineitem probes is 5x smaller than joining orders
    # first and customers after; the post-join aggregate then sees only
    # qualifying rows (~10x fewer than a pre-join per-orderkey aggregate
    # would group). Both joins stay broadcast at bench scale; at cluster
    # scale AQE falls back to shuffle joins on the same shape.
    # r11 opt (§2.3): the group key is o_orderdate AS DATE — cast on the
    # orders side (pre-join, pre-exchange) so 4 bytes ride the shuffle
    # instead of the 8-byte timestamp, and the cast runs once per order
    # row instead of once per joined lineitem row.
    ord_cust = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority")
    return (
        li.join(ord_cust, li.l_orderkey == ord_cust.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("rev_row").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q03 = """
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# --- q05: local supplier volume (6-way join) -------------------------------

def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape: push the region restriction INTO customer and supplier before
    # they meet the fact join, and broadcast the restricted projections.
    # The naive plan shuffles the whole orders⋈lineitem result on custkey
    # to meet customer — the dominant exchange left after the fact-fact
    # join is clustered away. Region-restricted customer is a fraction of
    # the table projected to two int64 columns (~16 bytes/row: SF10 ≈
    # 300k rows ≈ 5 MB), so broadcasting it converts that O(fact) shuffle
    # into a map-side hash probe. The explicit hint is MANDATORY — Spark
    # honors it at any size — and the projection stays driver-safe to
    # roughly SF1000 (~30M rows ≈ 500 MB); a deployment past that must
    # remove the hint (AQE then plans a shuffled join from the same
    # declarative shape — semantics unchanged, one exchange returns).
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    nat_asia = nation.join(
        region, nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cust_asia = cust.join(
        F.broadcast(nat_asia.select("n_nationkey")),
        cust.c_nationkey == F.col("n_nationkey")).select(
        "c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_asia = supp.join(
        F.broadcast(nat_asia),
        supp.s_nationkey == nat_asia.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    # r10 opt (guide §3.1/§3.2): apply the broadcast custkey restriction
    # to ORDERS before the fact-fact join, not after — inner joins
    # commute, and the region filter keeps ~1/5 of customers, so the
    # orderkey join's build side shrinks 5x and the runtime bloom built
    # on it prunes lineitem 5x harder before the exchange (date x region
    # selectivity instead of date alone). Measured at SF10 (min-of-5
    # warm, interleaved): 4.22 -> 3.34 s plain; clustered tier
    # unchanged (a broadcast join preserves the streamed side's
    # bucketed distribution, so the zero-exchange orderkey join
    # survives with ord_asia on the build side).
    ord_asia = orders.join(F.broadcast(cust_asia),
                           orders.o_custkey == cust_asia.c_custkey) \
        .select("o_orderkey", "c_nationkey")
    # r10 opt (guide §2.3 — project before the exchange): the per-row
    # revenue is computed BEFORE the orderkey shuffle so the exchange
    # ships one double instead of (l_extendedprice, l_discount); the
    # post-join aggregate consumes the identical per-row value.
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        .alias("rev_row"))
    return (
        # shuffle_hash on the date+region-filtered orders side: when both
        # facts come bucketed on orderkey the distribution is already
        # satisfied, so the hint swaps the sort-merge for a per-bucket
        # hash build on the small side and elides the 60M-row lineitem
        # sort entirely. On the plain (unbucketed) path the same hint
        # yields a shuffled hash join whose per-partition build is the
        # filtered orders slice (spill-capable since Spark 3.2); heavy
        # orderkey skew is the one regime where removing the hint
        # (sort-merge) is safer
        li.join(ord_asia.hint("shuffle_hash"),
                li.l_orderkey == ord_asia.o_orderkey)
        .join(F.broadcast(supp_asia),
              (li.l_suppkey == supp_asia.s_suppkey)
              & (ord_asia.c_nationkey == supp_asia.s_nationkey))
        .groupBy("n_name")
        .agg(dsum(F.col("rev_row")).alias("revenue"))
    )


ORACLE_Q05 = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --- q06: forecast revenue (selective scan + scalar agg) -------------------

def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


ORACLE_Q06 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- q07: volume shipping between two nations ------------------------------

def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The disjunctive nation pair implies supp_nation IN (N1,N2) AND
    # cust_nation IN (N1,N2) — DuckDB's optimizer derives these per-side
    # filters from the OR; Catalyst does not, so stamp them explicitly.
    # Joining the (now tiny) supplier/customer subsets FIRST shrinks
    # lineitem by ~2/25 before the fact-fact orderkey join.
    pair = ("NATION_1", "NATION_2")
    n1 = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    supp = t(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("n1_key"))
    cust = t(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("n2_key"))
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    # orders ⋈ (tiny, broadcast) customer subset FIRST: orders shrinks to
    # ~2/25 map-side before the fact-fact orderkey join, so that shuffle
    # moves ~1M rows instead of every order (22% at SF3: 3.17s -> 2.48s)
    o2 = orders.join(cust, orders.o_custkey == cust.c_custkey)
    # r11 opt (guide §2.3 — project before the exchange): the orderkey
    # exchange shipped l_extendedprice + l_discount (only their product
    # is consumed) and the raw l_shipdate timestamp (only its year is).
    # Computing rev_row and the 4-byte l_year below the shuffle cuts the
    # lineitem side from 5 columns/40 B to 4 columns/28 B per row; the
    # per-row multiply/year run once either way (the join only drops
    # rows), so the same values feed the same dsum.
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            "l_orderkey", "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .alias("rev_row"))
        .join(o2, F.col("l_orderkey") == o2.o_orderkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("rev_row").alias("revenue"))
    )


ORACLE_Q07 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER)
"""


# --- q04: order priority via EXISTS (left-semi join) -----------------------

def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    # Stamp the derived lineitem bound Catalyst can't infer: qualifying
    # rows need l_shipdate >= min(o_orderdate) + 60d = 1996-03-01 — this
    # reaches the parquet scan (row-group pruning) and drops ~60% of
    # lineitem before any join.
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
    # EXISTS as inner join + per-order dedupe agg: the quarter-filtered
    # orders side broadcasts (AQE decides — no force, so a scale-up where
    # it outgrows the threshold degrades to a shuffle join), lineitem
    # streams map-side, and only the matched (orderkey, priority) pairs
    # (partial-agg'd map-side) reach the shuffle. Measured min-of-5 at
    # SF1-equivalent: 0.69 s vs 0.80 s for the semi-join formulation.
    # A q12-style merge hint was A/B'd at SF10/SF3/sf0.1 this round and
    # measured neutral-to-worse (2.54 vs 2.59 s at SF10; 0.29 vs 0.35 s
    # at sf0.1) — the quarter filter keeps this side ~30x smaller than
    # q12's full-orders build, still cheap to broadcast at SF10, so the
    # adaptive choice stands.
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate >= orders.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    # single-distinct aggregate: Spark's partial-distinct two-phase plan
    # beats the explicit pair-dedup + regroup (1.11s -> 0.90s at SF3)
    return (
        li.join(orders, cond, "inner")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_orderkey").alias("order_count"))
    )


ORACLE_Q04 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --- q10: returned items (outer-dim join + top-k) --------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape: the grouping keys (c_name, c_acctbal, n_name) are
    # functionally dependent on c_custkey, so the aggregate can run at
    # o_custkey granularity BEFORE customer joins in. The naive plan
    # shuffles every qualifying lineitem row on custkey to meet the
    # full customer table; this one reduces the fact side to one
    # (custkey, revenue) row per buying customer in the 3-month window
    # — a digest-only exchange — and broadcasts that small aggregate
    # into the customer⋈nation probe. Top-k runs as TakeOrdered, no
    # global sort.
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    # r11 opt (guide §2.3 — project before the exchange): rev_row is
    # computed below the orderkey shuffle so the lineitem side ships 2
    # columns (16 B/row) instead of (l_orderkey, l_extendedprice,
    # l_discount); same per-row product, same dsum, join only drops rows.
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        .alias("rev_row"))
    nation = t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum("rev_row").alias("revenue"))
    )
    return (
        # Broadcast boundary (r7 verdict #2): rev is one 16-byte
        # (custkey, revenue) row per customer who BOUGHT in the 3-month
        # window — it grows linearly with customer count, not with
        # lineitem. TPC-H has 150k customers/SF and ~1/3 buy per quarter:
        # SF10 ≈ 500k rows ≈ 8 MB, SF100 ≈ 5M ≈ 80 MB, and at roughly
        # SF1000 (~50M rows ≈ 800 MB) the MANDATORY hint stops being
        # driver-safe. Past that, remove the hint: the same declarative
        # shape then shuffles cust and rev on custkey — still a
        # digest-sized exchange (one row per buying customer), never the
        # O(lineitem) shuffle the naive plan pays. Semantics unchanged.
        cust.join(F.broadcast(rev), rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
  c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- q13: customer order-count distribution (left outer join) --------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-pushdown rewrite: count orders per customer BEFORE the
    # outer join (1.5M order rows collapse to ≤150k counts), then a
    # small-side join against customer with COALESCE(cnt, 0) for
    # customers that have no qualifying orders — identical to the
    # canonical LEFT OUTER + COUNT(o_orderkey) the oracle runs.
    cust = t(spark, sf_dir, "customer")
    ord_cnt = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = (
        cust.join(ord_cnt, cust.c_custkey == ord_cnt.o_custkey, "left_outer")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) cc
GROUP BY c_count
"""


# --- q14: promo revenue share (conditional agg) ----------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape: pre-aggregate the month slice of lineitem by partkey BEFORE
    # the part join — the join input shrinks from every qualifying
    # lineitem row to at most one row per part (dimension-bounded), and
    # the shuffle_hash hint builds on that reduced side per-partition
    # instead of collecting a 2M-entry broadcast map on the driver.
    # The pre-agg keeps the decimal(38,6) accumulator in exact mode
    # (exact_cast, cast back to double only at the end), so re-summing
    # per-part subtotals is order-independent and bit-equal to the
    # oracle's row-level decimal sum.
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp")))
    part = t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").like("ECONOMY%").alias("is_promo"))
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    pre = li.groupBy("l_partkey").agg(F.sum(exact_cast(disc_price)).alias("s"))
    return (
        pre.hint("shuffle_hash")
        .join(part, pre.l_partkey == part.p_partkey)
        .agg((F.lit(100.0)
              * F.coalesce(back_to_double(
                  F.sum(F.when(F.col("is_promo"), F.col("s")))), F.lit(0.0))
              / back_to_double(F.sum("s"))).alias("promo_revenue"))
    )


ORACLE_Q14 = """
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'ECONOMY%'
        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


# --- q18: large-volume orders (IN-subquery with HAVING) --------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-reuse rewrite: the canonical q18 re-joins lineitem against
    # the >300-qty probe set and re-sums per (customer, order) — but every
    # final group key is functionally determined by o_orderkey, so the
    # per-order sum computed for the HAVING filter IS the final sum_qty.
    # One lineitem scan + one 1.5M-group agg instead of two of each; the
    # oracle keeps the canonical nested formulation and hash-matches.
    # l_quantity values are whole numbers, so the >300 threshold decides
    # identically in exact-decimal and double mode (sums < 2^53 are exact).
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- q19: theta-OR join predicate ------------------------------------------

def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"))
    )


ORACLE_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- q21-ish: suppliers with no recent shipments (NOT EXISTS / anti join) --

def q21_idle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


ORACLE_Q21 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
"""


# --- q22-ish: rich customers with no orders (scalar subquery + anti join) --

def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal_df = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal"))
    # broadcast boundary: avg_bal_df is a global aggregate — exactly ONE
    # row at any scale, so this broadcast is size-invariant (the scalar-
    # subquery shape; Spark would plan the same via ScalarSubquery)
    rich = cust.join(F.broadcast(avg_bal_df)).filter(
        F.col("c_acctbal") > F.col("avg_bal"))
    # NOT EXISTS via anti-join against the PRE-AGGREGATED custkey set:
    # the groupBy's map-side partial distinct collapses each order
    # partition to its unique custkeys before the shuffle, so the anti
    # join moves ~distinct keys instead of every order row (3x at SF3:
    # 1.80s -> 0.62s). Both sides shuffle on custkey — no forced
    # broadcast, so the plan survives a customer-count scale-up.
    # shuffle_hash (r8): the default SMJ anti join sorts BOTH sides;
    # hashing the deduped key set instead elides both sorts (SF10 min
    # 1.24s -> 1.03s; per-partition build is ~distinct-keys/partitions
    # rows, spill-capable since Spark 3.2). The residual cost is the
    # 15M-row orders pass + its exchange — the custkey-clustered
    # catalog layout serves exactly that (see bench.py's clustered
    # custkey tier), where the bucketed scan satisfies the groupBy's
    # distribution and the exchange disappears.
    ck = orders.groupBy("o_custkey").agg(F.lit(1)).hint("shuffle_hash")
    return (
        rich.join(ck, rich.c_custkey == ck.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum("c_acctbal").alias("totacctbal"))
    )


ORACLE_Q22 = """
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


# --- part stats: MIN/MAX/COUNT DISTINCT coverage ---------------------------

def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.min("p_retailprice").alias("min_price"),
             F.max("p_retailprice").alias("max_price"),
             F.countDistinct("p_type").alias("n_types"),
             F.count(F.lit(1)).alias("n_parts"))
    )


ORACLE_PART_STATS = """
SELECT p_brand,
  MIN(p_retailprice) AS min_price,
  MAX(p_retailprice) AS max_price,
  COUNT(DISTINCT p_type) AS n_types,
  COUNT(*) AS n_parts
FROM part
GROUP BY p_brand
"""


# --- top-k: global sort + limit --------------------------------------------

def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --- window: top order per customer (ROW_NUMBER) ---------------------------

def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


ORACLE_WINDOW_TOP = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) x
WHERE rn = 1
"""


# --- set ops: UNION / INTERSECT / EXCEPT coverage --------------------------

def setop_active_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys that have customers but no suppliers, via EXCEPT;
    plus keys present in both, via INTERSECT; tagged and unioned."""
    cust_n = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")).distinct()
    supp_n = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")).distinct()
    only_cust = cust_n.exceptAll(supp_n).withColumn("kind", F.lit("customer_only"))
    both = cust_n.intersect(supp_n).withColumn("kind", F.lit("both"))
    return only_cust.unionByName(both)


ORACLE_SETOP = """
SELECT nationkey, 'customer_only' AS kind FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) a
UNION ALL
SELECT nationkey, 'both' AS kind FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) b
"""

"""Relational breadth, part 2: the remaining TPC-H query shapes (Q2, Q7,
Q8, Q9, Q11, Q13, Q15, Q16, Q17, Q19, Q20, Q21, Q22) adapted to the
engine's test schema (no ``partsupp`` table — ``lineitem`` plays the
part↔supplier relation; trimmed columns per TESTDATA.md).

Each query pairs a Spark DataFrame plan with a DuckDB oracle under the
registry contract (plans/queries.py module docstring): identical column
names, identical rounding, total ordering under every LIMIT.

Scale notes (SCALE.md conventions):
  * nation/region are broadcast explicitly (tiny, static);
    supplier/part-side joins are left to AQE, which converts the
    post-filter build side to broadcast when it fits.
  * scalar subqueries (Q11 total, Q15 max, Q17 per-part cap, Q22 avg)
    are expressed as one-row aggregate crossJoin broadcasts — no
    driver collect, so the plan is cluster-shaped.
  * the correlated min/avg shapes (Q2, Q17) reuse one hash partitioning:
    the window / second aggregate keys on the same column as the groupBy
    that feeds it, so Catalyst plans a single exchange.

Why these shapes matter for the engine (FIXTURES.md §10 mapping): the
sync ledger's "cheapest viable target per chunk" (Q2), per-site traffic
matrices (Q7/Q8), cost attribution (Q9), hot-document concentration
(Q11), backlog distribution (Q13), top worker (Q15), distinct-supplier
inventories (Q16), small-batch tail (Q17), multi-predicate pushdown
(Q19), capacity semi-joins (Q20), sole-blocker diagnosis (Q21), and
dormant-account sweep (Q22) are all queries an operator of the reference
system would run against its state/event tables at fleet scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.sources.readers import load


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def _european_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    nation = load(spark, "nation", sf)
    region = load(spark, "region", sf).filter(F.col("r_name") == "EUROPE")
    return (
        load(spark, "supplier", sf)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery — for each part, the
    European supplier(s) whose unit cost equals the part's global
    minimum. The raw fact shuffles once, partial-aggregated, on
    (part, supplier); the per-part window min then reshuffles only the
    compact per-pair aggregate — both exchanges move orders of
    magnitude less than the lineitem scan."""
    supp = _european_suppliers(spark, sf)
    li = load(spark, "lineitem", sf)
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    cost = (
        li.join(supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost"))
    )
    best = cost.withColumn(
        "min_all", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("min_all"))
    part = load(spark, "part", sf).filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(unit_cost, 4) AS min_cost
FROM cost
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
  AND unit_cost = (SELECT min(unit_cost) FROM cost c2
                   WHERE c2.l_partkey = cost.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue between two
    nations in both directions, by ship year. The nation-pair predicate
    lands on the two broadcast dim joins; the fact tables join on their
    keys with one shuffle each."""
    li = load(spark, "lineitem", sf)
    orders = load(spark, "orders", sf)
    cust = load(spark, "customer", sf)
    supp = load(spark, "supplier", sf)
    n1 = load(spark, "nation", sf).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, "nation", sf).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's yearly volume
    for one part type — conditional-sum ratio over a star join. Share
    numerator and denominator come out of the SAME aggregate pass (no
    second scan, no self-join)."""
    li = load(spark, "lineitem", sf)
    part = load(spark, "part", sf).filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, "orders", sf)
    cust = load(spark, "customer", sf)
    supp = load(spark, "supplier", sf)
    n1 = load(spark, "nation", sf).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load(spark, "region", sf).filter(F.col("r_name") == "ASIA")
    n2 = load(spark, "nation", sf).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) AS all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over a name-
    substring part filter. (No partsupp ⇒ supply cost is proxied as
    10% of p_retailprice per unit; the join/agg topology is Q9's.)"""
    li = load(spark, "lineitem", sf)
    part = load(spark, "part", sf).filter(F.col("p_name").like("%red%"))
    orders = load(spark, "orders", sf)
    supp = load(spark, "supplier", sf)
    nation = load(spark, "nation", sf)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, o_year,
       round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) AS profit
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose ledger value exceeds a fraction of
    the nation-wide total — HAVING against a scalar aggregate. The
    total is a one-row agg of the already-computed per-part values,
    crossJoin-broadcast back (no driver collect, no second scan of
    the fact table)."""
    li = load(spark, "lineitem", sf)
    supp = (
        load(spark, "supplier", sf)
        .join(
            F.broadcast(load(spark, "nation", sf).filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value_by_part = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = value_by_part.agg((F.sum("value") * 0.002).alias("cutoff"))
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_SQL = """
WITH value_by_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, round(value, 2) AS part_value
FROM value_by_part
WHERE value > (SELECT sum(value) * 0.002 FROM value_by_part)
ORDER BY part_value DESC, p_partkey
"""


def q13_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT join
    with a join-time predicate (so zero-order customers survive with
    count 0), then a second tiny aggregation over the counts."""
    cust = load(spark, "customer", sf)
    orders = load(spark, "orders", sf).filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) AS c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    maximum — scalar-max subquery as a one-row agg crossJoin broadcast.
    Revenue is rounded to 2dp BEFORE the max/equality on both engines
    so summation order can't break the tie comparison."""
    li = load(spark, "lineitem", sf).filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, "supplier", sf)
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) with
    a NOT-IN supplier blacklist — left_anti join against the blacklist
    (the set is tiny, so the anti-join broadcasts), then
    countDistinct with partial aggregation."""
    li = load(spark, "lineitem", sf)
    part = load(spark, "part", sf).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 10, 15, 20, 25, 30, 35, 40)
    )
    blacklist = (
        load(spark, "supplier", sf).filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        li.join(F.broadcast(blacklist), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 10, 15, 20, 25, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average — revenue from
    lineitems below half their part's mean quantity, annualized. The
    brand part list broadcasts into both passes, so only the brand's
    ~5% slice of the fact ever shuffles; the per-part cap aggregate is
    tiny and joins back on the same key."""
    brand_parts = (
        load(spark, "part", sf).filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    )
    li = load(spark, "lineitem", sf).join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    caps = li.groupBy(F.col("l_partkey").alias("cap_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(caps, F.col("l_partkey") == F.col("cap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
"""


def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. The shared
    join key keeps this one hash join; the disjunction stays a single
    post-join filter Catalyst can simplify, with the per-side conjuncts
    (brand/size on part, quantity on lineitem) derived as pushable
    prefilters."""
    li = load(spark, "lineitem", sf)
    part = load(spark, "part", sf)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


def q20_excess_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers in one nation who
    moved > 40 units of any 'small%' part since 1996. Inner-to-outer:
    part-name filter broadcasts into the lineitem agg; the qualifying
    supplier set then semi-joins (left_semi, dedup for free) against
    the nation-filtered supplier dim."""
    small_parts = (
        load(spark, "part", sf)
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    movers = (
        load(spark, "lineitem", sf)
        .filter(F.col("l_shipdate") >= _ts("1996-01-01"))
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nation = load(spark, "nation", sf).filter(F.col("n_name") == "NATION_7")
    return (
        load(spark, "supplier", sf)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS self-joins — suppliers who
    were the SOLE returning supplier on multi-supplier finalized
    orders. Both correlated subqueries collapse into one per-order
    aggregate (distinct suppliers / distinct returning suppliers), so
    the double self-join becomes a single extra groupBy on l_orderkey:
    EXISTS(other supplier) ⇔ n_supp > 1, NOT EXISTS(other returning
    supplier) ⇔ n_ret_supp = 1."""
    li = load(spark, "lineitem", sf)
    order_supp = li.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    orders = load(spark, "orders", sf).filter(F.col("o_orderstatus") == "F")
    supp = load(spark, "supplier", sf)
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(order_supp, li.l_orderkey == F.col("os_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances with no recent orders —
    substring-derived group code, scalar-avg subquery (one-row agg
    crossJoin), and a left_anti join against the recent-order keys."""
    code = F.expr("right(c_name, 1)")
    cust = (
        load(spark, "customer", sf)
        .withColumn("cntrycode", code)
        .filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        load(spark, "orders", sf)
        .filter(F.col("o_orderdate") >= _ts("2000-06-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
WITH eligible AS (
  SELECT right(c_name, 1) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE right(c_name, 1) IN ('1', '3', '5', '7', '9')
    AND c_acctbal > (
      SELECT avg(c_acctbal) FROM customer
      WHERE c_acctbal > 0.0 AND right(c_name, 1) IN ('1', '3', '5', '7', '9')
    )
)
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM eligible
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = eligible.c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""

"""Extended relational coverage (SURVEY §2a rows 10e-10m).

TPC-H q2/q6/q7/q9/q12/q13/q19/q21/q22 analogs adapted to the driver
star schema (no partsupp / shipmode / commit-receipt dates — each
query keeps the *operator shape* of its original and substitutes
available columns). Operator shapes covered here and nowhere else in
the engine:

- min-over-group join-back (window-min, no self-join)       -> q2
- single-table range-predicate aggregate                    -> q6
- symmetric nation-pair join with disjunctive pair filter   -> q7
- LIKE-filtered dimension + derived-profit rollup by year   -> q9
- conditional CASE counts after fact-fact join              -> q12
- left-outer join with join-condition filter + double agg   -> q13
- OR-of-ANDs mixed fact/dim predicate (pushdown stress)     -> q19
- correlated EXISTS + NOT-EXISTS (semi + anti, residual     -> q21
  non-equi condition)
- scalar aggregate subquery broadcast + filtered NOT-EXISTS -> q22

All are Catalyst-native column expressions; dims get explicit
broadcast hints; every computed column is aliased + rounded
identically to the DuckDB oracle (registry determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH costs AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
        SELECT p_partkey, p_brand, s_name,
               ROUND(unit_cost, 4) AS unit_cost
        FROM costs
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size IN (5, 10, 15)
          AND unit_cost = (
              SELECT MIN(c2.unit_cost) FROM costs c2
              WHERE c2.l_partkey = costs.l_partkey
          )
        ORDER BY p_partkey, s_name
        LIMIT 100
    """,
    doc="TPC-H Q2 analog: cheapest supplier per part. Spark plan uses a "
    "window-min join-back (one shuffle) instead of the correlated "
    "subquery self-join; unit cost stands in for ps_supplycost.",
    tags=("relational",),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_size").isin(5, 10, 15))
    supp = table(spark, sf_dir, "supplier")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: single-table range-predicate aggregate — every "
    "predicate must reach the parquet scan (PushedFilters).",
    tags=("relational",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "q7_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 analog: shipping volume between a nation pair by "
    "year — two roles of the same dim (supplier vs customer nation), "
    "disjunctive pair predicate, year rollup.",
    tags=("relational",),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS profit
        FROM (
            SELECT n_name AS nation,
                   CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS amount
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 analog: profit by supplier nation and year for parts "
    "matching a LIKE pattern; 0.6*p_retailprice*l_quantity stands in "
    "for ps_supplycost (schema has no partsupp).",
    tags=("relational",),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q12_priority_shipping",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 analog: CASE-based conditional counts after a "
    "fact-fact join (l_returnflag stands in for l_shipmode).",
    tags=("relational",),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: distribution of per-customer order counts — "
    "left-outer join with a filter inside the join condition, then "
    "two stacked aggregations.",
    tags=("relational",),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1  AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 analog: OR-of-ANDs predicate mixing part and "
    "lineitem columns — Catalyst splits the common l_quantity/p_brand "
    "bounds for pushdown below the join.",
    tags=("relational",),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q21_sole_return_supplier",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 analog: per-order sole-blame supplier — correlated "
    "EXISTS (another supplier participated) + NOT EXISTS (no other "
    "supplier also returned). Spark plan: equi semi/anti joins on "
    "l_orderkey with a residual suppkey-inequality condition "
    "(returnflag 'R' stands in for receipt-after-commit delay).",
    tags=("relational",),
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    candidate = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        candidate.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
              SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT'
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 analog: above-average-balance customers with no "
    "urgent orders — scalar aggregate subquery (broadcast literal) + "
    "anti join (mktsegment stands in for phone-prefix cntrycode).",
    tags=("relational",),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).select(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q4_late_shipping_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 analog: order counts by priority for orders with at "
    "least one line shipped after the order date (stands in for "
    "commitdate < receiptdate). Correlated EXISTS -> left-semi join on "
    "the equi key with a residual non-equi date condition.",
    tags=("relational",),
)
def q4_late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                              ELSE 0 END) / SUM(volume), 6) AS mkt_share
        FROM (
            SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 analog: NATION_1's share of PROMO-part revenue sold "
    "into ASIA-customer markets, by year. 8-way join with the nation "
    "dim in two roles; conditional-share aggregate.",
    tags=("relational",),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == region.r_regionkey, "left_semi")
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy("o_year")
        .agg(F.round(F.sum(nation_vol) / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q11_concentrated_part_value",
    oracle="""
        WITH scoped AS (
            SELECT l_partkey, l_extendedprice
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_3'
        )
        SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
        FROM scoped
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice) > (
            SELECT SUM(l_extendedprice) * 0.001 FROM scoped
        )
        ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 analog: parts whose NATION_3-supplied value exceeds "
    "a fraction of the national total (lineitem value stands in for "
    "partsupp stock). Grouped HAVING vs a scalar aggregate over the "
    "same scoped scan — Spark reuses one shuffle via AQE exchange "
    "reuse; threshold joins back as a broadcast scalar.",
    tags=("relational",),
)
def q11_concentrated_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    scoped = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .select("l_partkey", "l_extendedprice")
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    threshold = scoped.agg((F.sum("l_extendedprice") * 0.001).alias("cutoff"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("raw_value") > F.col("cutoff"))
        .select(
            "l_partkey", F.round("raw_value", 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: supplier(s) with the quarter's maximum revenue — "
    "the revenue 'view' computed once, max as a broadcast scalar "
    "joined back (AQE reuses the grouped exchange for both branches).",
    tags=("relational",),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = p_partkey
          )
    """,
    doc="TPC-H Q17: revenue lost to small-quantity orders of one "
    "brand. Correlated AVG subquery decorrelated into a per-part "
    "grouped aggregate joined back on partkey (broadcast: one row "
    "per part).",
    tags=("relational",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cutoff")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_bulk_bolt_suppliers",
    oracle="""
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem
              WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
                )
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY l_suppkey
              HAVING SUM(l_quantity) > 50
          )
          AND s_nationkey IN (
              SELECT n_nationkey FROM nation WHERE n_regionkey = 1
          )
        ORDER BY s_name
    """,
    doc="TPC-H Q20 analog: suppliers who moved >50 units of bolt parts "
    "in 1996 within one region — doubly nested IN (part-name filter "
    "inside a grouped HAVING inside the supplier IN) as stacked "
    "left-semi joins.",
    tags=("relational",),
)
def q20_bulk_bolt_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    bolts = table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    nations = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 1)
    bulk_suppliers = (
        li.join(F.broadcast(bolts), li.l_partkey == bolts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 50)
    )
    return (
        supp.join(
            F.broadcast(bulk_suppliers), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .join(F.broadcast(nations), supp.s_nationkey == nations.n_nationkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )

"""Extended TPC-H-style coverage adapted to the synthetic schema: the
harder relational shapes — HAVING over exact sums, correlated scalar
subqueries, disjunctive multi-predicate scans, count-distribution
(group-of-groups), nested EXISTS chains. All stock DataFrame/SQL plans;
Catalyst decorrelates the subqueries (SURVEY.md §2B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table, load_tables
from duck_delta_share_spark.plans.registry import DEC, dsum, query, sql_dsum


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# Q4-style: order-priority checking via EXISTS (semi join) ------------------


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4: EXISTS semi join + agg",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = l.join(
        o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    return (
        o.filter(
            (F.col("o_orderdate") >= _ts("1997-07-01"))
            & (F.col("o_orderdate") < _ts("1997-10-01"))
        )
        .join(late, F.col("o_orderkey") == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# Q7-style: volume shipping between two nations ------------------------------


@query(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7: multi-join with disjunctive nation pairing",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1998-12-31")))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# Q8-style: market-share ratio per year --------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       {sql_dsum("CASE WHEN r_name = 'ASIA' THEN volume ELSE 0 END")}
         / {sql_dsum('volume')} AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         r_name
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
) t
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8: conditional-sum market share per year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia = F.when(F.col("r_name") == "ASIA", volume).otherwise(F.lit(0.0))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg((dsum(asia) / dsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


# Q11-style: important stock — HAVING against a scalar subquery --------------


@query(
    "q11_important_stock",
    oracle=f"""
SELECT l_partkey, {sql_dsum('l_extendedprice')} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {sql_dsum('l_extendedprice')} > (
  SELECT {sql_dsum('l_extendedprice')} * 0.002 FROM lineitem
)
ORDER BY part_value DESC, l_partkey
""",
    doc="TPC-H Q11: HAVING over a global-scalar-subquery threshold",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    d = f"CAST(SUM(CAST((l_extendedprice) AS {DEC})) AS DOUBLE)"
    return spark.sql(
        f"""
        SELECT l_partkey, {d} AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING {d} > (SELECT {d} * 0.002 FROM lineitem)
        ORDER BY part_value DESC, l_partkey
        """
    )


# Q13-style: customer order-count distribution (group of groups) -------------


@query(
    "q13_count_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13: two-level aggregation (distribution of counts)",
)
def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# Q15-style: top supplier by revenue (max-revenue scalar subquery) -----------


@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15: CTE + max scalar subquery",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    d = f"CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS {DEC})) AS DOUBLE)"
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, {d} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


# Q17-style: small-quantity revenue vs per-part average ----------------------


@query(
    "q17_small_quantity",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * ({sql_dsum('l_quantity')} / COUNT(l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
  )
""",
    doc="TPC-H Q17: correlated scalar subquery (per-part average)",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # semi-filter lineitem to the surviving brand's partkeys BEFORE the
    # per-part average: per-key averages are unaffected by dropping other
    # keys, and aggregating ALL of lineitem for a 1/25 brand slice is
    # SF-proportional wasted shuffle
    l_brand = l.join(
        p.select(F.col("p_partkey").alias("sp_partkey")),
        F.col("l_partkey") == F.col("sp_partkey"),
        "left_semi",
    )
    per_part_avg = (
        l_brand.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("l_quantity")).alias(
                "avg_qty"
            )
        )
    )
    return (
        # the brand slice of part is a constant FRACTION — still
        # SF-proportional, so no forced broadcast (AQE decides at runtime)
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# Q18-style: large-volume customers (HAVING-filtered IN subquery) ------------


@query(
    "q18_large_orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST((l_quantity) AS {DEC.upper()})) AS DOUBLE) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
""",
    doc="TPC-H Q18: IN subquery with HAVING + multi-key agg",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


# Q19-style: disjunctive multi-predicate join --------------------------------


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    doc="TPC-H Q19: OR-of-ANDs predicate bundle over a join",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        # full part table scales with SF — no forced broadcast; AQE still
        # chooses broadcast while it is genuinely small
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# Q21-style: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------


@query(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
    doc="TPC-H Q21: EXISTS + NOT EXISTS correlated pair",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )


# Q22-style: global-acquaintance filter (scalar subquery + anti join) --------


@query(
    "q22_dormant_customers",
    oracle=f"""
SELECT SUBSTRING(c_name, 10, 2) AS cust_bucket,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {sql_dsum('c_acctbal')} / COUNT(c_acctbal) FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cust_bucket
ORDER BY cust_bucket
""",
    doc="TPC-H Q22: scalar-subquery threshold + NOT EXISTS anti join",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    d = f"CAST(SUM(CAST((c_acctbal) AS {DEC})) AS DOUBLE)"
    return spark.sql(
        f"""
        SELECT SUBSTRING(c_name, 10, 2) AS cust_bucket,
               COUNT(*) AS numcust,
               {d} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT {d} / COUNT(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY cust_bucket
        ORDER BY cust_bucket
        """
    )

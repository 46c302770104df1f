"""The remaining TPC-H shapes (Q2/Q9/Q16/Q20), adapted to the synthetic
schema: the fixtures carry no ``partsupp`` table (FIXTURES.md), so the
part↔supplier relationship is derived from ``lineitem`` — the same
relational shapes (correlated min, multi-join profit rollup, distinct-count
grouping, scalar-subquery threshold) over the tables we have.

Like the rest of the relational surface this is delegated-host-engine
territory for the reference (it only provides the scan,
``/root/reference/src/duck_delta_share_extension.cpp:547-629``); every plan
here is stock DataFrame API for Catalyst to optimize.

Scale notes (100 TB posture):
- The (partkey, suppkey) cost/qty rollups are map-side-combined hash aggs on
  the lineitem shuffle key; their outputs are dimension-sized and join
  part/supplier without a second lineitem shuffle.
- Per-part minima use a window over the already-partitioned rollup (Q2)
  rather than a self-join; supplier-level thresholds broadcast a 1-row agg
  (Q20) — no driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans.registry import dsum, query, sql_dsum


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# Q2-style: minimum-cost supplier per part ----------------------------------
# Original correlates on MIN(ps_supplycost); adapted cost = MIN observed
# unit price (l_extendedprice / l_quantity is noisy → use MIN extendedprice,
# exact under IEEE MIN on both engines).


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), ranked AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost,
         MIN(supply_cost) OVER (PARTITION BY p_partkey) AS best_cost
  FROM part
  JOIN cost ON p_partkey = l_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size <= 15 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM ranked WHERE supply_cost = best_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 shape: per-part minimum-cost EUROPE supplier via window "
    "min over a (part,supplier) rollup — no correlated self-join",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    eu = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    ranked = (
        p.filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .join(cost, F.col("p_partkey") == F.col("l_partkey"))
        .join(eu, F.col("l_suppkey") == F.col("s_suppkey"))  # eu suppliers scale with SF
        .withColumn(
            "best_cost", F.min("supply_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        ranked.filter(F.col("supply_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# Q9-style: product-type profit by nation and year ---------------------------
# Original subtracts ps_supplycost * l_quantity; without partsupp the profit
# term is the discounted revenue alone — same 5-way join + two-level rollup.


@query(
    "q9_product_type_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 shape: 5-way join, profit rolled up by supplier nation × "
    "order year; part/supplier/nation broadcast against the lineitem fact",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        # part slice + supplier both scale with SF — only nation is a
        # bounded dimension here; AQE broadcasts the small sides at runtime
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# Q16-style: supplier count per part group -----------------------------------


@query(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape: distinct-supplier count per (brand, type, size) "
    "with negated + IN predicates; partsupp replaced by the lineitem bridge",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .join(l.select("l_partkey", "l_suppkey"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# Q20-style: potential part promotion ----------------------------------------
# Original: suppliers with availqty > half the year's shipped quantity of
# 'forest%' parts. Adapted threshold: suppliers whose 1997 shipped quantity
# of 'small%' parts exceeds half the per-supplier average — keeps the
# scalar-subquery + HAVING shape.


@query(
    "q20_promotion_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l_suppkey, {sql_dsum('l_quantity')} AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, n_name, qty
FROM shipped
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty > (SELECT 0.5 * ({sql_dsum('qty')} / COUNT(*)) FROM shipped)
ORDER BY s_name
""",
    doc="TPC-H Q20 shape: scalar-subquery threshold over a filtered "
    "(supplier, qty) rollup; the 1-row global agg broadcasts",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))  # part slice scales with SF
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    threshold = shipped.agg(
        (F.lit(0.5) * (dsum("qty") / F.count(F.lit(1)))).alias("thr")
    )
    return (
        shipped.crossJoin(F.broadcast(threshold))
        .filter(F.col("qty") > F.col("thr"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # supplier scales with SF
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "qty")
        .orderBy("s_name")
    )

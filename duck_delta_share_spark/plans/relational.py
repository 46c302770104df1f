"""Relational-surface inventory (SURVEY.md §2B): every query-processing
category the reference delegates to its host engine, expressed with the
Spark DataFrame API so Catalyst owns the physical plan.

Reference evidence that these are host-engine capabilities: the extension
returns raw scan chunks into the engine pipeline
(`/root/reference/src/duck_delta_share_extension.cpp:563,621`) and performs
no joins/aggs/windows/sorts itself.

Scale notes: every query here avoids driver-side loops and cross joins;
top-k-per-group uses window ranking (single shuffle on the partition key);
the as-of join uses the union+window technique (one shuffle, no range
explosion) rather than a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table, load_tables
from duck_delta_share_spark.plans.registry import DEC, dsum, query, sql_dsum

# ---------------------------------------------------------------------------
# Projection + filter (pushdown surface, §A10-A12 analogue on local parquet)
# ---------------------------------------------------------------------------


@query(
    "filter_projection",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
""",
    doc="filter + column pruning; both reach the parquet scan",
)
def filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "filter_in_between_null",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_quantity BETWEEN 10 AND 20
  AND l_discount IS NOT NULL
  AND NOT (l_linestatus = 'O')
""",
    doc="IN / BETWEEN / IS NULL / NOT — the reference's §A11 predicate forms",
)
def filter_in_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_discount").isNotNull()
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
    doc="global top-k: Spark TakeOrderedAndProject, no full sort",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) t
WHERE rn <= 3
""",
    doc="top-k per group via ranking window — one shuffle on the group key",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    doc="left outer join preserving unmatched rows + count of non-null",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
)
""",
    doc="left semi join (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "P"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01'
)
""",
    doc="left anti join (NOT EXISTS)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")


@query(
    "join_full_outer",
    oracle="""
SELECT n_nationkey, n_name, cust_cnt
FROM nation
FULL OUTER JOIN (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cust_cnt
  FROM customer GROUP BY c_nationkey
) c ON n_nationkey = c_nationkey
""",
    doc="full outer join keeping both unmatched sides",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    return n.join(c, F.col("n_nationkey") == F.col("c_nationkey"), "full").select(
        "n_nationkey", "n_name", "cust_cnt"
    )


@query(
    "join_theta_band",
    oracle=f"""
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum('l_quantity')} AS qty
FROM lineitem
JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
""",
    doc="equi join with theta residual (l_quantity > p_size)",
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # no broadcast hint: part grows linearly with scale factor, and the
    # join has an EQUI key (l_partkey) — a shuffle hash join with the
    # theta residual as a post-filter is scale-safe; a forced broadcast
    # would blow the 8 GB cap at large SF (AQE may still choose broadcast
    # when the dimension is genuinely small)
    return (
        l.join(
            p,
            (F.col("l_partkey") == F.col("p_partkey")) & (F.col("l_quantity") > F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("qty"))
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="as-of join: latest click at-or-before each purchase, per user. "
    "Spark impl: union + last(ignorenulls) over an ordered window — one "
    "shuffle on user_id, no range cross product; scales linearly.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value="ts",
        value_alias="click_ts",
    ).select("event_id", "user_id", "ts", "click_ts")


@query(
    "pit_segment_attribution",
    oracle=f"""
WITH dim AS (
  SELECT user_id, ts AS st,
         CAST(FLOOR(MAX(value)) AS BIGINT) % 4 AS segment
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, ts
), p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), pit AS (
  SELECT d.segment, p.value
  FROM p ASOF LEFT JOIN dim d
    ON p.user_id = d.user_id AND p.ts >= d.st
)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {sql_dsum('value')} AS revenue
FROM pit GROUP BY segment
""",
    doc="point-in-time segment attribution — the feature-store temporal-"
    "correctness primitive: each purchase is attributed to the user's "
    "segment AS OF the purchase time (latest signup at-or-before it), "
    "never to a later one (temporal leakage, the classic training-data "
    "bug). Dimension rows deduped per (user, ts) so the as-of pick is "
    "unique under timestamp ties. Spark: the asof_join operator (union "
    "+ last(ignorenulls) over one user-keyed window — no range cross "
    "product) composed with a tiny-key segment agg; purchases before "
    "any signup fall in the NULL segment on both engines. Oracle: "
    "DuckDB's native ASOF LEFT JOIN cross-checks the window-fold "
    "implementation.",
)
def pit_segment_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(
            (F.floor(F.max("value")).cast("bigint") % 4).alias("segment")
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pit = asof_join(
        purchases,
        dim.select("user_id", F.col("ts").alias("st"), "segment"),
        on="user_id",
        left_ts="ts",
        right_ts="st",
        right_value="segment",
        value_alias="segment",
    )
    return pit.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("value").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Aggregation family: distinct, rollup, cube, grouping sets
# ---------------------------------------------------------------------------


@query(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="multi distinct aggregation (expand + two-phase agg in Spark)",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="rollup: hierarchical subtotals incl. grand total",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('l_quantity')} AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="cube: all grouping-set combinations",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("qty")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="explicit grouping sets via Spark SQL",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               {_spark_sql_dsum('o_totalprice')} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def _spark_sql_dsum(expr: str) -> str:
    """Spark-SQL text rendering of registry.dsum (same decimal discipline)."""
    return f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Window functions: ranking, analytic, frames
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    doc="ranking window functions with deterministic tie-break",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_analytic",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="lag/lead/first_value analytic windows",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@query(
    "window_distribution",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       NTH_VALUE(c_custkey, 3) OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_id,
       CAST(COUNT(*) OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal
           RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS near_below
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, c_custkey
""",
    doc="distribution window functions (percent_rank / cume_dist / "
    "nth_value) plus a VALUE-offset RANGE frame (rows within 500 balance "
    "units below the current row) — the frame kind window_frames' ROWS "
    "queries don't cover; percent_rank/cume_dist are exact integer "
    "rationals so the doubles hash identically",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_wd"
    )
    return spark.sql(
        """
        SELECT c_mktsegment, c_custkey, c_acctbal,
               PERCENT_RANK() OVER w AS pr,
               CUME_DIST() OVER w AS cd,
               NTH_VALUE(c_custkey, 3) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS third_id,
               COUNT(*) OVER (
                   PARTITION BY c_mktsegment ORDER BY c_acctbal
                   RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS near_below
        FROM customer_wd
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_mktsegment, c_custkey
        """
    )


@query(
    "window_frames",
    oracle=f"""
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg3
FROM orders
""",
    doc="frame-bounded running sum + moving average (exact decimal inside)",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(DEC)).over(run).cast("double").alias("running_total"),
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="UNION (distinct)",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="INTERSECT",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="EXCEPT (distinct)",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Subqueries (decorrelated by Catalyst)
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery",
    oracle=f"""
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (
  SELECT {sql_dsum('c_acctbal')} / COUNT(c_acctbal) FROM customer
)
""",
    doc="scalar subquery against an exact-decimal global mean",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        f"""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(c_acctbal)
          FROM customer
        )
        """
    )


@query(
    "correlated_in_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
)
""",
    doc="IN subquery → left semi join after decorrelation",
)
def correlated_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
        )
        """
    )


@query(
    "exists_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    AND o.o_totalprice < 1000
)
ORDER BY c_custkey
""",
    doc="correlated EXISTS + NOT EXISTS predicates — Catalyst decorrelates "
    "to a left-semi and a left-anti join (the IN-subquery twin covers the "
    "semi path alone)",
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
            AND o.o_totalprice < 1000
        )
        ORDER BY c_custkey
        """
    )


@query(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey % 100 END AS k
  FROM orders
),
r AS (
  SELECT CASE WHEN g % 10 = 0 THEN NULL ELSE g END AS k,
         g AS tag
  FROM (SELECT UNNEST(RANGE(0, 100)) AS g)
)
SELECT l.o_orderkey, r.tag
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
ORDER BY o_orderkey, tag
""",
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "MATCH each other, unlike plain equi-joins — still a hash join, never "
    "a nested loop",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("k"),
    )
    right = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, F.lit(None))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("tag"),
    )
    return (
        left.join(right, left["k"].eqNullSafe(right["k"]))
        .select("o_orderkey", "tag")
        .orderBy("o_orderkey", "tag")
    )


@query(
    "join_asof_tolerance",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(c.ts) FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_1h,
       (SELECT min(c.ts) FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR) AS next_click_1h
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY event_id
""",
    doc="as-of join with DIRECTION and TOLERANCE (operators/asof.py): "
    "latest click within the hour before each purchase AND earliest click "
    "within the hour after — both directions share the one-shuffle "
    "union+window plan (no range cross product); tolerance uses exact "
    "timestamp-interval arithmetic so the correlated-subquery oracle "
    "matches to the microsecond",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    back = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_value="ts", value_alias="last_click_1h",
        direction="backward", tolerance_seconds=3600,
    )
    both = asof_join(
        back, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_value="ts", value_alias="next_click_1h",
        direction="forward", tolerance_seconds=3600,
    )
    return both.select(
        "event_id", "user_id", "ts", "last_click_1h", "next_click_1h"
    ).orderBy("event_id")


@query(
    "recursive_cte_hierarchy",
    oracle="""
WITH RECURSIVE chain AS (
  SELECT s_suppkey AS k, 0 AS depth, s_acctbal
  FROM supplier WHERE s_suppkey = 1
  UNION ALL
  SELECT s.s_suppkey, c.depth + 1, s.s_acctbal
  FROM supplier s JOIN chain c ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.k
)
SELECT CAST(depth AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(k) AS BIGINT) AS min_key,
       CAST(MAX(k) AS BIGINT) AS max_key,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS level_bal
FROM chain
GROUP BY depth
ORDER BY depth
""",
    doc="recursive CTE (Spark 4 WITH RECURSIVE, SPARK-24497): suppliers "
    "form a synthetic binary tree (parent(k) = floor(k/2), root k=1) and "
    "the recursion walks it breadth-first — each iteration joins the "
    "previous level's working table, log2(n) rounds. Per-level rollup "
    "(count, key range, exact-decimal balance sum) is hash-checked "
    "against DuckDB's WITH RECURSIVE evaluation of the same chain",
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT s_suppkey AS k, 0 AS depth, s_acctbal
          FROM supplier WHERE s_suppkey = 1
          UNION ALL
          SELECT s.s_suppkey, c.depth + 1, s.s_acctbal
          FROM supplier s JOIN chain c
            ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.k
        )
        SELECT CAST(depth AS INT) AS depth,
               COUNT(*) AS n_nodes,
               MIN(k) AS min_key,
               MAX(k) AS max_key,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS level_bal
        FROM chain
        GROUP BY depth
        ORDER BY depth
        """
    )


@query(
    "recursive_cte_calendar",
    oracle="""
WITH RECURSIVE days AS (
  SELECT DATE '1995-03-01' AS d
  UNION ALL
  SELECT d + 1 FROM days WHERE d < DATE '1995-03-31'
)
SELECT CAST(d AS VARCHAR) AS d,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE)
         AS day_rev
FROM days LEFT JOIN orders ON o_orderdate = d
GROUP BY d
ORDER BY d
""",
    doc="recursive CTE as a row GENERATOR (the second recursion shape: "
    "no input table in the recursive arm) — a March-1995 calendar is "
    "enumerated day by day and LEFT-joined to orders, yielding a gap-"
    "filled daily revenue series where empty days survive as zero rows; "
    "complements resample_gapfill_hourly (sequence()-based) with the "
    "iterative construction",
)
def recursive_cte_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        WITH RECURSIVE days AS (
          SELECT DATE '1995-03-01' AS d
          UNION ALL
          SELECT date_add(d, 1) FROM days WHERE d < DATE '1995-03-31'
        )
        SELECT CAST(d AS STRING) AS d,
               COUNT(o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0)
                    AS DOUBLE) AS day_rev
        FROM days LEFT JOIN orders ON o_orderdate = d
        GROUP BY d
        ORDER BY d
        """
    )


@query(
    "set_ops_all",
    oracle="""
SELECT 'intersect_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY op, nationkey
UNION ALL
SELECT 'except_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY op, nationkey
ORDER BY op, nationkey
""",
    doc="bag-semantics set operators (INTERSECT ALL / EXCEPT ALL — "
    "multiplicity-preserving, Spark intersectAll/exceptAll): per-key "
    "multiplicities of both results are hash-checked, proving the "
    "min(count)/count-difference semantics rather than distinct-set "
    "semantics",
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    ia = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionByName(ea).orderBy("op", "nationkey")


@query(
    "ols_per_group",
    oracle="""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9)
         AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2
FROM s
ORDER BY l_returnflag, l_linestatus
""",
    doc="closed-form per-group OLS (price ~ quantity by returnflag/"
    "linestatus): the five sufficient statistics are EXACT decimal sums "
    "(order-independent — the float-discipline rule), cast once to "
    "double, and slope/intercept/r-squared are the identical IEEE "
    "expression on both engines. One hash aggregate, map-side partials, "
    "no second pass — the 100 TB-safe way to fit millions of small "
    "regressions",
)
def ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum((x * y).cast(DEC)).cast("double").alias("sxy"),
        F.sum((y * y).cast("decimal(24,6)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "l_linestatus",
        n.cast("long").alias("n"),
        # rounded to 9 decimals: DuckDB's compiler may contract a*b-c*d
        # into an FMA, which differs from JVM arithmetic in the last ulp
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            9,
        ).alias("r2"),
    ).orderBy("l_returnflag", "l_linestatus")

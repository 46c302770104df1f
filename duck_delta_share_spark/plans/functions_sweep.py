"""Scalar / date / math / array / JSON function coverage (SURVEY.md §2B).

The reference degrades nested types to VARCHAR
(`/root/reference/src/duck_delta_share_extension.cpp:463-466`) and leaves all
scalar functions to the host engine; Spark handles both natively. Every
query below stays inside whole-stage codegen (no Python UDFs).

Determinism notes: string/date/integer functions are exact on both engines.
Transcendental math (ln/pow/sqrt-composites) may differ by 1 ulp between
JVM and libm, so those outputs are rounded to 6 decimals on BOTH sides —
a tie at the rounding boundary would require the true value within ~1 ulp
of a half, which does not occur for these inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans.registry import query


@query(
    "string_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS uname,
       LOWER(p_brand) AS lbrand,
       SUBSTRING(p_type, 1, 4) AS type4,
       p_brand || '/' || p_type AS brand_type,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
       TRIM(CONCAT('  ', p_name, '  ')) AS trimmed,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
FROM part
""",
    doc="upper/lower/substring/concat/length/replace/trim/lpad/like",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
    )


@query(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mth,
       CAST(DAY(o_orderdate) AS INT) AS dom,
       CAST(QUARTER(o_orderdate) AS INT) AS qtr,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
       o_orderdate + INTERVAL 30 DAY AS due_date
FROM orders
""",
    doc="year/month/day/quarter/date_trunc/datediff/interval arithmetic",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@query(
    "math_functions",
    oracle="""
SELECT c_custkey,
       ROUND(c_acctbal, 1) AS bal_round,
       ABS(c_acctbal) AS bal_abs,
       CAST(CEIL(c_acctbal) AS DOUBLE) AS bal_ceil,
       CAST(FLOOR(c_acctbal) AS DOUBLE) AS bal_floor,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS bal_sqrt,
       ROUND(LN(ABS(c_acctbal) + 1), 6) AS bal_ln,
       ROUND(POWER(c_acctbal / 1000, 2), 6) AS bal_pow,
       CAST(c_custkey % 7 AS BIGINT) AS mod7,
       CASE WHEN c_acctbal < 0 THEN -1 WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS sgn
FROM customer
""",
    doc="round/abs/ceil/floor/sqrt/ln/power/mod/sign (transcendentals rounded)",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(bal, 1).alias("bal_round"),
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).cast("double").alias("bal_ceil"),
        F.floor(bal).cast("double").alias("bal_floor"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow(bal / 1000, 2), 6).alias("bal_pow"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.when(bal < 0, -1).when(bal > 0, 1).otherwise(0).alias("sgn"),
    )


@query(
    "array_functions",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS INT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_dim,
       CAST(embedding[64] AS DOUBLE) AS last_dim,
       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_positive
FROM embeddings
""",
    doc="array size / element_at / higher-order filter on array<float>",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        # try_element_at: plain element_at THROWS under ANSI on a <64-dim
        # corpus while the DuckDB oracle's embedding[64] returns NULL —
        # the total form runs (and agrees: both NULL) on any corpus
        # (VERDICT r11 item 5). Index 1 always exists (non-null arrays
        # in every fixture), so it stays on the strict form.
        F.try_element_at("embedding", F.lit(64)).cast("double").alias("last_dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "explode_unnest",
    oracle="""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
) t
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 25
""",
    doc="explode/unnest of tokenized text + count (lateral view semantics)",
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(25)
    )


@query(
    "json_functions",
    oracle="""
SELECT event_id,
       CASE WHEN props IS NOT NULL AND json_valid(props)
             AND regexp_matches(
                   COALESCE(json_extract_string(props, '$.k'), ''),
                   '^-?[0-9]{1,9}$')
            THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k_val,
       CASE WHEN props IS NOT NULL AND json_valid(props)
             AND json_extract_string(props, '$.k') IS NOT NULL
            THEN 1 ELSE 0 END AS has_k
FROM events
""",
    doc="JSON field extraction from the events.props string column. TOTAL "
    "on adversarial payloads (r9 props fuzz seed): Spark get_json_object "
    "returns NULL on malformed JSON while DuckDB json_extract_string "
    "ERRORS, so the oracle guards with json_valid; the int conversion is "
    "gated by an explicit ^-?[0-9]{1,9}$ regexp on BOTH engines — plain "
    "decimal ints convert, '9.9'/' 42 '/'1e3'/overflow all NULL "
    "identically (ANSI cast would throw on some, TRY_CAST semantics "
    "differ on others; the regexp pins one rule). Probed divergence that "
    "stays OUT of the output: for integers beyond float precision, "
    "json_extract_string re-renders via double ('1e23') while Spark "
    "preserves the literal digits — never emit the RAW extract of an "
    "unbounded number",
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        F.when(k.rlike("^-?[0-9]{1,9}$"), k.cast("int")).alias("k_val"),
        F.when(k.isNotNull(), 1).otherwise(0).alias("has_k"),
    )


@query(
    "map_functions",
    oracle="""
SELECT p_partkey,
       'brand,name,type' AS keys,
       p_brand AS brand,
       CAST(LEN(LIST_FILTER([p_brand, p_type, p_name],
                            x -> LEN(x) > 10)) AS INT) AS n_long_vals,
       ARRAY_TO_STRING(LIST_SORT(LIST_TRANSFORM(
           [p_brand, p_type, p_name], x -> UPPER(x))), '|') AS upper_vals
FROM part
""",
    doc="map column surface: create_map / map_keys / element_at / "
    "map_filter / transform_values / map_values over a 3-entry map built "
    "from part attributes; the oracle recomputes every output from the "
    "underlying columns first-principles (DuckDB map extraction semantics "
    "differ across versions, values don't)",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
        F.lit("name"), F.col("p_name"),
    )
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.element_at(m, F.lit("brand")).alias("brand"),
        F.size(F.map_filter(m, lambda k, v: F.length(v) > 10)).alias(
            "n_long_vals"
        ),
        F.array_join(
            F.array_sort(
                F.map_values(F.transform_values(m, lambda k, v: F.upper(v)))
            ),
            "|",
        ).alias("upper_vals"),
    )


@query(
    "conditional_functions",
    oracle="""
SELECT e.event_id,
       COALESCE(NULLIF(e.event_type, 'error'), 'ERR') AS etype,
       CASE WHEN e.value >= 200 THEN 'high'
            WHEN e.value >= 100 THEN 'mid'
            ELSE 'low' END AS value_band,
       GREATEST(e.value, 50.0) AS val_floor50,
       LEAST(e.value, 250.0) AS val_cap250,
       IF(e.user_id % 2 = 0, 'even', 'odd') AS user_parity
FROM events e
""",
    doc="coalesce/nullif/case/greatest/least/if",
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR")).alias("etype"),
        F.when(F.col("value") >= 200, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("val_floor50"),
        F.least(F.col("value"), F.lit(250.0)).alias("val_cap250"),
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("user_parity"),
    )


@query(
    "events_windowed_agg",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS hour_bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
""",
    doc="time-bucketed aggregation — batch twin of the streaming pipeline "
    "in streaming/events.py (same logical plan under a watermark)",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.registry import dsum

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "events_hopping_agg",
    oracle="""
WITH ex AS (
  SELECT event_type, value,
         UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
           AS win_start
  FROM events
)
SELECT win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM ex
GROUP BY win_start, event_type
""",
    doc="HOPPING (sliding) window aggregation via native F.window(1h slide "
    "30m) — every event lands in exactly two overlapping windows; the "
    "oracle unrolls the two epoch-aligned window starts per event. "
    "Complements the tumbling events_windowed_agg (same plan under a "
    "watermark in streaming)",
)
def events_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.registry import dsum

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "sessionization",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT user_id, ts, value,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_seq
""",
    doc="gap-based sessionization (30-min gap): lag + cumulative-sum window, "
    "single shuffle on user_id reused by the per-session rollup; streaming "
    "twins (session_window + applyInPandasWithState) in streaming/sessions.py",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    return sessionize(e, gap_seconds=1800)


@query(
    "pivot_event_types",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_bucket
""",
    doc="pivot: long->wide event-type counts per user bucket; values list "
    "pinned explicitly so the plan is a single pass (no distinct-scan)",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
FROM part WHERE p_partkey < 500
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
FROM part WHERE p_partkey < 500
""",
    doc="unpivot/melt: wide->long via built-in unpivot (stack); narrow scan "
    "of only the measure columns",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       CAST(QUANTILE_CONT(l_quantity, 0.25) AS DOUBLE) AS q25,
       CAST(QUANTILE_CONT(l_quantity, 0.5) AS DOUBLE) AS q50,
       CAST(QUANTILE_CONT(l_quantity, 0.75) AS DOUBLE) AS q75,
       CAST(MAX(l_quantity) AS DOUBLE) AS q100
FROM lineitem
GROUP BY l_returnflag
""",
    doc="exact interpolated percentiles per group (built-in percentile "
    "aggregate = QUANTILE_CONT); quantity domain is small ints so the "
    "interpolation is IEEE-exact on both engines",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25D)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5D)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75D)").alias("q75"),
        F.max("l_quantity").alias("q100"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for "
    "cardinality estimation — constant memory per group vs a full "
    "distinct shuffle. ORACLE SHAPE (r9, retiring rows-only status): "
    "HLL register states differ across engines, so the raw estimate is "
    "not hashable — instead the query emits the EXACT distinct twin "
    "(SQL on both engines) plus the boolean "
    "|approx - exact| <= max(0.05*exact, 2) which the oracle asserts as "
    "literal TRUE; rsd=0.02 puts 5% at >2 sigma, and the same bound is "
    "property-tested in tests/test_approx.py. The estimate still runs — "
    "the boolean is computed from it — so the driver now checks the "
    "sketch path instead of skipping it",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # PLAN SHAPE (r13, the hll_mergeable_distinct pre-dedup pattern):
    # count_distinct + approx_count_distinct in ONE agg makes Spark's
    # single-DISTINCT rewrite key the first partial aggregate on
    # (l_returnflag, l_orderkey) and drag the rsd=0.02 HLL state — 410
    # LONG registers — through it PER DISTINCT KEY: a 413-column partial
    # row per (flag, orderkey) pair, ~GBs of agg state through the first
    # exchange at scale (plans/r13/agg_approx_distinct_before.txt).
    # Pre-deduping to (flag, orderkey) pairs first keeps that exchange
    # narrow (2 cols + a count); HLL registers are duplicate-insensitive
    # so the sketch over deduped pairs equals the sketch over raw rows,
    # the exact distinct becomes COUNT(key) (NULL keys skipped on both
    # engines, like COUNT(DISTINCT)), and n_rows is SUM of the pair
    # counts. Estimates are bit-identical (same register set).
    pairs = l.groupBy("l_returnflag", "l_orderkey").agg(
        F.count(F.lit(1)).alias("__n")
    )
    approx = F.approx_count_distinct("l_orderkey", rsd=0.02)
    exact = F.count("l_orderkey").cast("long")
    return pairs.groupBy("l_returnflag").agg(
        exact.alias("exact_orders"),
        F.sum("__n").cast("long").alias("n_rows"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.greatest(F.lit(0.05) * exact.cast("double"), F.lit(2.0))
        ).alias("approx_within_5pct"),
    )


@query(
    "agg_quantiles_mergeable",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(QUANTILE_CONT(l_quantity, 0.5) AS DOUBLE) AS p50_exact,
       TRUE AS approx_rank_bound_ok
FROM lineitem
GROUP BY l_returnflag
""",
    doc="mergeable approximate quantiles (percentile_approx = Spark's "
    "KLL-style sketch, accuracy 100 => rank error eps = 1%): the 100 TB "
    "quantile path — constant memory per group, partials merge across "
    "partitions/days without re-scanning, unlike exact percentile's "
    "per-group value buffer. ORACLE SHAPE (r9, the approx-distinct "
    "pattern): sketch internals differ across engines, so the query "
    "emits the EXACT interpolated median twin plus the boolean rank-"
    "error certificate — the approx value must lie between the exact "
    "quantiles at p +/- 2*eps (monotonicity of the quantile function "
    "makes 2*eps a safe envelope for the sketch's eps*n rank guarantee; "
    "the boolean is computed wholly Spark-side, the oracle asserts "
    "literal TRUE). q50 exactness discipline = the green "
    "agg_percentiles formulation",
)
def agg_quantiles_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_quantiles_mergeable_core(load_table(spark, sf_dir, "lineitem"))


def agg_quantiles_mergeable_core(l: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    ap = F.percentile_approx("l_quantity", 0.5, 100)
    lo = F.expr("percentile(l_quantity, 0.48D)")
    hi = F.expr("percentile(l_quantity, 0.52D)")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("percentile(l_quantity, 0.5D)").alias("p50_exact"),
        ((ap >= lo) & (ap <= hi)).alias("approx_rank_bound_ok"),
    )


@query(
    "key_skew_profile",
    oracle="""
WITH kc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(MAX(c) AS BIGINT) AS max_count,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS sum_c2,
         CAST(SUM(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                             * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
           AS entropy_terms_e9
  FROM kc
)
SELECT n_keys, n_events, max_count, sum_c2, entropy_terms_e9,
       CAST(floor(CAST(sum_c2 AS DOUBLE) * 1e12
                  / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
                  + 0.5) AS BIGINT) AS hhi_e12
FROM agg
""",
    doc="key-distribution skew profile — the diagnostic run BEFORE "
    "choosing a salting/AQE-skew strategy for a 100 TB shuffle: exact "
    "per-key counts fold to (n_keys, n_events, max_count, sum of "
    "squared counts, pinned Shannon-entropy terms) in ONE combiner-"
    "friendly hash agg + a 1-row fold — no sort, no window, no "
    "pair-join (the rank-based Gini needs a whole-domain sorted prefix "
    "sum; HHI = sum_c2/S^2 carries the same concentration signal "
    "shuffle-free: HHI*n_keys ~ 1 is uniform, >> 1 is hot-key). "
    "Numerics: sum_c2 summed as exact decimal, emitted BIGINT "
    "(ANSI cast fails loud past 2^63 rather than rounding); entropy terms "
    "are floor(c*ln(c)*1e9+0.5) integers summed exactly (the split_kl ln "
    "discipline, same residual last-ulp ln caveat); hhi_e12 is one "
    "double division of exact-integer casts, floor-pinned",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_profile_core(load_table(spark, sf_dir, "events"))


def key_skew_profile_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    kc = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    cd = F.col("c").cast("double")
    agg = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("max_count"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("long")
        .alias("sum_c2"),
        F.sum(
            F.floor(cd * F.log(cd) * F.lit(1e9) + F.lit(0.5)).cast("long")
        ).cast("long").alias("entropy_terms_e9"),
    )
    return agg.select(
        "n_keys",
        "n_events",
        "max_count",
        "sum_c2",
        "entropy_terms_e9",
        F.floor(
            F.col("sum_c2").cast("double")
            * F.lit(1e12)
            / (F.col("n_events").cast("double") * F.col("n_events").cast("double"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("hhi_e12"),
    )


@query(
    "salted_agg_events",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events
GROUP BY event_type
""",
    doc="two-phase salted aggregation (operators/skew.py): phase 1 on "
    "(event_type, salt16) spreads hot keys over 16 reducers, phase 2 "
    "merges partials — value-identical to the direct groupBy (decimal "
    "sums associative), which is what the oracle computes",
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total_value": (
                F.sum(F.col("value").cast("decimal(18,6)")),
                F.sum("total_value").cast("double"),
            ),
            "max_value": (F.max("value"), F.max("max_value")),
        },
        salt_col="event_id",
        n_salts=16,
    )


@query(
    "interval_join_attribution",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       p.value AS purchase_value
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 60 MINUTES
""",
    doc="interval join: purchase attributed to each preceding click by the "
    "same user within 60 min — batch twin of the watermarked stream-stream "
    "join in streaming/joins.py (state bounded by watermark + horizon)",
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.streaming.joins import attribution_batch

    e = load_table(spark, sf_dir, "events")
    return attribution_batch(e, horizon_minutes=60)


@query(
    "stats_moments",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_qty,
       SQRT(
         (COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
          - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE))
         / (COUNT(*) * (COUNT(*) - 1))
       ) AS stddev_qty,
       ROUND(
         (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE))
         / (SQRT(COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE))
            * SQRT(COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                     * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)))
       , 9) AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="distributional statistics (mean/sample-stddev/Pearson corr) derived "
    "from exact decimal sums with explicit closed-form formulas mirrored in "
    "the oracle — deterministic under any partitioning, unlike built-in "
    "stddev/corr whose streaming (Welford) accumulation is order-dependent. "
    "corr is rounded to 9 decimals: the huge sum(p*p) magnitudes hit "
    "engine-specific decimal→double double-rounding (±1 ulp); mean/stddev "
    "are bit-exact unrounded",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.registry import dsum

    l = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    base = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q).alias("sq"),
        dsum(p).alias("sp"),
        dsum(q * q).alias("sqq"),
        dsum(p * p).alias("spp"),
        dsum(q * p).alias("sqp"),
    )
    n = F.col("n")
    var_q = (n * F.col("sqq") - F.col("sq") * F.col("sq")) / (n * (n - 1))
    cov_num = n * F.col("sqp") - F.col("sq") * F.col("sp")
    den = F.sqrt(n * F.col("sqq") - F.col("sq") * F.col("sq")) * F.sqrt(
        n * F.col("spp") - F.col("sp") * F.col("sp")
    )
    return base.select(
        "l_returnflag",
        "n",
        (F.col("sq") / n).alias("mean_qty"),
        F.sqrt(var_q).alias("stddev_qty"),
        F.round(cov_num / den, 9).alias("corr_qty_price"),
    )


@query(
    "bitwise_functions",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS b_and,
       CAST(o_orderkey | 4096 AS BIGINT) AS b_or,
       CAST(xor(o_orderkey, 1365) AS BIGINT) AS b_xor,
       CAST(~o_orderkey AS BIGINT) AS b_not,
       CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS b_pop,
       CAST((o_orderkey & 1023) << 3 AS BIGINT) AS b_shl,
       CAST(o_orderkey >> 2 AS BIGINT) AS b_shr
FROM orders
WHERE o_orderkey % 7 = 0
""",
    doc="bitwise and/or/xor/not/popcount/shifts on bigint keys",
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.where(k % 7 == 0).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.expr("~o_orderkey").alias("b_not"),
        F.bit_count(k).alias("b_pop"),
        F.expr("shiftleft(o_orderkey & 1023, 3)").cast("bigint").alias("b_shl"),
        F.expr("shiftright(o_orderkey, 2)").alias("b_shr"),
    )


@query(
    "try_arithmetic",
    oracle="""
SELECT o_orderkey,
       o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
       CAST(CASE WHEN o_orderkey + CAST(9223372036854775800 AS HUGEINT)
                      > CAST(9223372036854775807 AS HUGEINT)
                 THEN NULL
                 ELSE o_orderkey + CAST(9223372036854775800 AS HUGEINT) END
            AS BIGINT) AS safe_add,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
       TRY_CAST(o_orderstatus AS BIGINT) AS not_a_number
FROM orders
WHERE o_orderkey % 11 = 0
""",
    doc="ANSI-safe arithmetic: try_divide (NULL on /0), try_add (NULL on "
    "int64 overflow — Spark 4 ANSI mode errors on plain +), TRY_CAST on "
    "parseable and unparseable strings",
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.expr("try_divide(o_totalprice, o_orderkey % 3)").alias("safe_div"),
        F.expr("try_add(o_orderkey, 9223372036854775800L)").alias("safe_add"),
        F.expr("TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("prio_num"),
        F.expr("TRY_CAST(o_orderstatus AS BIGINT)").alias("not_a_number"),
    )


@query(
    "lateral_topk",
    oracle="""
SELECT n.n_name, s.s_name, s.s_acctbal
FROM nation n, LATERAL (
  SELECT s_name, s_acctbal FROM supplier
  WHERE s_nationkey = n.n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT 2) s
""",
    doc="correlated LATERAL subquery with per-row ORDER BY + LIMIT (the "
    "SQL-standard top-k-per-group form; Catalyst decorrelates it into the "
    "same ranked-window plan topk_per_group builds by hand)",
)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("nation", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, s.s_name, s.s_acctbal
        FROM nation n, LATERAL (
          SELECT s_name, s_acctbal FROM supplier
          WHERE s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name LIMIT 2) s
        """
    )


@query(
    "higher_order_array",
    oracle="""
WITH t AS (
  SELECT p_partkey,
         generate_series(CAST(1 AS BIGINT), CAST(p_partkey % 8 + 1 AS BIGINT)) AS arr,
         CAST(p_partkey % 8 + 1 AS BIGINT) AS alen
  FROM part WHERE p_partkey % 5 = 0
)
SELECT p_partkey,
       CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS fold_sq,
       CAST(list_sum(list_transform(generate_series(CAST(1 AS BIGINT), alen),
                                    i -> arr[CAST(i AS INTEGER)]
                                         * arr[CAST(alen + 1 - i AS INTEGER)]))
            AS BIGINT) AS zip_rev_dot,
       len(list_filter(arr, x -> x % 5 = 0)) > 0 AS has_mult5,
       len(list_filter(arr, x -> x % 2 != 1)) = 0 AS all_odd,
       list_contains(arr, CAST(3 AS BIGINT)) AS has_three,
       CAST(coalesce(list_sum(arr[2:3]), 0) AS BIGINT) AS slice_sum
FROM t
""",
    doc="higher-order array surface: aggregate (left fold), zip_with "
    "against the reversed array, exists/forall, array_contains, slice — "
    "integer arrays so every engine agrees bit-exactly",
)
def higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    t = p.where(F.col("p_partkey") % 5 == 0).select(
        "p_partkey",
        F.sequence(
            F.lit(1).cast("long"), (F.col("p_partkey") % 8 + 1).cast("long")
        ).alias("arr"),
    )
    return t.select(
        "p_partkey",
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda a, x: a + x * x
        ).alias("fold_sq"),
        F.aggregate(
            F.zip_with("arr", F.reverse("arr"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("zip_rev_dot"),
        F.exists("arr", lambda x: x % 5 == 0).alias("has_mult5"),
        F.forall("arr", lambda x: x % 2 == 1).alias("all_odd"),
        F.array_contains("arr", F.lit(3).cast("long")).alias("has_three"),
        F.aggregate(
            F.slice("arr", 2, 2), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("slice_sum"),
    )


@query(
    "salted_join_lineitem",
    oracle="""
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    doc="skew-mitigating salted equi-join (operators/skew.py:salted_join): "
    "per-row salt on the big side, n_salts-replicated small side, join on "
    "(key, salt) — a hot key spreads over n_salts shuffle partitions; "
    "semantically identical to the plain join, which is exactly what the "
    "oracle checks (post-join rollup keeps the gate output bounded)",
)
def salted_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.skew import salted_join
    from duck_delta_share_spark.plans.registry import dsum

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(l, o, ["l_orderkey"], n_salts=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "funnel_stages",
    oracle="""
WITH enc AS (
  SELECT user_id,
         epoch_us(ts) * 8 + (CASE event_type WHEN 'view' THEN 1
                                             WHEN 'click' THEN 2
                                             WHEN 'purchase' THEN 3 END) AS e
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
arr AS (SELECT user_id, list_sort(list(e)) AS es FROM enc GROUP BY user_id)
SELECT user_id,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), es), (acc, v) ->
         CASE WHEN acc % 8 = 0 AND v % 8 = 1
                THEN (v // 8) * 8 + 1
              WHEN acc % 8 = 1 AND v % 8 = 2
                   AND v // 8 - acc // 8 <= 86400000000
                THEN (v // 8) * 8 + 2
              WHEN acc % 8 = 2 AND v % 8 = 3
                   AND v // 8 - acc // 8 <= 86400000000
                THEN (v // 8) * 8 + 3
              ELSE acc END) % 8 AS INT) AS funnel_stage
FROM arr
ORDER BY user_id
""",
    doc="ordered funnel analysis (view -> click -> purchase, strictly in "
    "time order WITH a 24-hour step deadline — the MATCH_RECOGNIZE-"
    "class query): each user's relevant events are encoded as ONE "
    "sortable integer (epoch_us * 8 + step code, ties broken by step), "
    "sorted per user, and a left fold drives a stage machine whose "
    "accumulator packs (last-step timestamp * 8 + stage); a step only "
    "counts if it is in order AND within 24 h of the previous step. A "
    "click before any view does NOT count — unlike the naive per-type "
    "min(ts) approach, the fold respects sequencing. Single shuffle on "
    "user_id; the oracle replays the identical fold via "
    "list_reduce(list_prepend(0, ...))",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
    )
    enc = e.select(
        "user_id",
        # ts may load as TIMESTAMP_NTZ; cast is value-preserving (UTC
        # session) and unix_micros requires TIMESTAMP
        (F.unix_micros(F.col("ts").cast("timestamp")) * 8 + code)
        .cast("long")
        .alias("e"),
    )
    window_us = 86_400_000_000  # 24-hour step deadline
    # BOUNDED-MEMORY equivalent of the packed-int fold over
    # sort_array(collect_list(...)): a hot user with 10^8 events would
    # materialize an ~800 MB array in ONE aggregation row. The fold's
    # transitions are monotone, so they reduce to running-min window
    # candidates — v1 = first view; c1 = first click at-or-after v1
    # (later clicks are strictly farther from v1, so only the first can
    # pass the deadline); p1 = first purchase at-or-after c1, admitted
    # only once the stage-2 deadline held. Running MIN over an
    # unbounded-preceding frame is constant-state streaming; the final
    # per-user agg reuses the window's partitioning (no extra shuffle).
    # Equivalence with the literal fold is pinned by the hypothesis
    # property test (tests/test_funnel.py).
    from pyspark.sql import Window

    ts = F.floor(F.col("e") / 8)
    kind = F.col("e") % 8
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = enc.withColumn("__vrun", F.min(F.when(kind == 1, ts)).over(wrun))
    c_cand = F.when((kind == 2) & F.col("__vrun").isNotNull(), ts)
    s2 = s1.withColumn("__ccand", c_cand).withColumn(
        "__crun", F.min(c_cand).over(wrun)
    )
    p_cand = F.when(
        (kind == 3)
        & F.col("__crun").isNotNull()
        & (F.col("__crun") - F.col("__vrun") <= window_us),
        ts,
    )
    res = (
        s2.select(
            "user_id",
            F.when(kind == 1, ts).alias("__vcand"),
            F.col("__ccand"),
            p_cand.alias("__pcand"),
        )
        .groupBy("user_id")
        .agg(
            F.min("__vcand").alias("v1"),
            F.min("__ccand").alias("c1"),
            F.min("__pcand").alias("p1"),
        )
    )
    stage = (
        F.when(
            F.col("p1").isNotNull() & (F.col("p1") - F.col("c1") <= window_us),
            3,
        )
        .when(
            F.col("c1").isNotNull() & (F.col("c1") - F.col("v1") <= window_us),
            2,
        )
        .when(F.col("v1").isNotNull(), 1)
        .otherwise(0)
    )
    return res.select(
        "user_id", stage.cast("int").alias("funnel_stage")
    ).orderBy("user_id")


@query(
    "listagg_ordered",
    oracle="""
SELECT n_name,
       STRING_AGG(s_name, ',' ORDER BY s_acctbal DESC, s_name) AS top_suppliers
FROM (
  SELECT n_name, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_nationkey
                            ORDER BY s_acctbal DESC, s_name) AS rk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
WHERE rk <= 5
GROUP BY n_name
ORDER BY n_name
""",
    doc="ordered string aggregation (LISTAGG / STRING_AGG semantics): the "
    "top-5 suppliers per nation by balance, concatenated in EXPLICIT "
    "(s_acctbal DESC, s_name) order — Spark's array_sort(collect_list(" 
    "struct)) + transform + array_join reproduces the deterministic "
    "ordered concatenation DuckDB's ORDER BY-qualified STRING_AGG "
    "computes (collect_list alone is partition-order-nondeterministic; "
    "the sort key rides inside the struct)",
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_name"
    )
    top = j.withColumn("rk", F.row_number().over(w)).where("rk <= 5")
    # sort key: balance DESC then name ASC — negate the balance so one
    # ascending struct sort yields the target order
    agg = top.groupBy("n_name").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("s_acctbal")).alias("k1"),
                            F.col("s_name").alias("k2"),
                        )
                    )
                ),
                lambda x: x["k2"],
            ),
            ",",
        ).alias("top_suppliers")
    )
    return agg.orderBy("n_name")


@query(
    "histogram_width_bucket",
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 21
            ELSE FLOOR(o_totalprice / 30000.0) + 1 END AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
       CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
    doc="equi-width histogram via width_bucket (the SQL-standard binning "
    "function, Spark 3.5+): 20 price buckets over [0, 600k) with "
    "per-bucket counts and observed ranges — one hash aggregate, the "
    "profiling query every column-stats pass runs. DuckDB has no "
    "width_bucket; the oracle computes the identical bucket "
    "arithmetically (floor(x/width)+1 with under/overflow buckets 0 and "
    "n+1), which also cross-checks Spark's implementation against the "
    "SQL-standard definition",
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(20))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id, ts, MIN(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
), c AS (
  SELECT user_id,
         date_trunc('week', first_ts) AS cw,
         CAST(datediff('day', CAST(date_trunc('week', first_ts) AS DATE),
                       CAST(date_trunc('week', ts) AS DATE)) / 7 AS INT)
           AS week_offset
  FROM f
)
SELECT CAST(CAST(cw AS DATE) AS VARCHAR) AS cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM c
GROUP BY cw, week_offset
""",
    doc="weekly retention cohorts over the event stream: users grouped by "
    "their first-seen week (Monday-truncated), counted distinct per "
    "(cohort, week-offset) cell — the classic growth-analytics triangle. "
    "Plan: first-seen via ONE window min keyed on user_id (the natural "
    "partitioning of per-user history), then a distinct-count agg on the "
    "tiny (cohort, offset) key space. Cohort week emitted as STRING "
    "(CLAUDE.md: computed date dtypes differ across engines).",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_ts = F.min("ts").over(w)
    cw = F.date_trunc("week", first_ts)
    offset = (
        F.datediff(
            F.to_date(F.date_trunc("week", F.col("ts"))), F.to_date(cw)
        )
        / 7
    ).cast("int")
    return (
        e.select(
            "user_id",
            F.to_date(cw).cast("string").alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "event_type_transitions",
    oracle="""
WITH s AS (
  SELECT event_type AS prev_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(COUNT(*) AS DOUBLE)
         / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
FROM s
WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    doc="first-order Markov transition matrix of per-user event sequences "
    "(P(next event type | current), the user-behavior model features a "
    "sequence-modeling pipeline extracts). Plan: ONE window shuffle keyed "
    "on user_id (lead over ts with event_id tie-break — deterministic "
    "under duplicate timestamps), then a hash agg on the tiny "
    "(prev, next) key space and a window over prev_type groups. prob is "
    "a single IEEE division of two exact integers — bit-identical on "
    "both engines, no decimal discipline needed.",
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "cnt",
        (
            F.col("cnt").cast("double")
            / F.sum("cnt").over(wp).cast("double")
        ).alias("prob"),
    )


@query(
    "pagerank_transition_round",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events WHERE event_type IS NOT NULL
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL),
nn AS (SELECT GREATEST(COUNT(*), 1) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
contrib AS (
  SELECT e.dst AS event_type,
         SUM(e.w) AS in_w,
         SUM(((1000000 // nn.n) * e.w) // o.out_w) AS c_e6
  FROM edges e JOIN outw o ON o.src = e.src CROSS JOIN nn
  GROUP BY e.dst
)
SELECT n.event_type,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w,
       CAST(COALESCE(c.in_w, 0) AS BIGINT) AS in_w,
       CAST((150000 // nn.n) + (85 * COALESCE(c.c_e6, 0)) // 100 AS BIGINT)
         AS rank_e6
FROM nodes n CROSS JOIN nn
LEFT JOIN outw o ON o.src = n.event_type
LEFT JOIN contrib c ON c.event_type = n.event_type
ORDER BY n.event_type
""",
    doc="one PageRank power-iteration round over the event-type transition "
    "graph (nodes = event types, edge weights = per-user consecutive-event "
    "transition counts; lead over (ts, event_id) — deterministic under "
    "timestamp ties): rank' = 0.15/N + 0.85 * sum_in(rank_u * w_uv / "
    "out_u) from a uniform start, the centrality signal a "
    "crawl-prioritization or curriculum pipeline derives from behavior "
    "graphs. ALL-INTEGER fixed-point e6 arithmetic (integer DIV only — "
    "no float op anywhere, so the round is hash-exact by construction; "
    "the simple-damped variant: dangling-node mass is not redistributed). "
    "Drives operators/graph.py:pagerank_rounds with n_rounds=1, so the "
    "oracle hash-checks the exact per-round math the ITERATIVE operator "
    "repeats (the components.py pattern: register the SQL-expressible "
    "step, loop it in the operator). PLAN: one window shuffle keyed on "
    "user_id, then hash aggs on the tiny (src, dst) key space; only the "
    "1-scalar node count touches the driver",
)
def pagerank_transition_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.operators.graph import pagerank_rounds

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = e.select("event_type").distinct()
    pr = pagerank_rounds(
        edges, src="src", dst="dst", weight="w", nodes=nodes, n_rounds=1
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    inw = edges.groupBy("dst").agg(F.sum("w").alias("in_w"))
    return (
        pr.join(outw, pr["node"] == outw["src"], "left")
        .join(inw, pr["node"] == inw["dst"], "left")
        .select(
            F.col("node").alias("event_type"),
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
            F.col("rank_e").cast("long").alias("rank_e6"),
        )
        .orderBy("event_type")
    )


@query(
    "pagerank_three_rounds",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events WHERE event_type IS NOT NULL
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (
  SELECT DISTINCT event_type AS node FROM events
  WHERE event_type IS NOT NULL
),
nn AS (SELECT GREATEST(COUNT(*), 1) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
r0 AS (
  SELECT node, CAST(1000000 // nn.n AS BIGINT) AS rank_e
  FROM nodes CROSS JOIN nn
),
c1 AS (
  SELECT e.dst AS node, SUM((r.rank_e * e.w) // o.out_w) AS c
  FROM edges e JOIN outw o ON o.src = e.src JOIN r0 r ON r.node = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT n.node,
         CAST((150000 // nn.n) + (85 * COALESCE(c1.c, 0)) // 100 AS BIGINT)
           AS rank_e
  FROM nodes n CROSS JOIN nn LEFT JOIN c1 ON c1.node = n.node
),
c2 AS (
  SELECT e.dst AS node, SUM((r.rank_e * e.w) // o.out_w) AS c
  FROM edges e JOIN outw o ON o.src = e.src JOIN r1 r ON r.node = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT n.node,
         CAST((150000 // nn.n) + (85 * COALESCE(c2.c, 0)) // 100 AS BIGINT)
           AS rank_e
  FROM nodes n CROSS JOIN nn LEFT JOIN c2 ON c2.node = n.node
),
c3 AS (
  SELECT e.dst AS node, SUM((r.rank_e * e.w) // o.out_w) AS c
  FROM edges e JOIN outw o ON o.src = e.src JOIN r2 r ON r.node = e.src
  GROUP BY e.dst
),
r3 AS (
  SELECT n.node,
         CAST((150000 // nn.n) + (85 * COALESCE(c3.c, 0)) // 100 AS BIGINT)
           AS rank_e
  FROM nodes n CROSS JOIN nn LEFT JOIN c3 ON c3.node = n.node
)
SELECT node AS event_type, rank_e AS rank_e6 FROM r3 ORDER BY node
""",
    doc="THREE chained PageRank rounds over the event-type transition "
    "graph — pins the loop COMPOSITION of operators/graph.py:"
    "pagerank_rounds (checkpoint boundaries, per-round rank handoff, "
    "release of the superseded round), not just the single-step math "
    "that pagerank_transition_round already oracles (VERDICT r11 item "
    "7). The all-integer e6 fixed point is what makes a multi-round "
    "oracle EXPRESSIBLE at all: each round is a pure integer "
    "re-derivation, so three chained CTEs reproduce the iterated "
    "operator bit-for-bit — a float PageRank would drift in the last "
    "ulp per round and could never hash. Same simple-damped variant, "
    "same deterministic LEAD ordering",
)
def pagerank_three_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.operators.graph import pagerank_rounds

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = e.select("event_type").distinct()
    pr = pagerank_rounds(
        edges, src="src", dst="dst", weight="w", nodes=nodes, n_rounds=3
    )
    return pr.select(
        F.col("node").alias("event_type"),
        F.col("rank_e").cast("long").alias("rank_e6"),
    ).orderBy("event_type")


@query(
    "l_diversity_audit",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS sz, COUNT(DISTINCT user_id) AS l
  FROM events GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(l) AS BIGINT) AS l_diversity,
       CAST(MAX(l) AS BIGINT) AS max_l,
       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_3,
       CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_below_3
FROM g
""",
    doc="l-diversity audit over the same quasi-identifier set as "
    "k_anonymity_audit (event_type, day), sensitive attribute = user_id: "
    "k-anonymity alone is defeated by a homogeneous group (every row in "
    "the class belongs to ONE user), so the privacy gate also needs l = "
    "the smallest per-class count of DISTINCT sensitive values, plus the "
    "below-threshold exposure a suppression pass would drop. One hash "
    "agg on the QI key (single-column COUNT(DISTINCT) — no Expand "
    "blowup) then a 1-row fold; all exact integers",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("user_id").alias("l"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("l").cast("long").alias("l_diversity"),
        F.max("l").cast("long").alias("max_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_3"),
        F.sum(F.when(F.col("l") < 3, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_3"),
    )


@query(
    "interarrival_histogram",
    oracle="""
WITH s AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), d AS (
  SELECT event_type, epoch_us(ts) - epoch_us(prev_ts) AS delta_us
  FROM s WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       CAST(LEAST(delta_us // 300000000, 24) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(delta_us) AS BIGINT) AS min_delta_us,
       CAST(MAX(delta_us) AS BIGINT) AS max_delta_us
FROM d
GROUP BY event_type, bucket
""",
    doc="inter-arrival-time histogram per event type (the burstiness / "
    "bot-detection profile a stream-quality pass computes): per-user "
    "time since the previous event (any type), bucketed into 5-minute "
    "bins capped at 2 h. Plan: ONE window shuffle keyed on user_id "
    "(lag over ts, event_id tie-break), then a hash agg on the tiny "
    "(type, bucket) key space. All arithmetic is exact integer "
    "microseconds — Spark DIV mirrors DuckDB // with no float in "
    "sight.",
)
def interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    d = (
        e.select(
            "event_type",
            (us - F.lag(us).over(w)).alias("delta_us"),
        )
        .where(F.col("delta_us").isNotNull())
    )
    return (
        d.select(
            "event_type",
            F.least(F.expr("delta_us DIV 300000000"), F.lit(24))
            .cast("int")
            .alias("bucket"),
            "delta_us",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("delta_us").alias("min_delta_us"),
            F.max("delta_us").alias("max_delta_us"),
        )
    )


def event_debounce_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized debounce core — shared by the registry query
    and scale_check so the measured scale factors can never drift from
    the shipped plan."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    d = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("delta_us")
    )
    dup = F.col("delta_us") < 600000000
    return d.groupBy("event_type").agg(
        F.count(F.when(~F.coalesce(dup, F.lit(False)), 1)).alias("kept"),
        F.count(F.when(dup, 1)).alias("dropped"),
    )


@query(
    "event_debounce_dedup",
    oracle="""
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id))
           AS delta_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) FILTER (delta_us IS NULL OR delta_us >= 600000000)
            AS BIGINT) AS kept,
       CAST(COUNT(*) FILTER (delta_us < 600000000) AS BIGINT) AS dropped
FROM s
GROUP BY event_type
""",
    doc="time-window debounce dedup (the at-least-once-delivery / "
    "double-fire cleanup an event-ingest pipeline runs): an event is a "
    "duplicate when the SAME (user, type) fired within the previous 10 "
    "minutes — lag against the previous event, not the previous kept "
    "one, so the rule is a stateless window (the kept-anchor variant "
    "is the streaming sessionize shape). Plan: ONE window shuffle "
    "keyed on (user_id, event_type) with the (ts, event_id) "
    "deterministic tie-break, then a hash agg on the tiny type key. "
    "Exact integer microseconds throughout — Spark unix_micros mirrors "
    "DuckDB epoch_us with no float.",
)
def event_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_debounce_core(load_table(spark, sf_dir, "events"))


@query(
    "event_volume_anomaly",
    oracle="""
WITH dc AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt * cnt) AS q
  FROM dc GROUP BY 1
)
SELECT dc.event_type, dc.day, CAST(dc.cnt AS BIGINT) AS cnt,
       CASE WHEN st.n * st.q - st.s * st.s > 0 THEN
         round(CAST(st.n * dc.cnt - st.s AS DOUBLE)
           / (CAST(st.n AS DOUBLE) * sqrt(
                CAST(st.n * st.q - st.s * st.s AS DOUBLE)
                / CAST(st.n * (st.n - 1) AS DOUBLE))), 9)
       END AS z
FROM dc JOIN st USING (event_type)
WHERE st.n > 1
""",
    doc="daily event-volume anomaly score (the traffic-spike / outage "
    "detector a pipeline-health pass computes): per (type, day) count "
    "z-scored against the type's daily distribution. Plan: ONE hash "
    "agg to the tiny (type, day) grid, per-type moments fold FROM that "
    "grid (never a second event scan), and the stats join back is a "
    "broadcast of |types| rows. Numerics: the z-score is built from "
    "EXACT integer moments — n*cnt-s and n*q-s^2 are integers well "
    "under 2^53 — so both engines evaluate the identical "
    "division/sqrt/division tree on identical doubles (no Welford-vs-"
    "textbook variance divergence, the stddev_samp trap); rounded to 9 "
    "decimals under the libm ulp discipline. A ZERO-variance type "
    "(equal count every day) yields NULL, guarded on the exact integer "
    "n*q-s^2 — the unguarded division THROWS under Spark 4 ANSI while "
    "DuckDB returns NaN (both wrong; r7 self-review). day is CAST to "
    "STRING on both sides (computed dates hit the DATE-dtype-family "
    "mismatch, CLAUDE.md).",
)
def event_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_volume_anomaly_core(load_table(spark, sf_dir, "events"))


def event_volume_anomaly_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized anomaly core — shared with scale_check."""
    dc = (
        e.select(
            "event_type",
            F.col("ts").cast("timestamp").cast("date").cast("string")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        dc.join(F.broadcast(st), "event_type")
        .where(F.col("n") > 1)
        .select(
            "event_type",
            "day",
            "cnt",
            F.when(
                var_num > 0,
                F.round(
                    (F.col("n") * F.col("cnt") - F.col("s")).cast("double")
                    / (
                        F.col("n").cast("double")
                        * F.sqrt(
                            var_num.cast("double")
                            / (F.col("n") * (F.col("n") - 1)).cast("double")
                        )
                    ),
                    9,
                ),
            ).alias("z"),
        )
    )


@query(
    "user_burstiness_profile",
    oracle="""
WITH e2 AS (
  SELECT user_id, epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), g AS (
  SELECT user_id, nxt - us AS g FROM e2 WHERE nxt IS NOT NULL
), s AS (
  SELECT user_id, COUNT(*) AS n, SUM(g) AS sg,
         SUM(CAST(g AS HUGEINT) * g) AS s2,
         MIN(g) AS min_g, MAX(g) AS max_g
  FROM g GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(min_g AS BIGINT) AS min_gap_us,
       CAST(max_g AS BIGINT) AS max_gap_us,
       floor(CAST(sg AS DOUBLE) / n / 1000000.0 * 1000000.0 + 0.5)
         / 1000000.0 AS mean_gap_s,
       CASE WHEN sg > 0 THEN
         floor(
           (sqrt(CAST(n * s2 - CAST(sg AS HUGEINT) * sg AS DOUBLE))
              - CAST(sg AS DOUBLE))
           / (sqrt(CAST(n * s2 - CAST(sg AS HUGEINT) * sg AS DOUBLE))
              + CAST(sg AS DOUBLE))
           * 1000000000.0 + 0.5) / 1000000000.0
       END AS burstiness
FROM s
""",
    doc="per-user inter-arrival burstiness (Goh & Barabasi B = "
    "(sigma - mu)/(sigma + mu) over event gaps): the bot/scraper "
    "signature a data-quality pass computes — human activity is bursty "
    "(B > 0), scripted traffic is periodic (B -> -1). Numerics: gaps "
    "are exact integer microseconds; both moments stay EXACT integers "
    "(DuckDB HUGEINT, Spark decimal products — a bigint gap^2 would "
    "overflow int64) and n cancels so B reduces to "
    "(sqrt(n*s2 - sg^2) - sg)/(sqrt(n*s2 - sg^2) + sg) — the same "
    "sqrt/sub/add/div IEEE sequence on both engines from the same exact "
    "integers, floor-pinned to e9; the all-ties user (sg = 0) yields "
    "NULL via a lazily-evaluated CASE on both engines (ANSI 0/0 would "
    "throw). Plan: ONE user-keyed window (lead) whose exchange the "
    "grouped moment agg reuses; per-user rows bounded by arrival rate "
    "at production scale.",
)
def user_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_burstiness_core(load_table(spark, sf_dir, "events"))


def user_burstiness_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        e.select("user_id", us.alias("us"), F.lead(us).over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull())
        .select("user_id", (F.col("nxt") - F.col("us")).alias("g"))
    )
    # decimal(19,0) holds any int64 gap, so the factor cast itself can
    # never overflow (the earlier decimal(14,0) capped gaps at ~3.2
    # years and threw one-sided while the oracle's HUGEINT succeeded —
    # r8 self-review #8). g² < 8.5e37 fits the capped decimal(38,0)
    # product; the moment SUMS overflow only past ~1e38, where BOTH
    # engines fail loud (Spark decimal overflow, DuckDB hugeint).
    gd = F.col("g").cast("decimal(19,0)")
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("sg"),
            F.sum(gd * gd).alias("s2"),
            F.min("g").alias("min_g"),
            F.max("g").alias("max_g"),
        )
        .where(F.col("n") >= 2)
    )
    num = (
        F.col("n").cast("decimal(20,0)") * F.col("s2")
        - F.col("sg").cast("decimal(19,0)") * F.col("sg").cast("decimal(19,0)")
    ).cast("double")
    sgd = F.col("sg").cast("double")
    b = (F.sqrt(num) - sgd) / (F.sqrt(num) + sgd)
    return s.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.col("min_g").alias("min_gap_us"),
        F.col("max_g").alias("max_gap_us"),
        (
            F.floor(sgd / F.col("n") / F.lit(1000000.0) * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("mean_gap_s"),
        F.when(
            F.col("sg") > 0,
            F.floor(b * F.lit(1000000000.0) + F.lit(0.5)) / F.lit(1000000000.0),
        ).alias("burstiness"),
    )


# --- r9: dataset-profiling primitives (the QA pass run BEFORE a 100 TB
# ingest is accepted into a training mix) ---------------------------------

_PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROFILE_CAT = ["l_returnflag", "l_linestatus"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM:
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(floor(MIN({c}) * 1e6 + 0.5) AS BIGINT) AS min_e6,
       CAST(floor(MAX({c}) * 1e6 + 0.5) AS BIGINT) AS max_e6,
       CAST(SUM(CAST({c} AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_e6
FROM lineitem"""
        )
    for c in _PROFILE_CAT:
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(NULL AS BIGINT) AS min_e6,
       CAST(NULL AS BIGINT) AS max_e6,
       CAST(NULL AS BIGINT) AS sum_e6
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts)


@query(
    "table_profile",
    oracle=_profile_oracle(),
    doc="per-column dataset profile (count / nulls / exact distinct / "
    "min / max / sum) unpivoted to a long (col_name, metric...) report "
    "— the data-QA gate a 100 TB ingest runs before acceptance. PLAN "
    "SHAPE (measured 3.2x over the naive multi-COUNT(DISTINCT) agg, "
    "whose Expand pushes every row x(k+1) through one wide 20-buffer "
    "hash agg): the non-distinct stats fold in one narrow pass, and "
    "exact distincts run as a UNION of single-column pruned scans -> "
    "per-column two-phase dedup-count (map-side partial dedup bounds "
    "the shuffle at distinct-per-partition), broadcast-joined back "
    "onto the 6-row report. At petabyte scale swap "
    "exact_distinct=False to fold approx_count_distinct (HLL "
    "partials) into the single stats pass — same report shape. "
    "Numerics: min/max doubles floor-pinned to e6 integers (identical "
    "IEEE mul on both engines); sums via the decimal(18,6) discipline "
    "emitted as integral e6 BIGINTs (ANSI casts fail loud on overflow "
    "rather than round)",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile_core(load_table(spark, sf_dir, "lineitem"))


def table_profile_core(l: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_NUM + _PROFILE_CAT:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__nd"))
    for c in _PROFILE_NUM:
        aggs.append(
            F.floor(F.min(c) * F.lit(1e6) + F.lit(0.5)).cast("long").alias(f"{c}__min")
        )
        aggs.append(
            F.floor(F.max(c) * F.lit(1e6) + F.lit(0.5)).cast("long").alias(f"{c}__max")
        )
        aggs.append(
            (F.sum(F.col(c).cast("decimal(18,6)")) * F.lit(1000000))
            .cast("long")
            .alias(f"{c}__sum")
        )
    one = l.agg(*aggs)
    nd_slot = "`{c}__nd`" if not exact_distinct else None
    rows = []
    for c in _PROFILE_NUM:
        nd = nd_slot.format(c=c) if nd_slot else "CAST(NULL AS BIGINT)"
        rows.append(
            f"'{c}', n_rows - `{c}__nn`, {nd}, `{c}__min`, `{c}__max`, `{c}__sum`"
        )
    for c in _PROFILE_CAT:
        nd = nd_slot.format(c=c) if nd_slot else "CAST(NULL AS BIGINT)"
        rows.append(
            f"'{c}', n_rows - `{c}__nn`, {nd}, "
            "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)"
        )
    stack = (
        f"stack({len(rows)}, " + ", ".join(rows) + ") AS "
        "(col_name, n_null, n_distinct, min_e6, max_e6, sum_e6)"
    )
    order = ["col_name", "n_rows", "n_null", "n_distinct", "min_e6", "max_e6", "sum_e6"]
    wide = one.select(F.col("n_rows"), F.expr(stack))
    if not exact_distinct:
        return wide.select(*order)
    # exact path: one pruned scan per type family -> two-phase
    # dedup-count. COUNT(DISTINCT all-NULL) is 0, so the join is LEFT +
    # coalesce.
    def _dedup_counts(cols: list[str], pin_type: str) -> DataFrame:
        # ONE pruned scan per type family (r13; was one scan per column
        # unioned — 6 scans of the same file): posexplode an array of the
        # type-pinned values and map position -> col_name via a literal
        # array lookup. Each column is still cast to ONE explicit type
        # BEFORE the array build, so heterogeneous source types (e.g.
        # decimal vs double after a fixture regeneration) coerce exactly
        # as the old per-branch pin did, and the NULL filter after the
        # explode matches the old per-branch isNotNull. Total rows into
        # the partial dedup are identical; scans drop 6 -> 2 (+1 stats).
        arr = F.array(*[F.col(c).cast(pin_type) for c in cols])
        names = F.array(*[F.lit(c) for c in cols])
        return (
            l.select(F.posexplode(arr).alias("__i", "v"))
            .where(F.col("v").isNotNull())
            .select(
                F.element_at(names, F.col("__i") + 1).alias("col_name"), "v"
            )
            .dropDuplicates(["col_name", "v"])
            .groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("nd_exact"))
        )

    nd_counts = _dedup_counts(_PROFILE_NUM, "double").unionAll(
        _dedup_counts(_PROFILE_CAT, "string")
    )
    return wide.drop("n_distinct").join(
        F.broadcast(nd_counts), "col_name", "left"
    ).select(
        "col_name",
        "n_rows",
        "n_null",
        F.coalesce(F.col("nd_exact"), F.lit(0)).alias("n_distinct"),
        "min_e6",
        "max_e6",
        "sum_e6",
    )


_CORR_COLS = [
    ("l_quantity", "qty"),
    ("l_extendedprice", "price"),
    ("l_discount", "disc"),
    ("l_tax", "tax"),
]
_CORR_PAIRS = [
    (_CORR_COLS[i], _CORR_COLS[j])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
]


def _corr_oracle() -> str:
    cents = ",\n         ".join(
        f"CAST(floor({c} * 100 + 0.5) AS BIGINT) AS {a}" for c, a in _CORR_COLS
    )
    moments = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for _, a in _CORR_COLS:
        moments.append(f"CAST(SUM({a}) AS HUGEINT) AS s_{a}")
        moments.append(f"SUM(CAST({a} AS HUGEINT) * {a}) AS s_{a}_{a}")
    for (_, x), (_, y) in _CORR_PAIRS:
        moments.append(f"SUM(CAST({x} AS HUGEINT) * {y}) AS s_{x}_{y}")
    selects = []
    for (cx, x), (cy, y) in _CORR_PAIRS:
        va = f"(n * s_{x}_{x} - s_{x} * s_{x})"
        vb = f"(n * s_{y}_{y} - s_{y} * s_{y})"
        num = f"(n * s_{x}_{y} - s_{x} * s_{y})"
        selects.append(
            f"""
SELECT '{cx}' AS col_x, '{cy}' AS col_y,
       CAST(n AS BIGINT) AS n_rows,
       CAST(s_{x}_{y} AS BIGINT) AS sum_xy_cents,
       CASE WHEN {va} > 0 AND {vb} > 0
            THEN CAST(floor(CAST({num} AS DOUBLE)
                            / sqrt(CAST({va} AS DOUBLE) * CAST({vb} AS DOUBLE))
                            * 1e9 + 0.5) AS BIGINT)
       END AS corr_e9
FROM m"""
        )
    body = "\nUNION ALL\n".join(selects)
    moments_sql = ",\n         ".join(moments)
    return f"""
WITH c AS (
  SELECT {cents}
  FROM lineitem
), m AS (
  SELECT {moments_sql}
  FROM c
)
{body}
"""


@query(
    "numeric_corr_matrix",
    oracle=_corr_oracle(),
    doc="Pearson correlation matrix over the numeric measure columns — "
    "the feature-redundancy / data-drift QA pass of a training "
    "pipeline: values land on an exact integer (cent) grid, all five "
    "moment sums per pair are EXACT integers (decimal(38,0) on Spark, "
    "HUGEINT on DuckDB), and corr is ONE identical written IEEE "
    "sequence cast/mul/sqrt/div from those exact integers, floor-"
    "pinned to e9 — deliberately NOT the engines' native corr() "
    "(Welford accumulation order differs per partitioning). One "
    "combiner-friendly hash agg over a narrow 4-column projection, "
    "1-row fold, zero joins: the shape survives any scale. Residual "
    "caveat (split_kl ln precedent): integer-to-double casts beyond "
    "2^53 are correctly rounded on the JVM but two-step on DuckDB "
    "(upper*2^64 + lower), so a last-ulp divergence landing exactly "
    "on an e9 half-boundary is theoretically possible; zero-variance "
    "columns yield NULL via lazy CASE (ANSI-total division)",
)
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_corr_matrix_core(load_table(spark, sf_dir, "lineitem"))


def numeric_corr_matrix_core(l: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    cents = l.select(
        *[
            F.floor(F.col(c) * F.lit(100.0) + F.lit(0.5)).cast("long").alias(a)
            for c, a in _CORR_COLS
        ]
    )
    d38 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for _, a in _CORR_COLS:
        aggs.append(F.sum(a).alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a).cast(d38) * F.col(a)).alias(f"s_{a}_{a}"))
    for (_, x), (_, y) in _CORR_PAIRS:
        aggs.append(F.sum(F.col(x).cast(d38) * F.col(y)).alias(f"s_{x}_{y}"))
    m = cents.agg(*aggs)

    n38 = F.col("n").cast(d38)
    proj = [F.col("n").alias("n_rows")]
    for (_, x), (_, y) in _CORR_PAIRS:
        va = n38 * F.col(f"s_{x}_{x}") - F.col(f"s_{x}").cast(d38) * F.col(f"s_{x}")
        vb = n38 * F.col(f"s_{y}_{y}") - F.col(f"s_{y}").cast(d38) * F.col(f"s_{y}")
        num = n38 * F.col(f"s_{x}_{y}") - F.col(f"s_{x}").cast(d38) * F.col(f"s_{y}")
        proj.append(F.col(f"s_{x}_{y}").cast("long").alias(f"sxy__{x}_{y}"))
        proj.append(
            F.when(
                (va > 0) & (vb > 0),
                F.floor(
                    num.cast("double")
                    / F.sqrt(va.cast("double") * vb.cast("double"))
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("long"),
            ).alias(f"corr__{x}_{y}")
        )
    wide = m.select(*proj)
    rows = [
        f"'{cx}', '{cy}', `sxy__{x}_{y}`, `corr__{x}_{y}`"
        for (cx, x), (cy, y) in _CORR_PAIRS
    ]
    stack = (
        f"stack({len(rows)}, " + ", ".join(rows) + ") AS "
        "(col_x, col_y, sum_xy_cents, corr_e9)"
    )
    return wide.select(F.col("n_rows"), F.expr(stack))


@query(
    "mad_outlier_profile",
    oracle="""
WITH y AS (
  SELECT event_type, 2 * CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
), dev AS (
  SELECT event_type, y,
         QUANTILE_CONT(y, 0.5) OVER (PARTITION BY event_type) AS m
  FROM y
), dev2 AS (
  SELECT event_type, m, ABS(CAST(y AS DOUBLE) - m) AS d FROM dev
), dev3 AS (
  SELECT event_type, m, d,
         QUANTILE_CONT(d, 0.5) OVER (PARTITION BY event_type) AS mad
  FROM dev2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ANY_VALUE(m) AS BIGINT) AS med_x2e6,
       CAST(floor(ANY_VALUE(mad) * 2.0) AS BIGINT) AS mad_x4e6,
       CAST(SUM(CASE WHEN d > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev3
GROUP BY event_type
""",
    doc="robust per-group outlier profile: median/MAD (median absolute "
    "deviation) with a strict |x-med| > 3*MAD flag count — the data-QA "
    "twin of event_volume_anomaly's mean/std z-score that heavy tails "
    "cannot poison (one wild value moves a mean arbitrarily, a median "
    "not at all). NUMERICS: values land on a DOUBLED e6 integer grid "
    "first (floor pin, identical IEEE mul), so every interpolated "
    "median is midpoint-of-even-integers = EXACT integer and MAD is "
    "exact integer-or-half — both engines' interpolation formulas "
    "(a+(b-a)*f vs lerp) agree bit-for-bit on exact inputs, which raw "
    "doubles would NOT guarantee. PLAN: both percentile windows and "
    "the final agg share ONE hash exchange on event_type (plan-"
    "asserted); exact per-group percentile buffers are the known "
    "deliberate cost — at 100 TB swap the windows for the mergeable "
    "sketch path (agg_quantiles_mergeable) with a p50 +/- eps "
    "envelope",
)
def mad_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outlier_profile_core(load_table(spark, sf_dir, "events"))


def mad_outlier_profile_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    y = e.where(F.col("value").isNotNull()).selectExpr(
        "event_type", "2 * CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y"
    )
    dev = y.selectExpr(
        "event_type",
        "y",
        "percentile(y, 0.5D) OVER (PARTITION BY event_type) AS m",
    ).selectExpr("event_type", "m", "abs(CAST(y AS DOUBLE) - m) AS d")
    dev2 = dev.selectExpr(
        "event_type",
        "m",
        "d",
        "percentile(d, 0.5D) OVER (PARTITION BY event_type) AS mad",
    )
    return dev2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("m").cast("long").alias("med_x2e6"),
        F.floor(F.first("mad") * F.lit(2.0)).cast("long").alias("mad_x4e6"),
        F.sum(F.when(F.col("d") > F.lit(3.0) * F.col("mad"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
    )


@query(
    "k_anonymity_audit",
    oracle="""
WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS sz
  FROM events
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       CAST(MAX(sz) AS BIGINT) AS max_group,
       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_groups_below_5,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_below_5
FROM g
""",
    doc="k-anonymity audit over the quasi-identifier set "
    "(event_type, day) — the privacy gate run before event data feeds "
    "a training pipeline: k = the SMALLEST equivalence-class size (one "
    "row sharing its QI combination with fewer than k-1 others is "
    "re-identifiable), plus the below-threshold group/row exposure "
    "counts a suppression pass would drop. One hash agg on the QI key "
    "then a 1-row fold — map-side partial counts make this one narrow "
    "shuffle at any corpus size. All exact integers; day is a GROUP "
    "key only (the computed-date dtype rule never fires)",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("sz"))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.min("sz").cast("long").alias("k_anonymity"),
        F.max("sz").cast("long").alias("max_group"),
        F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_5"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_5"),
    )


@query(
    "referential_integrity_audit",
    oracle="""
WITH co AS (
  SELECT 'orders->customer' AS fk,
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child_rows,
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT) AS n_orphans,
         CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_parents,
         CAST((SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey))
              AS BIGINT) AS n_childless_parents,
         CAST((SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM orders
                                   GROUP BY o_custkey)) AS BIGINT)
           AS max_fanout
),
lo AS (
  SELECT 'lineitem->orders' AS fk,
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                 WHERE l.l_orderkey = o.o_orderkey))
              AS BIGINT),
         CAST((SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM lineitem
                                   GROUP BY l_orderkey)) AS BIGINT)
)
SELECT * FROM co UNION ALL SELECT * FROM lo ORDER BY fk
""",
    doc="referential-integrity audit over the two TPC-H FK edges "
    "(orders.o_custkey -> customer, lineitem.l_orderkey -> orders) — "
    "the join-health report run before any pipeline trusts a join: "
    "orphan child rows (inner joins silently drop them), childless "
    "parents, and the max fanout (the skew bound for the join's hot "
    "key). PLAN per edge: ONE hash agg on the child FK (map-side "
    "partial counts), then a single full-outer join of d-i-s-t-i-n-c-t "
    "keys against the parent key set — child rows are never shuffled "
    "twice and orphan detection needs no second scan. All exact "
    "integers",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def edge(
        child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str, name: str
    ) -> DataFrame:
        fan = child.groupBy(F.col(fk_col).alias("__k")).agg(
            F.count(F.lit(1)).alias("__n")
        )
        pk = parent.select(F.col(pk_col).alias("__k")).distinct().withColumn(
            "__p", F.lit(1)
        )
        j = fan.join(pk, "__k", "full_outer")
        # every SUM is coalesced AFTER aggregating: a global agg over an
        # EMPTY join emits one row with NULL sums, while the oracle's
        # COUNT(*) subqueries yield 0 — empty-table parity (r11 fuzz).
        # max_fanout stays NULL on both (MAX over empty is NULL in SQL).
        return j.agg(
            F.lit(name).alias("fk"),
            F.coalesce(F.sum(F.coalesce(F.col("__n"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_child_rows"),
            F.coalesce(
                F.sum(F.when(F.col("__p").isNull(), F.col("__n")).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_orphans"),
            F.coalesce(F.sum(F.coalesce(F.col("__p"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_parents"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__p").isNotNull() & F.col("__n").isNull(), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_childless_parents"),
            F.max("__n").cast("long").alias("max_fanout"),
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        edge(o, "o_custkey", c, "c_custkey", "orders->customer")
        .unionByName(edge(l, "l_orderkey", o, "o_orderkey", "lineitem->orders"))
        .orderBy("fk")
    )

"""LLM-data-pipeline queries (SURVEY.md §2C): dedup family, similarity
search, text analysis, multimodal columns — over the `documents` and
`embeddings` fixtures. Driver-mandated extensions beyond the reference's
own surface (BASELINE.json north_star).

Oracle notes: hashing-based ops (MinHash/LSH/SimHash) use Spark xxhash64,
which DuckDB lacks → registered without oracle SQL (driver rows-only
check), but they are deterministic and unit-tested. Everything else ships
an exact DuckDB twin, with float discipline per plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.functions.text import (
    distinct_token_count,
    fingerprint,
    language_id,
    quality_score,
    rolling_fingerprints,
    token_count,
    tokenize,
)
from duck_delta_share_spark.operators import dedup as dd
from duck_delta_share_spark.operators import similarity as sim
from duck_delta_share_spark.plans.registry import DEC, query, sql_davg

_NORM = "regexp_replace(trim(lower(text)), ' +', ' ', 'g')"

_SCRATCH_ROOT = None


def _scratch_dir(name: str):
    """Bounded per-process scratch dir for queries that materialize Delta
    tables as part of their plan (the lifecycle e2e queries + the
    persisted IVF index). A fresh ``tempfile.mkdtemp`` per invocation
    leaks unbounded /tmp across bench/sweep/scale loops (ADVICE r11 —
    ``incremental_dedup_maintained`` rewrites a compacted corpus every
    run). Instead: ONE root per process (PID-keyed so concurrent drivers
    never collide), removed at interpreter exit; inside it one dir per
    query name, TRUNCATED on the next invocation (every harness —
    driver, bench, verify, scale_check — consumes a query's frame before
    invoking the next, so the prior invocation's lazy plan is never
    still live); roots left by dead PIDs are swept on first use, so
    repeated kills can't accrete either.
    """
    global _SCRATCH_ROOT
    import atexit
    import os
    import shutil
    import tempfile
    from pathlib import Path

    base = Path(tempfile.gettempdir())
    if _SCRATCH_ROOT is None:
        for p in base.glob("ddss_scratch_*"):
            try:
                pid = int(p.name.rsplit("_", 1)[1])
            except ValueError:
                continue
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                shutil.rmtree(p, ignore_errors=True)
            except PermissionError:
                pass  # PID alive under another uid — not ours to sweep
        _SCRATCH_ROOT = base / f"ddss_scratch_{os.getpid()}"
        _SCRATCH_ROOT.mkdir(exist_ok=True)
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    d = _SCRATCH_ROOT / name
    if d.exists():
        shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True, exist_ok=True)
    return d


def _int_str(x):
    """Element serializer for integer arrays (1-arg transform lambda —
    CLAUDE.md: two-arg lambdas receive the element INDEX)."""
    return x.cast("string")


def _f6(x):
    """Element serializer for double arrays: fixed %.6f rendering so the
    joined string is deterministic across partitions/runs. Driver-checked
    queries must not emit array-typed columns (VERDICT r2: the driver's
    canonicalizer cannot sort numpy arrays)."""
    return F.format_string("%.6f", x.cast("double"))

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle=f"""
SELECT md5({_NORM}) AS fp,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_cnt
FROM documents
GROUP BY fp
""",
    doc="exact-dup groups keyed by normalized-text md5 fingerprint",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


@query(
    "dedup_exact_rows",
    oracle=f"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
  FROM documents
) t
WHERE rn = 1
""",
    doc="surviving rows after exact dedup (lowest doc_id per fingerprint)",
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_distinct,
       ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE), 6) AS distinct_ratio,
       n_chars
FROM documents
""",
    doc="per-doc token counting (whitespace) + type/token ratio",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        distinct_token_count("text").alias("n_distinct"),
        F.round(
            distinct_token_count("text").cast("double") / token_count("text").cast("double"), 6
        ).alias("distinct_ratio"),
        "n_chars",
    )


@query(
    "doc_fingerprint_rolling",
    oracle="""
WITH grams AS (
  SELECT doc_id,
         LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LENGTH(text) - 7, 1)),
                        i -> MD5(SUBSTR(text, i, 8))) AS fps
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       LIST_MIN(fps) AS fp_min,
       CAST(LEN(LIST_DISTINCT(fps)) AS INT) AS n_distinct_grams
FROM grams
""",
    doc="rolling-hash document fingerprinting: md5 over sliding char 8-grams "
    "(Rabin-Karp shape); min gram = winnowing-style representative, distinct "
    "count = content richness; pure codegen transform/sequence, no UDF",
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text excluded on both sides (r7 NULL fuzz)
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    fps = rolling_fingerprints("text", k=8)
    return d.select(
        "doc_id",
        F.array_min(fps).alias("fp_min"),
        F.size(F.array_distinct(fps)).alias("n_distinct_grams"),
    )


@query(
    "text_quality_score",
    oracle="""
SELECT doc_id,
       ROUND(
         (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
          / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)) * 0.7
         + LEAST(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.3,
       6) AS quality
FROM documents
""",
    doc="heuristic quality score: distinct-token ratio + length factor",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


@query(
    "quality_calibration_bins",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         CAST(floor(ROUND(
           (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
            / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)) * 0.7
           + LEAST(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) / 50.0,
                   1.0) * 0.3,
         6) * 1e6 + 0.5) AS BIGINT) AS q_e6,
         CASE
           WHEN ' ' || text || ' ' LIKE '% the %'
             OR ' ' || text || ' ' LIKE '% and %'
             OR ' ' || text || ' ' LIKE '% of %'
             OR ' ' || text || ' ' LIKE '% der %'
             OR ' ' || text || ' ' LIKE '% und %'
             OR ' ' || text || ' ' LIKE '% die %'
             OR ' ' || text || ' ' LIKE '% el %'
             OR ' ' || text || ' ' LIKE '% los %'
             OR ' ' || text || ' ' LIKE '% que %'
             OR ' ' || text || ' ' LIKE '% le %'
             OR ' ' || text || ' ' LIKE '% les %'
             OR ' ' || text || ' ' LIKE '% des %'
           THEN 1 ELSE 0 END AS is_natural
  FROM documents WHERE text IS NOT NULL
),
binned AS (
  SELECT LEAST(q_e6 // 100000, 9) AS bin, q_e6, is_natural FROM scored
)
SELECT CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q_e6) // COUNT(*) AS BIGINT) AS mean_quality_e6,
       CAST(SUM(is_natural) AS BIGINT) AS n_natural,
       CAST(floor(CAST(SUM(is_natural) AS DOUBLE) * 1e6 / COUNT(*) + 0.5)
            AS BIGINT) AS natural_rate_e6
FROM binned GROUP BY bin ORDER BY bin
""",
    doc="quality-classifier CALIBRATION audit (reliability-diagram bins — "
    "the report run before a learned or heuristic quality score gates a "
    "corpus): predicted quality (functions/text.py:quality_score) bucketed "
    "into deciles, each bin's doc count, mean predicted score, and the "
    "empirical rate of an INDEPENDENT naturalness label (stopword-marker "
    "language-ID fires, i.e. the text contains any known-language "
    "function word). A well-calibrated score has natural_rate rising "
    "with bin — the measured curve IS the calibration evidence. All "
    "exact: score pinned to e6 (floor(x*1e6+0.5) on both engines), bin "
    "= integer DIV, mean = exact integer sums + integer DIV, rate = one "
    "IEEE division of exact integers then floor-pin. One hash agg on a "
    "10-value key — no shuffle pressure at any corpus size",
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        F.floor(quality_score("text") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("q_e6"),
        F.when(language_id("text") != F.lit("und"), 1)
        .otherwise(0)
        .alias("is_natural"),
    )
    binned = scored.select(
        F.least(F.expr("q_e6 div 100000"), F.lit(9)).cast("int").alias("bin"),
        "q_e6",
        "is_natural",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(q_e6) div count(*)").cast("long").alias(
                "mean_quality_e6"
            ),
            F.sum("is_natural").cast("long").alias("n_natural"),
            F.floor(
                F.sum("is_natural").cast("double")
                * F.lit(1e6)
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("natural_rate_e6"),
        )
        .orderBy("bin")
    )


@query(
    "text_langid_heuristic",
    oracle="""
SELECT doc_id, lang,
       CASE
         WHEN ' ' || text || ' ' LIKE '% the %' OR ' ' || text || ' ' LIKE '% and %'
              OR ' ' || text || ' ' LIKE '% of %' THEN 'en'
         WHEN ' ' || text || ' ' LIKE '% der %' OR ' ' || text || ' ' LIKE '% und %'
              OR ' ' || text || ' ' LIKE '% die %' THEN 'de'
         WHEN ' ' || text || ' ' LIKE '% el %' OR ' ' || text || ' ' LIKE '% los %'
              OR ' ' || text || ' ' LIKE '% que %' THEN 'es'
         WHEN ' ' || text || ' ' LIKE '% le %' OR ' ' || text || ' ' LIKE '% les %'
              OR ' ' || text || ' ' LIKE '% des %' THEN 'fr'
         ELSE 'und'
       END AS lang_pred
FROM documents
""",
    doc="stopword-marker language-ID heuristic (deterministic n-gram proxy)",
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", language_id("text").alias("lang_pred"))


@query(
    "text_lang_distribution",
    oracle="""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""",
    doc="corpus composition: docs + chars per (lang, source)",
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@query(
    "tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
  ) t
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS doc_freq,
       ROUND(LN((SELECT nd FROM n) * 1.0 / COUNT(*)), 6) AS idf
FROM tok
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT 20
""",
    doc="document frequency + IDF per term (TF-IDF building block)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    tok = d.select("doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .crossJoin(F.broadcast(nd))
        .select(
            "token",
            "doc_freq",
            F.round(F.log(F.col("nd") * 1.0 / F.col("doc_freq")), 6).alias("idf"),
        )
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------


_JACCARD_PAIRS_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, lang, source, shingle FROM (
    SELECT doc_id, lang, source,
           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
                  i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents
  ) t
), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS xn
  FROM sh a
  JOIN sh b ON a.lang = b.lang AND a.source = b.source
           AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(xn AS DOUBLE) / CAST(sa.sz + sb.sz - xn AS DOUBLE) > 0.15
"""


@query(
    "ngram_jaccard_neardup",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, lang, source, shingle FROM (
    SELECT doc_id, lang, source,
           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
                  i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents
  ) t
), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS xn
  FROM sh a
  JOIN sh b ON a.lang = b.lang AND a.source = b.source
           AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(xn AS DOUBLE) / CAST(sa.sz + sb.sz - xn AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(xn AS DOUBLE) / CAST(sa.sz + sb.sz - xn AS DOUBLE) > 0.15
""",
    doc="exact 3-gram-shingle Jaccard near-dup pairs, blocked by (lang, source)",
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        d, block_cols=["lang", "source"], threshold=0.15, shingle_n=3
    )


@query(
    "minhash_lsh_neardup",
    oracle=None,  # rows-only BY NECESSITY: signatures are xxhash64-based
    # (the production choice: one JVM hash per shingle) and xxhash64 has no
    # DuckDB equivalent, so no oracle can recompute them. Correctness is
    # carried by minhash_md5_lsh_pairs — the hash-checked md5 twin with the
    # identical shingle → min-hash → band → bucket-join pipeline.
    doc="MinHash(32)+LSH(8 bands) candidate pairs with Jaccard estimate "
    "(xxhash64 production path; oracle evidence via the md5 twin "
    "minhash_md5_lsh_pairs)",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Signatures feed the band self-join AND the estimate join (4 scans of
    # the same ~k-column table): persist once — at 100 TB this is the
    # standard "materialize the signature table" step, tiny vs. the corpus.
    # LAZY localCheckpoint, not .cache(): no in-function action exists to
    # unpersist after, and CacheManager pins cache() blocks for the
    # session's lifetime (sweep/bench-loop leak); checkpoint blocks are
    # ContextCleaner-freed once the collected frame is GC'd.
    sigs = dd.minhash_signatures(d, num_hashes=32, shingle_n=3).localCheckpoint(
        eager=False
    )
    # materialize_capped: the band-explode + cap-window lineage otherwise
    # evaluates once per self-join side (HOF lambdas defeat exchange
    # reuse) — r13 A/B 4.01->3.50 s / 2.59->2.37 s (see the operator doc)
    pairs = dd.lsh_candidate_pairs(
        sigs, num_hashes=32, bands=8, materialize_capped=True
    )
    return dd.minhash_jaccard_estimate(sigs, pairs, num_hashes=32).orderBy("id_a", "id_b")


@query(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS node, CAST(LEAST(a, MIN(b)) AS BIGINT) AS component
FROM reach GROUP BY a
""",
    doc="near-dup clusters: connected components (iterative hash-min label "
    "propagation, operators/components.py) over the exact-Jaccard pair "
    "graph; oracle = recursive-CTE transitive closure",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        d, block_cols=["lang", "source"], threshold=0.15, shingle_n=3
    ).select("id_a", "id_b")
    return connected_components(pairs).select("node", "component")


_BIGRAM_SQL = (
    "UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)), "
    "i -> ARRAY_TO_STRING(t[i:i+1], ' '))) AS bg"
)

_BACKOFF_ORACLE = f"""
WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
tu AS (SELECT UNNEST(t) AS w FROM tok WHERE doc_id % 2 = 0),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM tu GROUP BY w),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tu),
bi AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS cb FROM (
    SELECT {_BIGRAM_SQL} FROM tok WHERE doc_id % 2 = 0
  ) GROUP BY bg
),
db AS (
  SELECT doc_id, {_BIGRAM_SQL} FROM tok WHERE doc_id % 2 = 1
),
terms AS (
  SELECT db.doc_id,
         CAST(floor(ln(
           CASE WHEN bi.cb IS NOT NULL
                THEN CAST(bi.cb AS DOUBLE) / u1.cw
                ELSE 0.4 * CAST(COALESCE(u2.cw, 0) + 1 AS DOUBLE)
                     / CAST((SELECT n FROM tot) + (SELECT v FROM tot) AS DOUBLE)
           END) * 1e6 + 0.5) AS BIGINT) AS term_e6
  FROM db
  LEFT JOIN bi ON db.bg = bi.bg
  LEFT JOIN uni u1 ON STRING_SPLIT(db.bg, ' ')[1] = u1.w
  LEFT JOIN uni u2 ON STRING_SPLIT(db.bg, ' ')[2] = u2.w
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(term_e6) AS BIGINT) AS sum_e6,
       CAST(floor(CAST(SUM(term_e6) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         AS avg_e6
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "bigram_backoff_score",
    oracle=_BACKOFF_ORACLE,
    doc="bigram language-model scoring with Stupid Backoff (Brants et al. "
    "2007): the LM trains on the even-doc_id half of the corpus (bigram + "
    "unigram counts), the odd half is scored held-out — mean log-score per "
    "bigram position, S(w2|w1) = c(w1,w2)/c(w1) when seen, else "
    "0.4*(c(w2)+1)/(N+V) (add-one on the unigram backoff so unseen words "
    "stay finite). The KenLM-shaped quality gate CCNet uses, as two "
    "count aggregations + shuffle joins on the bigram/word keys (no "
    "driver-side model); per-term e6-scaled integer pinning keeps the "
    "doc sums order-independent and hash-exact vs DuckDB",
)
def bigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import tokenize, word_shingles

    d = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    held = d.filter(F.col("doc_id") % 2 == 1)
    tu = train.select(F.explode(toks).alias("w"))
    uni = tu.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = tu.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("w").alias("v")
    )
    bi = (
        train.select(F.explode(word_shingles(toks, 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    db = held.select(F.col("doc_id"), F.explode(word_shingles(toks, 2)).alias("bg"))
    j = (
        db.join(bi, "bg", "left")
        .withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
        .join(
            uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")),
            "w1",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
    )
    s = F.when(
        F.col("cb").isNotNull(), F.col("cb").cast("double") / F.col("c1")
    ).otherwise(
        F.lit(0.4)
        * (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("n") + F.col("v")).cast("double")
    )
    term = F.floor(F.log(s) * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(term).alias("sum_e6"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_e6",
            F.floor(F.col("sum_e6").cast("double") / F.col("n_bigrams") + F.lit(0.5))
            .cast("long")
            .alias("avg_e6"),
        )
        .orderBy("doc_id")
    )


@query(
    "weighted_quality_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         LEAST(1.0, CAST(n_chars AS DOUBLE) / 2000.0) AS keep_p,
         ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
         ) / 65536.0 AS u
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM scored WHERE u < keep_p
ORDER BY doc_id
""",
    doc="quality-WEIGHTED deterministic sampling: keep probability scales "
    "with a per-doc quality proxy (length, capped), the Bernoulli draw is "
    "md5(doc_id)/2^16 — so membership is stable across runs/partitions "
    "AND proportional to quality, the mixing primitive behind "
    "importance-weighted corpus construction (uniform twins: "
    "dataset_split_assign, per_group_deterministic_sample). Narrow map, "
    "no shuffle; keep_p and the uniform are exact integer rationals",
)
def weighted_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keep_p = F.least(F.lit(1.0), F.col("n_chars").cast("double") / F.lit(2000.0))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        / F.lit(65536.0)
    )
    return (
        d.filter(u < keep_p)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


@query(
    "text_normalize",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g'))) AS norm_md5,
       CAST(length(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g'))) AS BIGINT) AS norm_len
FROM documents ORDER BY doc_id
""",
    doc="canonical text normalization (the step before every exact-dedup "
    "fingerprint): lowercase, strip non-alphanumerics to spaces, collapse "
    "runs, trim — chained codegen regexp_replace over a Java-and-RE2-safe "
    "pattern set (same discipline as pii_redaction), emitted as the md5 "
    "the dedup key would use",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    ).orderBy("doc_id")


@query(
    "dataset_split_assign",
    oracle="""
WITH h AS (
  SELECT doc_id, lang,
         ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
         ) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h ORDER BY doc_id
""",
    doc="deterministic train/val/test assignment: the 80/10/10 split every "
    "training pipeline needs, keyed on md5(doc_id) so membership is stable "
    "across runs, engines and re-partitions (a rand()-based split changes "
    "under retries and can leak val into train on reprocessing). Pure "
    "narrow map — no shuffle; the oracle recomputes the hash bucket "
    "nibble-for-nibble",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@query(
    "char_entropy_quality",
    oracle="""
WITH ch AS (
  SELECT doc_id, UNNEST(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
),
cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c),
agg AS (
  SELECT doc_id,
         CAST(SUM(k) AS BIGINT) AS n_chars,
         CAST(COUNT(*) AS BIGINT) AS distinct_chars,
         CAST(SUM(CAST(floor(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE)) * 1e6
                             + 0.5) AS BIGINT)) AS BIGINT) AS s_e6,
         CAST(SUM(k * k) AS BIGINT) AS s2
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_chars, distinct_chars,
       CAST(floor((ln(CAST(n_chars AS DOUBLE))
                   - (CAST(s_e6 AS DOUBLE) / 1e6) / n_chars) * 1e6 + 0.5)
            AS BIGINT) AS entropy_e6,
       CAST(floor(CAST(s2 AS DOUBLE) * 1e6
                  / (CAST(n_chars AS DOUBLE) * n_chars) + 0.5)
            AS BIGINT) AS simpson_e6
FROM agg ORDER BY doc_id
""",
    doc="char-distribution quality signals (functions/text.py:"
    "char_entropy_signals): Shannon entropy + Simpson concentration of "
    "each document's character histogram — catches keyboard-mash and "
    "repeated-padding docs that length heuristics miss. The entropy sum "
    "accumulates PER-TERM e6-scaled integers (order-independent exact "
    "long sums; only single correctly-rounded IEEE ops touch floats), "
    "Simpson is pure integer math — both hash-exact vs DuckDB",
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import char_entropy_signals

    d = load_table(spark, sf_dir, "documents")
    return char_entropy_signals(d).orderBy("doc_id")


@query(
    "benchmark_contamination",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
                  i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents
  ) t
),
bench AS (SELECT DISTINCT shingle FROM sh
          WHERE doc_id % 50 = 0 AND doc_id < 25000),
corp AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corp GROUP BY doc_id),
ov AS (
  SELECT doc_id, COUNT(*) AS n_overlap FROM corp
  WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(floor(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / s.n_shingles
                  * 1e6 + 0.5) AS BIGINT) AS containment_e6
FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
ORDER BY s.doc_id
""",
    doc="benchmark-contamination detection (operators/dedup.py:"
    "benchmark_containment, GPT-3 appendix-C style): per corpus document, "
    "the fraction of its distinct 3-gram shingles found anywhere in the "
    "'benchmark' split (doc_id % 50 = 0 plays the eval set) — asymmetric "
    "containment so short eval examples inside long training docs still "
    "flag. Benchmark shingles broadcast, corpus probed with a left-semi "
    "join (one corpus pass, no text shuffle); containment pinned to "
    "scaled ints (exact integer ratio, single IEEE division)",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # the benchmark side must be BOUNDED (its distinct shingle set is
    # broadcast): cap the synthetic eval split at 500 docs so it stays
    # fixed-size at ANY corpus scale — a pure %-of-corpus split would
    # grow the broadcast linearly with data (identical rows on the
    # fixtures, where every doc_id < 25000)
    res = dd.benchmark_containment(
        d.filter(F.col("doc_id") % 50 != 0),
        d.filter((F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 25000)),
        shingle_n=3,
    )
    return res.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.floor(F.col("containment") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("containment_e6"),
    ).orderBy("doc_id")


@query(
    "decontaminate_rewrite",
    oracle="""
WITH base AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id,
         UNNEST(RANGE(1, GREATEST(LEN(toks) - 1, 1))) AS s,
         UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
                i -> ARRAY_TO_STRING(toks[i:i+2], ' '))) AS shingle
  FROM base
),
hits AS (
  SELECT DISTINCT doc_id, s FROM sh
  WHERE doc_id % 50 <> 0
    AND shingle IN (SELECT DISTINCT shingle FROM sh
                    WHERE doc_id % 50 = 0 AND doc_id < 25000)
),
cov AS (SELECT DISTINCT doc_id, UNNEST(RANGE(s, s + 3)) AS p FROM hits),
tok AS (
  SELECT doc_id,
         UNNEST(toks) AS tok,
         UNNEST(RANGE(1, LEN(toks) + 1)) AS p
  FROM base WHERE doc_id % 50 <> 0
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.p = t.p
  WHERE cov.p IS NULL
),
agg AS (
  SELECT doc_id, COALESCE(STRING_AGG(tok, ' ' ORDER BY p), '') AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(LEN(b.toks) AS INT) AS n_tokens,
       CAST(LEN(b.toks) - COALESCE(a.n_kept, 0) AS INT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM base b LEFT JOIN agg a USING (doc_id)
WHERE b.doc_id % 50 <> 0
ORDER BY doc_id
""",
    doc="benchmark DECONTAMINATION rewrite (operators/dedup.py:"
    "decontaminate_rewrite — the GPT-3 appendix-C / PaLM 'dirty n-gram' "
    "scrub applied as a REWRITE, not a document drop): every token "
    "covered by a word 3-gram that appears anywhere in the eval split "
    "(doc_id % 50 = 0, bounded) is excised and the cleaned text "
    "re-emitted, so long documents survive decontamination. Benchmark "
    "shingles broadcast; only HIT starts leave the probe; cleaned text "
    "is rebuilt array-side (sorted hit starts -> covered-index set -> "
    "indexed filter) with no order-sensitive collect_list. Pure string "
    "plumbing — the full rewritten text hash-checks against DuckDB's "
    "independent string_agg reconstruction",
)
def decontaminate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return dd.decontaminate_rewrite(
        d.filter(F.col("doc_id") % 50 != 0),
        d.filter((F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 25000)),
        shingle_n=3,
    ).orderBy("doc_id")


@query(
    "decontaminate_blocklist",
    oracle="""
WITH base AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
block AS (
  SELECT DISTINCT UNNEST(toks) AS tok FROM base
  WHERE doc_id % 200 = 0 AND doc_id < 25000
),
tok AS (
  SELECT doc_id, UNNEST(toks) AS tok, UNNEST(RANGE(1, LEN(toks) + 1)) AS p
  FROM base WHERE doc_id % 200 <> 0
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tok t LEFT JOIN block b ON t.tok = b.tok
  WHERE b.tok IS NULL
),
agg AS (
  SELECT doc_id, COALESCE(STRING_AGG(tok, ' ' ORDER BY p), '') AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(LEN(b.toks) AS INT) AS n_tokens,
       CAST(LEN(b.toks) - COALESCE(a.n_kept, 0) AS INT) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM base b LEFT JOIN agg a USING (doc_id)
WHERE b.doc_id % 200 <> 0
ORDER BY doc_id
""",
    doc="token-BLOCKLIST scrub: decontaminate_rewrite at shingle_n=1 — a "
    "registered variant because the plan shape is genuinely distinct "
    "(coverage degenerates to the hit positions themselves: no "
    "start-coverage expansion, no sequence/flatten — the PII/toxicity "
    "blocklist mode of the same rewrite machinery). Blocklist = the "
    "distinct tokens of a bounded provider split (doc_id % 200 = 0), "
    "broadcast; the oracle simplifies to an order-preserving anti-join "
    "reconstruction (VERDICT r11 item 6 / builder r12 candidate)",
)
def decontaminate_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return dd.decontaminate_rewrite(
        d.filter(F.col("doc_id") % 200 != 0),
        d.filter((F.col("doc_id") % 200 == 0) & (F.col("doc_id") < 25000)),
        shingle_n=1,
    ).orderBy("doc_id")


_SIMHASH_SIG_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
),
h AS (
  SELECT doc_id, md5(CONCAT('sh|', t)) AS hx FROM tok
),
votes AS (
  SELECT doc_id, b.i AS bit,
         SUM(CASE WHEN ((strpos('0123456789abcdef',
                                substr(hx, (b.i // 4) + 1, 1)) - 1)
                        >> (b.i % 4)) & 1 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM h CROSS JOIN (SELECT UNNEST(generate_series(0, 31)) AS i) b
  GROUP BY doc_id, b.i
)
SELECT doc_id,
       -- CAST the SUM itself: DuckDB types SUM(BIGINT) as HUGEINT, which
       -- pandas materializes as float64 and the driver canonicalizer then
       -- hashes differently from Spark's int64 (r3 VERDICT #1).
       CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit)
                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "simhash_signatures",
    oracle=_SIMHASH_SIG_ORACLE,
    doc="SimHash signature per document, hash-checked (r2 VERDICT #8) via "
    "the md5 bit-vote family the oracle can reproduce nibble-for-nibble; "
    "the production signature path (one xxhash64 per token, 48 bits — no "
    "DuckDB twin exists for xxhash64) is exercised by simhash_neardup and "
    "the dedup tests, with identical plan shape: explode → one groupBy "
    "with per-bit conditional sums → bit-pack",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_md5(d, bits=32).orderBy("doc_id")


@query(
    "simhash_neardup",
    oracle=None,  # rows-only BY NECESSITY: xxhash64 signatures have no
    # DuckDB twin; the full vote→pack→block→Hamming pipeline is
    # hash-checked via simhash_md5_pairs / simhash_signatures (md5 family)
    doc="SimHash near-dup pairs: prefix-bit blocking (cheap LSH) + exact "
    "Hamming distance via bit_count(xor) within each block; the Hamming "
    "radius is the fuzziness dial (tight radius 2 here — the synthetic "
    "docs share a small vocabulary, so token-frequency signatures cluster)",
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dd.simhash(d, bits=48)
    # pigeonhole blocking (Manku 2007): EXACT recall at hamming <= 2 and
    # 3 x 65536 buckets — the old 8-bit prefix blocking missed pairs
    # differing inside the prefix and, worse, its 256 buckets ALL exceed
    # the degenerate-bucket cap once the corpus passes ~512k docs,
    # silently emitting zero pairs at production scale
    return dd.simhash_near_pairs(
        sigs, max_hamming=2, bits=48, method="pigeonhole"
    ).orderBy("id_a", "id_b")


@query(
    "simhash_md5_pairs",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
),
h AS (
  SELECT doc_id, md5(CONCAT('sh|', t)) AS hx FROM tok
),
votes AS (
  SELECT doc_id, b.i AS bit,
         SUM(CASE WHEN ((strpos('0123456789abcdef',
                                substr(hx, (b.i // 4) + 1, 1)) - 1)
                        >> (b.i % 4)) & 1 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM h CROSS JOIN (SELECT UNNEST(generate_series(0, 31)) AS i) b
  GROUP BY doc_id, b.i
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit)
                  ELSE CAST(0 AS BIGINT) END) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b
  ON (a.simhash >> 24) = (b.simhash >> 24) AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
ORDER BY id_a, id_b
""",
    doc="HASH-CHECKED SimHash twin (VERDICT r2 #5, mirroring the "
    "minhash_md5_lsh_pairs trick): md5-nibble bit votes -> 32-bit packed "
    "signature -> prefix-8 blocking -> exact Hamming via bit_count(xor), "
    "reproduced bit-for-bit by the DuckDB oracle. Puts the whole SimHash "
    "pipeline (tokenize, vote, pack, block, Hamming) under the value-hash "
    "gate; production stays the xxhash64 simhash (one 64-bit hash per "
    "token vs one md5)",
)
def simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dd.simhash_md5(d, bits=32)
    return (
        dd.simhash_near_pairs(
            sigs, max_hamming=6, prefix_bits=8, bits=32, max_bucket_size=None
        )
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

# Dot/norm as per-row LEFT FOLDS over the array: the fold order is pinned
# by the array itself (row-local, partitioning-independent), and DuckDB's
# list_reduce folds in the same order → bit-identical doubles on both
# engines without decimal arithmetic. float32 promoted to double BEFORE the
# multiply (float*float products are exactly representable in double).
_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)

_SIM_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         {_DOT.format(a='q.embedding', b='b.embedding')}
         / (SQRT({_DOT.format(a='q.embedding', b='q.embedding')})
            * SQRT({_DOT.format(a='b.embedding', b='b.embedding')})) AS cosine
  FROM embeddings q
  JOIN embeddings b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < 10
    AND {_DOT.format(a='q.embedding', b='q.embedding')} > 0
    AND {_DOT.format(a='b.embedding', b='b.embedding')} > 0
)
SELECT query_id, vec_id, cosine, rk FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "similarity_topk_exact",
    oracle=_SIM_ORACLE,
    doc="brute-force cosine top-5 per query vector; order-pinned per-row "
    "double fold matches the oracle bit-exactly (the correctness baseline "
    "for ANN)",
)
def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5, exact=False)


_Q8 = """
  SELECT vec_id,
         CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
              THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(
                  embedding,
                  x -> CAST(floor(
                      CAST(x AS DOUBLE)
                      / (list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0)
                      + 0.5) AS BIGINT))
         END AS q
  FROM embeddings
"""

_INT8_TOPK_ORACLE = f"""
WITH qv AS ({_Q8}),
n AS (
  SELECT vec_id, q,
         list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b) AS n2
  FROM qv
),
scored AS (
  SELECT qs.vec_id AS query_id, b.vec_id AS vec_id,
         CAST(list_reduce(list_transform(list_zip(qs.q, b.q),
                                         p -> p[1] * p[2]),
                          (a, b) -> a + b) AS DOUBLE)
           / sqrt(CAST(qs.n2 * b.n2 AS DOUBLE)) AS score
  FROM n qs JOIN n b ON b.vec_id <> qs.vec_id
  WHERE qs.vec_id < 10 AND qs.n2 > 0 AND b.n2 > 0
)
SELECT query_id, vec_id, score_e6, rk FROM (
  SELECT query_id, vec_id,
         CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_e6,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "similarity_topk_int8",
    oracle=_INT8_TOPK_ORACLE,
    doc="QUANTIZED top-k (operators/similarity.py:int8_topk): candidates "
    "scored on symmetric-int8 vectors — 4x less memory bandwidth than "
    "float32, the FAISS-style scan shape at 100 TB. The quantized cosine "
    "idot/sqrt(saa*sbb) uses INTEGER dot products (exact long sums, "
    "order-independent) with single correctly-rounded IEEE division/sqrt, "
    "so the score — unlike float32 accumulations — is bit-identical "
    "across engines and the whole ranking sits under the DuckDB oracle, "
    "which re-derives the quantization and integer dots from the float "
    "embeddings from first principles",
)
def similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.int8_topk(e, e.filter(F.col("vec_id") < 10), k=5)


_INT8_RANGE_ORACLE = f"""
WITH qv AS ({_Q8}),
n AS (
  SELECT vec_id, q,
         list_reduce(list_transform(q, x -> x * x), (a, b) -> a + b) AS n2
  FROM qv
),
scored AS (
  SELECT qs.vec_id AS query_id, b.vec_id AS vec_id,
         CAST(list_reduce(list_transform(list_zip(qs.q, b.q),
                                         p -> p[1] * p[2]),
                          (a, b) -> a + b) AS DOUBLE)
           / sqrt(CAST(qs.n2 * b.n2 AS DOUBLE)) AS score
  FROM n qs JOIN n b ON b.vec_id <> qs.vec_id
  WHERE qs.vec_id < 25 AND qs.n2 > 0 AND b.n2 > 0
)
SELECT query_id, vec_id, score_e6 FROM (
  SELECT query_id, vec_id,
         CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_e6
  FROM scored
) WHERE score_e6 >= 300000
ORDER BY query_id, vec_id
"""


@query(
    "similarity_range_search",
    oracle=_INT8_RANGE_ORACLE,
    doc="radius / threshold search (operators/similarity.py:"
    "int8_range_search — FAISS range_search): ALL pairs whose quantized "
    "cosine clears 0.30, not a fixed k. Strictly better scale shape than "
    "top-k: broadcast queries + narrow filter means ZERO shuffles (no "
    "ranking window), the pass dedup pipelines use to pull every "
    "near-neighbor above a similarity bar. Integer-exact scoring (same "
    "as similarity_topk_int8) keeps the full pipeline under the oracle",
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.int8_range_search(
        e, e.filter(F.col("vec_id") < 25), min_score_e6=300_000
    ).orderBy("query_id", "vec_id")


@query(
    "similarity_ann_pq",
    oracle=_INT8_TOPK_ORACLE,
    doc="product-quantization ANN (operators/similarity.py:pq_topk): base "
    "vectors compress to m code indexes, candidates score via per-query "
    "INTEGER ADC tables (m lookups instead of a dim-length dot) and the "
    "reconstructed-norm cosine — the memory-bound FAISS scan shape. Run "
    "here in the provably-LOSSLESS configuration (one codeword per "
    "distinct int8 subvector -> encoding exactly invertible), so the "
    "whole encode->ADC->rank pipeline is BIT-identical to the int8 exact "
    "scan and sits under the same DuckDB oracle (the PQ analogue of "
    "IVF's n_probe=n_centroids trick). Lossy codebooks + the ADC-"
    "shortlist-then-exact-rerank refine path are recall-tested in "
    "tests/test_llm_ops_r4.py",
)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    books = sim.lossless_pq_codebooks(e, dim=64, m=8)
    return sim.pq_topk(
        e, e.filter(F.col("vec_id") < 10), dim=64, m=8, codebooks=books
    )


_LSH_LATTICE_ORACLE = f"""
WITH ve AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS q6
  FROM embeddings
  WHERE embedding IS NOT NULL AND LEN(embedding) = 64
),
planes AS (
  SELECT t.tt AS t, i.ii AS i, j.jj AS j,
         CAST(concat('0x', substr(md5(
             CAST(t.tt AS VARCHAR) || '|' || CAST(i.ii AS VARCHAR)
             || '|' || CAST(j.jj AS VARCHAR)), 1, 7)) AS BIGINT)
           % 17 - 8 AS c
  FROM range(8) t(tt), range(4) i(ii), range(64) j(jj)
),
dots AS (
  SELECT v.vec_id, p.t, p.i, SUM(p.c * v.q6[p.j + 1]) AS d
  FROM ve v JOIN planes p ON TRUE
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, t,
         SUM(CASE WHEN d > 0 THEN CAST(POW(2, i) AS BIGINT) ELSE 0 END)
           + t * 4294967296 AS tb
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS vec_id
  FROM buckets q JOIN buckets b
    ON q.tb = b.tb AND b.vec_id <> q.vec_id
  WHERE q.vec_id < 10
),
scored AS (
  SELECT c.query_id, c.vec_id,
         {_DOT.format(a='q.embedding', b='b.embedding')}
         / (SQRT({_DOT.format(a='q.embedding', b='q.embedding')})
            * SQRT({_DOT.format(a='b.embedding', b='b.embedding')}))
           AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings b ON b.vec_id = c.vec_id
  WHERE {_DOT.format(a='q.embedding', b='q.embedding')} > 0
    AND {_DOT.format(a='b.embedding', b='b.embedding')} > 0
)
SELECT query_id, vec_id, cosine, rk FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "similarity_ann_lsh",
    oracle=_LSH_LATTICE_ORACLE,
    doc="multi-table sign-LSH approximate top-5, HASH-CHECKED end to end "
    "(operators/similarity.py:lsh_lattice_topk): md5-derived integer-"
    "lattice hyperplanes over e6-grid-pinned vectors make every plane "
    "dot an exact int64 (order-independent), so the buckets, the "
    "candidate pairs AND the ranked output are bit-identical to the "
    "DuckDB first-principles re-derivation — the minhash_md5 trick "
    "applied to hyperplanes, closing the float-plane last-ulp sign gap "
    "that kept this entry rows-only since r2. The float-Gaussian "
    "production path (lsh_bucket_topk) shares the candidate-join and "
    "scoring code verbatim and keeps its (k,L) S-curve recall tests "
    "(tests/test_ann_recall.py). Scale shape unchanged: base explodes "
    "xL into (table, bucket) ids, queries broadcast, equi-join replaces "
    "all-pairs; one int matmul per Arrow batch",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.lsh_lattice_topk(e, e.filter(F.col("vec_id") < 10), dim=64, k=5)


_SQ8_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND LEN(embedding) = 64
),
ex AS (
  SELECT vec_id, j.jj AS j, CAST(embedding[j.jj] AS DOUBLE) AS v
  FROM e, range(1, 65) j(jj)
),
dims AS (SELECT j, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY j),
ds AS (
  SELECT LIST(mn ORDER BY j) AS mns,
         LIST(CASE WHEN mx = mn THEN 1.0 ELSE (mx - mn) / 255.0 END
              ORDER BY j) AS dels,
         LIST(CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END
              ORDER BY j) AS dmask
  FROM dims
),
rec AS (
  SELECT vec_id,
         LIST_TRANSFORM(RANGE(1, 65),
           j -> mns[j]
                + LEAST(GREATEST(floor(
                      (CAST(embedding[j] AS DOUBLE) - mns[j]) / dels[j]
                      + 0.5), 0.0), 255.0) * dmask[j]) AS r
  FROM e, ds
),
n AS (
  SELECT vec_id, r, {_DOT.format(a='r', b='r')} AS n2 FROM rec
),
scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         {_DOT.format(a='q.r', b='b.r')} / (SQRT(q.n2) * SQRT(b.n2))
           AS cosine
  FROM n q JOIN n b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < 10 AND q.n2 > 0 AND b.n2 > 0
)
SELECT query_id, vec_id, cosine, rk FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "similarity_ann_sq8",
    oracle=_SQ8_ORACLE,
    doc="per-DIMENSION scalar-quantized top-5 (operators/similarity.py:"
    "sq8_topk — FAISS ScalarQuantizer QT_8bit, symmetric): train = one "
    "d-row min/max collect (control-plane bounded); encode->decode is "
    "an exact IEEE op sequence (floor(x/delta+0.5) pin, constant dims "
    "masked so no division ever sees zero); scoring = order-pinned "
    "fold cosine over the RECONSTRUCTED vectors — so a lossy "
    "quantizer's full ranking still hashes against a DuckDB first-"
    "principles re-derivation. Complements int8 (per-vector symmetric "
    "scale) where feature-wise ranges differ. No corpus shuffle: "
    "broadcast probe set, 1 byte/dim scan at scale",
)
def similarity_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.sq8_topk(e, e.filter(F.col("vec_id") < 10), dim=64, k=5)


_MRL_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding, embedding[1:16] AS emb16 FROM embeddings
  WHERE embedding IS NOT NULL AND LEN(embedding) = 64
),
nf AS (
  SELECT vec_id, embedding, emb16,
         {_DOT.format(a='embedding', b='embedding')} AS n2f,
         {_DOT.format(a='emb16', b='emb16')} AS n2t
  FROM e
),
fullk AS (
  SELECT query_id, vec_id, rk FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a='q.embedding', b='b.embedding')}
                      / (SQRT(q.n2f) * SQRT(b.n2f)) DESC, b.vec_id) AS rk
    FROM nf q JOIN nf b ON b.vec_id <> q.vec_id
    WHERE q.vec_id < 10 AND q.n2f > 0 AND b.n2f > 0
  ) WHERE rk <= 5
),
trunck AS (
  SELECT query_id, vec_id, rk FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a='q.emb16', b='b.emb16')}
                      / (SQRT(q.n2t) * SQRT(b.n2t)) DESC, b.vec_id) AS rk
    FROM nf q JOIN nf b ON b.vec_id <> q.vec_id
    WHERE q.vec_id < 10 AND q.n2t > 0 AND b.n2t > 0
  ) WHERE rk <= 5
)
SELECT f.query_id,
       CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap_top5,
       CAST(MAX(CASE WHEN f.rk = 1 THEN f.vec_id END) AS BIGINT)
         AS top1_full,
       CAST(MAX(t1.vec_id) AS BIGINT) AS top1_trunc
FROM fullk f
LEFT JOIN trunck t ON t.query_id = f.query_id AND t.vec_id = f.vec_id
LEFT JOIN (SELECT query_id, vec_id FROM trunck WHERE rk = 1) t1
       ON t1.query_id = f.query_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


@query(
    "matryoshka_truncation_audit",
    oracle=_MRL_ORACLE,
    doc="Matryoshka (MRL) truncation audit — the report run before "
    "switching retrieval to truncated embeddings (Kusupati 2022: serve "
    "the first k dims at a fraction of the memory/bandwidth): per "
    "query, the exact top-5 under FULL 64 dims vs under the FIRST 16 "
    "dims, as overlap count + both top-1 ids. All-exact plumbing "
    "(order-pinned fold cosines on both engines; F.slice / list-slice "
    "truncation; row_number vec_id tie-break) so the audit itself is "
    "hash-checked — the measured overlap IS the recall evidence, not a "
    "tolerance assertion. PLAN: one broadcast probe set scores both "
    "granularities in one pass over the corpus (the truncated vector "
    "rides the same row); no corpus shuffle",
)
def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # an MRL audit is only meaningful on full-width vectors: mirror the
    # oracle's LEN(embedding) = 64 guard so short/NULL vectors are
    # excluded on BOTH engines (whole-row-faithful rule — on a non-64-dim
    # corpus the oracle's 64-term dot would NULL-propagate to zero rows
    # while an unguarded Spark side still scores, r11 fuzz)
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    full = sim.brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    t = e.withColumn("embedding", F.slice("embedding", 1, 16))
    trunc = sim.brute_force_topk(t, t.filter(F.col("vec_id") < 10), k=5)
    # ONE consumer of the trunc ranking: the old (tsel left-join + t1
    # left-join) shape derived TWO frames from `trunc`, so the whole
    # truncated brute-force scan+score+window lineage evaluated TWICE per
    # action (the r5 self-join rule; r12 plan audit: three BNLJ scorings
    # for two granularities). Collapsing trunc to one 10-row per-query
    # frame (top-5 id list + top-1) keeps a single evaluation, and the
    # broadcast left join replaces two SortMergeJoin exchanges.
    # Equivalences vs the join shape (whole-row-faithful, incl. corpora
    # with DUPLICATE vec_ids where the old equi-join fans full rows out):
    # per full row the match count is the NUMBER of equal ids in the
    # trunc top-5 list (size of the filtered array), 0 when the query has
    # no truncated candidates (NULL list — the old unmatched-left-join
    # coalesce(__m, 0)); max(when(rk=1, vec_id)) inside the agg is the
    # old t1 frame's value (rk=1 exists whenever the query has any
    # truncated candidates, and the join stays LEFT for queries whose
    # truncated vector is zero-norm).
    tagg = trunc.groupBy("query_id").agg(
        F.collect_list("vec_id").alias("__tids"),
        F.max(F.when(F.col("rk") == 1, F.col("vec_id"))).alias("__t1"),
    )
    vid = F.col("vec_id")
    n_match = F.when(
        F.col("__tids").isNotNull(),
        F.size(F.filter("__tids", lambda t: t == vid)),
    ).otherwise(0)
    return (
        full.join(F.broadcast(tagg), "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.sum(n_match).cast("long").alias("n_overlap_top5"),
            F.max(F.when(F.col("rk") == 1, F.col("vec_id")))
            .cast("long")
            .alias("top1_full"),
            F.max("__t1").cast("long").alias("top1_trunc"),
        )
        .orderBy("query_id")
    )


_IVF_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         {_DOT.format(a='q.embedding', b='b.embedding')}
         / (SQRT({_DOT.format(a='q.embedding', b='q.embedding')})
            * SQRT({_DOT.format(a='b.embedding', b='b.embedding')})) AS cosine
  FROM embeddings q
  JOIN embeddings b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < 10
    AND {_DOT.format(a='q.embedding', b='q.embedding')} > 0
    AND {_DOT.format(a='b.embedding', b='b.embedding')} > 0
)
SELECT query_id, vec_id, rk FROM (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "similarity_ann_ivf",
    oracle=_IVF_ORACLE,
    doc="IVF (inverted-file) top-5: spherical-kmeans coarse quantizer on a "
    "bounded sample, narrow-map list assignment, multi-probe inverted-list "
    "search. Probing ALL lists (n_probe = n_centroids) makes IVF provably "
    "exact, so the whole pipeline — training, assignment, probe ordering, "
    "candidate join, ranking — is hash-checked against brute force "
    "(r2 VERDICT #8); the production recall/cost dial (n_probe < "
    "n_centroids) is measured in tests/test_ann_recall.py. Ranks only: "
    "numpy batch dots differ from the oracle's order-pinned fold in the "
    "last ulp, which cannot flip ranks (adjacent-cosine gaps ≫ 1e-12) but "
    "would flip a value hash",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(
        e, e.filter(F.col("vec_id") < 10), dim=64, k=5, n_centroids=32, n_probe=32
    ).select("query_id", "vec_id", "rk")


_NEARDUP_ORACLE = f"""
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_DOT.format(a='a.embedding', b='b.embedding')}
         / (SQRT({_DOT.format(a='a.embedding', b='a.embedding')})
            * SQRT({_DOT.format(a='b.embedding', b='b.embedding')})) AS cosine
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_DOT.format(a='a.embedding', b='a.embedding')} > 0
    AND {_DOT.format(a='b.embedding', b='b.embedding')} > 0
)
SELECT id_a, id_b,
       CAST(floor(cosine * 1e6 + 0.5) AS BIGINT) AS cos_e6
FROM p WHERE cosine >= 0.4 ORDER BY id_a, id_b
"""


@query(
    "embedding_neardup_blocked",
    oracle=_NEARDUP_ORACLE,
    doc="embedding-cosine near-dup pairs blocked by label (threshold tuned "
    "to the synthetic data's cosine range so the check exercises real "
    "pairs). Hash-checked (r2 VERDICT #8): blocking by an exact key makes "
    "the pair set deterministic, so the oracle recomputes it with a "
    "blocked self-join; cosines are pinned to scaled integers "
    "(floor(x*1e6+0.5)) because the block scorer's numpy matmul and the "
    "oracle's order-pinned fold differ in the last ulp — far below the "
    "1e-6 pin, and no data cosine sits within 1e-12 of the 0.4 threshold",
)
def embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    pairs = sim.embedding_near_dup_pairs(e, block_col="label", threshold=0.4)
    return pairs.select(
        "id_a",
        "id_b",
        F.floor(F.col("cosine") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("cos_e6"),
    ).orderBy("id_a", "id_b")


_HIST_ORACLE = """
WITH h AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS sha_hex,
         regexp_replace(to_hex(encode(text)), '.(.)', '\\1', 'g') AS lows
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, sha_hex,
       concat_ws(',', {terms}) AS hist
FROM h
""".format(
    terms=", ".join(
        f"CAST(len(lows) - len(replace(lows, '{d}', '')) AS VARCHAR)"
        for d in "0123456789ABCDEF"
    )
)


@query(
    "multimodal_features",
    oracle=_HIST_ORACLE,
    doc="multimodal decode/feature-extract plumbing: binary payloads → "
    "Arrow-batched mapInPandas → 16-d features (decode stubbed, see "
    "functions/multimodal.py). Fully hash-checked (r2 VERDICT #8): the "
    "fake decode is a mod-16 byte histogram, which the oracle recomputes "
    "from the SAME payload bytes via hex low-nibble counting — byte b's "
    "low hex nibble IS b % 16 — so payload plumbing, sha, and the decoded "
    "features all sit under the DuckDB gate (integer counts recovered from "
    "the float32 features are exact for any document < 2^23 bytes)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions import multimodal as mm

    # NULL text excluded on both sides (payload of NULL is undefined;
    # the NULLs also flip the oracle's pandas dtype to float — r7 fuzz)
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    feats = mm.extract_features(mm.with_payload(d))
    # features are float32 c/n; c = round(f * n) recovers the exact integer
    # count (abs error ≤ n·2⁻²⁴ < 0.5), serialized driver-safe as a string
    return feats.select(
        "doc_id",
        "n_bytes",
        "sha_hex",
        F.array_join(
            F.transform(
                "features",
                lambda f: F.round(f * F.col("n_bytes")).cast("long").cast("string"),
            ),
            ",",
        ).alias("hist"),
    )


# multimodal_png_strict oracle (r3 VERDICT #5 — was rows-only): the pixel
# stream is DETERMINISTIC from `text` (utf-8 bytes repeated to 12x8x3),
# so DuckDB can rebuild it as a hex string and recompute both legs in
# integer math: the 16-bin BT.601 luminance histogram of the decoded
# pixels, and the 4x4 nearest-neighbor-resized pixel bytes (resized pixel
# (ty,tx) = source pixel (ty*8//4, tx*12//4)). The Spark side runs the
# REAL codec loop — encode_png -> strict_decode -> featurize and
# encode -> resize(re-encode) -> decode — so a hash match proves the
# whole PNG round trip bit-for-bit. Only the zlib byte stream itself
# stays un-oracled (compression isn't SQL-expressible), but its content
# is: every pixel that came out of it is checked.
_PNG_W, _PNG_H = 12, 8
_PNG_NEED_HEX = _PNG_W * _PNG_H * 3 * 2  # 576 hex chars = 288 bytes


_PNG_RESIZED_TERMS = ", ".join(
    f"substr(ph, {6 * ((ty * 2) * _PNG_W + tx * 3) + 1}, 6)"
    for ty in range(4)
    for tx in range(4)
)

_PNG_STRICT_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         upper(to_hex(encode(CASE WHEN text IS NULL OR text = ''
                                  THEN 'x' ELSE text END))) AS hx
  FROM documents WHERE doc_id < 200
),
rep AS (
  SELECT doc_id,
         substr(repeat(hx, CAST({_PNG_NEED_HEX} // length(hx) AS INT) + 1),
                1, {_PNG_NEED_HEX}) AS ph
  FROM base
),
bins AS (
  SELECT rep.doc_id, g.i AS i,
         ((77 * ((strpos('0123456789ABCDEF', substr(ph, 6*g.i+1, 1))-1)*16
                 + strpos('0123456789ABCDEF', substr(ph, 6*g.i+2, 1))-1)
           + 150 * ((strpos('0123456789ABCDEF', substr(ph, 6*g.i+3, 1))-1)*16
                 + strpos('0123456789ABCDEF', substr(ph, 6*g.i+4, 1))-1)
           + 29 * ((strpos('0123456789ABCDEF', substr(ph, 6*g.i+5, 1))-1)*16
                 + strpos('0123456789ABCDEF', substr(ph, 6*g.i+6, 1))-1)) >> 12
         ) AS bin
  FROM rep CROSS JOIN (SELECT unnest(generate_series(0, {_PNG_W * _PNG_H - 1})) AS i) g
),
hist AS (
  SELECT doc_id,
         concat_ws(',', {", ".join(
             f"CAST(CAST(SUM(CASE WHEN bin = {b} THEN 1 ELSE 0 END) AS BIGINT) AS VARCHAR)"
             for b in range(16)
         )}) AS hist
  FROM bins GROUP BY doc_id
)
SELECT rep.doc_id, hist.hist,
       concat({_PNG_RESIZED_TERMS}) AS resized_hex
FROM rep JOIN hist ON rep.doc_id = hist.doc_id
ORDER BY rep.doc_id
"""


@query(
    "multimodal_png_strict",
    oracle=_PNG_STRICT_ORACLE,
    doc="REAL image path, no fakes, fully hash-checked (r3 VERDICT #5): "
    "build PNG payloads from document bytes (pure-Python codec, "
    "functions/png_codec.py), strict-decode to 16-bin BT.601 luminance "
    "histogram features, strict-resize to 4x4 (decode→nearest→re-encode) "
    "and decode the resized PNG back to raw pixels — all executor-side "
    "Arrow batches. The oracle rebuilds the deterministic pixel stream "
    "from `text` in SQL and recomputes histogram + resized pixels in "
    "integer math, so the PNG encode/decode round trip is verified "
    "pixel-for-pixel",
)
def multimodal_png_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from duck_delta_share_spark.functions import multimodal as mm
    from duck_delta_share_spark.functions import png_codec as pc

    width, height = _PNG_W, _PNG_H
    need = width * height * 3
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                raw = (t or "x").encode("utf-8") or b"x"
                payloads.append(
                    pc.encode_png(width, height, 3, (raw * (need // len(raw) + 1))[:need])
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payload_df = d.mapInPandas(build, "doc_id long, payload binary")
    feats = mm.extract_features(payload_df, decoder=mm.strict_decode)
    n_px = width * height
    hist = feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                "features",
                lambda f: F.round(f * F.lit(n_px)).cast("long").cast("string"),
            ),
            ",",
        ).alias("hist"),
    )

    def decode_resized(it):
        for pdf in it:
            hexes = []
            for p in pdf["payload"]:
                _, _, _, pixels = pc.decode_png(bytes(p))
                hexes.append(pixels.hex().upper())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "resized_hex": hexes})

    resized = mm.resize_images(payload_df, 4, 4, resizer=mm.strict_resize).mapInPandas(
        decode_resized, "doc_id long, resized_hex string"
    )
    return hist.join(resized, "doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal columns (binary payload plumbing)
# ---------------------------------------------------------------------------


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       SHA256(text) AS sha_hex,
       TO_BASE64(ENCODE(SUBSTRING(text, 1, 30))) AS b64_prefix
FROM documents
""",
    doc="binary-column plumbing: utf8 payload bytes + digest + base64 "
    "(decode/feature-extract stubs live in functions/multimodal.py)",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha_hex"),
        # prefix only: Spark's base64 MIME-chunks outputs > 76 chars
        F.base64(F.substring(F.col("text"), 1, 30).cast("binary")).alias("b64_prefix"),
    )


@query(
    "pipeline_training_prep",
    oracle=f"""
WITH survivors AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           ROW_NUMBER() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
    FROM documents
  ) t WHERE rn = 1
), scored AS (
  SELECT doc_id, text, lang,
         ROUND(
           (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
            / CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)) * 0.7
           + LEAST(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.3,
         6) AS quality
  FROM survivors
), kept AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks, quality
  FROM scored WHERE quality >= 0.6 AND lang = 'en'
)
SELECT doc_id,
       CAST(u.pos - 1 AS INT) AS chunk_idx,
       ARRAY_TO_STRING(toks[(u.pos - 1) * 24 + 1 : (u.pos - 1) * 24 + 32], ' ')
         AS chunk_text,
       CAST(LEAST(32, LEN(toks) - (u.pos - 1) * 24) AS INT) AS n_tokens,
       quality
FROM kept,
     UNNEST(GENERATE_SERIES(1, GREATEST((LEN(toks) - 32 + 24 - 1) // 24, 0) + 1))
       AS u(pos)
""",
    doc="the end-to-end training-data prep pipeline as ONE query: exact "
    "dedup (keep lowest doc_id) -> quality gate (>= 0.6) -> language "
    "filter (en) -> overlapping 32-token context chunks (UDTF). Every "
    "stage is the §2C operator used elsewhere; composition stays a single "
    "Catalyst plan (dedup shuffle + narrow filters + UDTF expand)",
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.udf_surface import _CHUNK_SCHEMA, _TokenChunks

    d = load_table(spark, sf_dir, "documents")
    kept = (
        dd.exact_dedup(d, "text", "doc_id")
        .withColumn("quality", quality_score("text"))
        .filter((F.col("quality") >= 0.6) & (F.col("lang") == "en"))
    )
    from pyspark.sql.functions import udtf

    spark.udtf.register("token_chunks_prep", udtf(_TokenChunks, returnType=_CHUNK_SCHEMA))
    kept.createOrReplaceTempView("__prep_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens, d.quality "
        "FROM __prep_docs d, LATERAL token_chunks_prep(d.text) c"
    )


@query(
    "sequence_packing",
    oracle="""
WITH t AS (
  SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((e - n_tokens) / 256) AS INT) AS bin_id,
       CAST(e - n_tokens AS BIGINT) AS bin_offset
FROM c
""",
    doc="LLM sequence packing, global order: two-pass distributed prefix "
    "sum (per-range totals -> broadcast offsets -> within-range windows) "
    "in operators/sessionize.py:pack_sequences — bit-identical to a "
    "global running sum with NO single-task window",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.sessionize import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, capacity_tokens=256)


@query(
    "sequence_packing_partitioned",
    oracle="""
WITH t AS (
  SELECT lang, doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens
  FROM documents
), c AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
  FROM t
)
SELECT lang, doc_id, n_tokens,
       CAST(FLOOR((e - n_tokens) / 256) AS INT) AS bin_id,
       CAST(e - n_tokens AS BIGINT) AS bin_offset
FROM c
""",
    doc="LLM sequence packing within corpus partitions (lang): the 100 TB "
    "default — window partitions by the corpus key, one hash shuffle, "
    "per-key sorts only (operators/sessionize.py:pack_sequences "
    "partition_cols mode)",
)
def sequence_packing_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.sessionize import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, capacity_tokens=256, partition_cols=["lang"])


@query(
    "stratified_sample",
    oracle="""
WITH f(lang, frac_e6) AS (
  VALUES ('en', CAST(300000 AS BIGINT)), ('de', CAST(1000000 AS BIGINT)),
         ('fr', CAST(1000000 AS BIGINT)), ('es', CAST(1000000 AS BIGINT)),
         ('zh', CAST(1000000 AS BIGINT))
),
c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_in FROM documents GROUP BY lang)
SELECT c.lang, c.n_in, f.frac_e6, TRUE AS within_binomial_bound
FROM c JOIN f ON c.lang = f.lang
ORDER BY c.lang
""",
    doc="stratified corpus rebalancing AUDIT: seeded per-language "
    "Bernoulli sampling (downsample dominant en, keep the rest) via "
    "df.sampleBy — deterministic for a fixed seed, narrow map, no "
    "shuffle — folded to the exact-twin oracle pattern (r9 sketch "
    "precedent): per stratum the output carries the EXACT input count "
    "(oracle-computable), the literal target fraction, and a boolean "
    "asserting the realized sample count sits within 6 standard "
    "deviations of the binomial mean (+1 for the fraction-1.0 strata, "
    "where the draw is exact) — the oracle asserts it as literal TRUE. "
    "The raw draw itself stays out of the hashed output BY NECESSITY "
    "(Spark's XORShiftRandom stream is not reproducible elsewhere); "
    "per_group_deterministic_sample remains the hash-checked "
    "deterministic row-level twin. 6-sigma makes the boolean stable "
    "under fixture regeneration (~1e-9 flake per stratum)",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample_core(load_table(spark, sf_dir, "documents"))


def stratified_sample_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    fractions = {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    s = d.sampleBy("lang", fractions, seed=42)
    n_out = s.groupBy("lang").agg(F.count(F.lit(1)).alias("n_out"))
    n_in = (
        d.where(F.col("lang").isin(list(fractions)))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_in"))
    )
    # frac_e6 as INTEGER literals — casting p*1e6 to long would truncate
    # 0.3*1e6 = 299999.999... to 299999 (the decimal-discipline trap)
    frac_e6 = F.create_map(
        *[
            F.lit(x)
            for k, v in fractions.items()
            for x in (k, int(round(v * 1e6)))
        ]
    )[F.col("lang")]
    j = n_in.join(n_out, "lang", "left").select(
        "lang",
        "n_in",
        F.coalesce(F.col("n_out"), F.lit(0)).alias("n_out_raw"),
        frac_e6.cast("long").alias("frac_e6"),
    )
    p = F.col("frac_e6").cast("double") / F.lit(1e6)
    mean = F.col("n_in") * p
    sigma = F.sqrt(F.col("n_in") * p * (F.lit(1.0) - p))
    return j.select(
        "lang",
        "n_in",
        "frac_e6",
        (F.abs(F.col("n_out_raw") - mean) <= sigma * 6 + 1).alias(
            "within_binomial_bound"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# PII redaction + repetition quality signals (training-data hygiene)
# ---------------------------------------------------------------------------

# PII is INJECTED deterministically from doc_id (the fixtures are clean),
# with the identical construction on both engines, so the redaction parity
# check exercises real matches on every row.
_PII_INJECT_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or "
    "10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
    "CAST((doc_id * 7) % 256 AS VARCHAR) || ' ssn 123-45-6789 tel +1 555 867-5309'"
)


def _pii_inject_spark():
    return F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" ssn 123-45-6789 tel +1 555 867-5309"),
    )


def _pii_oracle() -> str:
    from duck_delta_share_spark.functions.text import PII_PATTERNS

    (em, _), (ip, _), (ssn, _), (ph, _) = PII_PATTERNS
    return f"""
WITH src AS (SELECT doc_id, {_PII_INJECT_SQL} AS t0 FROM documents),
s1 AS (SELECT *, regexp_replace(t0, '{em}', '<EMAIL>', 'g') AS t1 FROM src),
s2 AS (SELECT *, regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2 FROM s1),
s3 AS (SELECT *, regexp_replace(t2, '{ssn}', '<SSN>', 'g') AS t3 FROM s2),
s4 AS (SELECT *, regexp_replace(t3, '{ph}', '<PHONE>', 'g') AS t4 FROM s3)
SELECT doc_id,
       CAST(len(regexp_extract_all(t0, '{em}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t1, '{ip}')) AS INT) AS n_ip,
       CAST(len(regexp_extract_all(t2, '{ssn}')) AS INT) AS n_ssn,
       CAST(len(regexp_extract_all(t3, '{ph}')) AS INT) AS n_phone,
       right(t4, 80) AS redacted_tail
FROM s4
"""


@query(
    "pii_redaction",
    oracle=_pii_oracle(),
    doc="PII redaction for training data: emails/IPv4/SSN-shaped/phone-shaped "
    "spans replaced by typed tokens via chained codegen regexp_replace "
    "(functions/text.py PII_PATTERNS — Java∩RE2 regex subset so the DuckDB "
    "oracle runs the byte-identical patterns); counts taken after earlier "
    "categories redact, so counts and redaction can never disagree",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import pii_counts, pii_redact

    d = load_table(spark, sf_dir, "documents")
    injected = d.select("doc_id", _pii_inject_spark().alias("t0"))
    return injected.select(
        "doc_id",
        *pii_counts(F.col("t0")),
        F.right(pii_redact(F.col("t0")), F.lit(80)).alias("redacted_tail"),
    )


@query(
    "repetition_signals",
    oracle="""
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
), b AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
  FROM t WHERE len(toks) >= 2
), e AS (
  SELECT doc_id, unnest(bgs) AS bg FROM b
), c AS (
  SELECT doc_id, bg, COUNT(*) AS cnt FROM e GROUP BY doc_id, bg
), m AS (
  SELECT doc_id, MAX(cnt) AS mx FROM c GROUP BY doc_id
)
SELECT b.doc_id,
       ROUND(CAST(m.mx AS DOUBLE) / (len(b.toks) - 1), 6) AS top_bigram_frac,
       ROUND(1.0 - CAST(len(list_distinct(b.toks)) AS DOUBLE)
                   / CAST(len(b.toks) AS DOUBLE), 6) AS dup_token_frac
FROM b JOIN m ON b.doc_id = m.doc_id
""",
    doc="Gopher-style repetition quality signals: top-bigram fraction "
    "(most frequent adjacent bigram / total bigrams) and duplicate-token "
    "fraction — explode + two-level agg, the scalable shape for n-gram "
    "repetition filters (no per-doc Python)",
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import bigrams, dup_token_fraction

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokenize("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    # the per-doc size stats RIDE on the exploded bigram rows (first()
    # in the final agg) — the old base-join-counts shape derived both
    # sides from the same un-persisted toks frame and tokenized the
    # corpus twice per action (CLAUDE.md self-derived-join rule)
    exploded = toks.select(
        "doc_id",
        (F.size("toks") - 1).alias("n_bigrams"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct("toks")).cast("double")
            / F.size("toks").cast("double"),
            6,
        ).alias("dup_token_frac"),
        F.explode(bigrams(F.col("toks"))).alias("bg"),
    )
    per_doc = (
        exploded.groupBy("doc_id", "bg")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.first("n_bigrams").alias("n_bigrams"),
            F.first("dup_token_frac").alias("dup_token_frac"),
        )
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("mx"),
            F.first("n_bigrams").alias("n_bigrams"),
            F.first("dup_token_frac").alias("dup_token_frac"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.round(F.col("mx").cast("double") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
        "dup_token_frac",
    )


@query(
    "heavy_hitter_terms",
    oracle="""
WITH tok AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(COUNT(*) / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS frac
FROM tok
GROUP BY term
HAVING COUNT(*) >= (1.0 / 128) * (SELECT n FROM tot)
ORDER BY cnt DESC, term
""",
    doc="EXACT corpus heavy hitters via two-pass distributed Misra-Gries "
    "(operators/sketches.py): O(1/theta) memory per executor candidate pass "
    "(provably contains every theta-heavy term), then exact recount of the "
    "tiny candidate set — the 100 TB answer to frequent terms without a "
    "full-vocabulary groupBy; oracle is the plain groupBy+HAVING",
)
def heavy_hitter_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.sketches import heavy_hitter_terms

    d = load_table(spark, sf_dir, "documents")
    return heavy_hitter_terms(d, text_col="text", threshold=1 / 128)


@query(
    "embedding_quantize_int8",
    oracle="""
SELECT vec_id,
       list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale,
       array_to_string(
       CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
            THEN list_transform(embedding, x -> 0)
            ELSE list_transform(
                embedding,
                x -> CAST(floor(
                    CAST(x AS DOUBLE)
                    / (list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0)
                    + 0.5) AS INTEGER))
       END, ',') AS q
FROM embeddings
ORDER BY vec_id
""",
    doc="Symmetric per-vector int8 quantization (operators/embeddings.py): "
    "scale = max|x|/127, floor(x/scale+0.5) half-up rounding pinned to "
    "identical IEEE semantics in both engines — pure codegen transform, "
    "zero shuffle; the compression step before ANN shipping at 100 TB. "
    "The int8 vector is emitted comma-joined (VERDICT r2: driver _canon "
    "cannot sort array-typed output columns)",
)
def embedding_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.embeddings import int8_scale, quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    scale = int8_scale("embedding")
    q = quantize_int8("embedding", scale)
    return (
        e.select(
            "vec_id",
            scale.alias("scale"),
            F.array_join(F.transform(q, _int_str), ",").alias("q"),
        )
        .orderBy("vec_id")
    )


@query(
    "embedding_variance_by_dim",
    oracle="""
SELECT dim,
       CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9 AS sum_x,
       CAST(SUM(CAST(floor(x * x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS sum_x2,
       COUNT(*) AS n
FROM (SELECT unnest(embedding) :: DOUBLE AS x,
             generate_subscripts(embedding, 1) - 1 AS dim
      FROM embeddings)
GROUP BY dim
ORDER BY dim
""",
    doc="Per-dimension first/second moments of the embedding matrix — the "
    "distributed input to covariance/PCA (operators/embeddings.py:moments). "
    "Addends are pinned to scaled integers (floor(x*1e9+0.5) as long): the "
    "same IEEE double ops on both engines, then exact associative integer "
    "sums — immune to the double->decimal rounding-mode ties that plain "
    "DECIMAL casts hit at scale 12. posexplode + map-side partial sums",
)
def embedding_variance_by_dim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    return (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            (F.sum(F.floor(x * F.lit(1e9) + F.lit(0.5))).cast("double") / F.lit(1e9)).alias("sum_x"),
            (F.sum(F.floor(x * x * F.lit(1e12) + F.lit(0.5))).cast("double") / F.lit(1e12)).alias("sum_x2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("dim")
    )


@query(
    "pca_project_embeddings",
    oracle="""
WITH d AS (
  SELECT MAX(len(embedding)) AS d FROM embeddings WHERE embedding IS NOT NULL
), e AS (
  -- whole-row-faithful domain (r9 review): rows shorter than the max
  -- width or carrying NULL elements are EXCLUDED on both engines — the
  -- Spark side's zip_with would NULL-pad a short vector and its fold
  -- would propagate a NULL element, silently diverging from SQL SUM
  SELECT vec_id, embedding FROM embeddings CROSS JOIN d
  WHERE embedding IS NOT NULL
    AND len(embedding) = d.d
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) :: DOUBLE AS x
  FROM e
), m AS (
  SELECT dim,
         CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e9 / COUNT(*) AS mu
  FROM x GROUP BY dim
)
SELECT x.vec_id,
       CAST((SELECT MAX(len(embedding)) FROM e) AS BIGINT) AS dims,
       CAST(SUM(CAST(floor((x.x - m.mu) * (x.x - m.mu) * 1e9 + 0.5)
                     AS BIGINT)) AS BIGINT) AS norm2_c_e9,
       TRUE AS energy_ok,
       TRUE AS transform_ok
FROM x JOIN m USING (dim)
GROUP BY x.vec_id
""",
    doc="Distributed PCA (operators/embeddings.py): zero-shuffle moment "
    "partials (d+d^2 doubles per partition) -> bounded combine tree -> "
    "driver eigh on the 64x64 covariance only -> broadcast matmul "
    "projection. Sign-pinned eigenvectors for determinism. ORACLE SHAPE "
    "(r9, retiring the rows-only status): DuckDB cannot eigendecompose, "
    "so raw projection values are not SQL-reproducible — instead the "
    "query projects onto the FULL basis (k = d) and emits, per vector, "
    "the pinned centered squared norm (SQL-reproducible: per-dim "
    "floor((x-mu)^2*1e9+0.5) integer terms over the e9-pinned mean, the "
    "embedding_variance_by_dim discipline) plus `energy_ok` — the "
    "distributed projection conserves per-vector energy, catching row "
    "misalignment / wrong-broadcast bugs — and `transform_ok`, the AND "
    "of four global invariants computed from a second bounded moments "
    "pass over the PROJECTIONS: components orthonormal, projection dims "
    "pairwise decorrelated, per-dim variances descending, projection "
    "mean zero. An orthonormal rotation that decorrelates all dims with "
    "descending variances IS the (sign-pinned) PCA — jointly these pin "
    "the transform up to degenerate-eigenvalue ties, the strongest "
    "SQL-checkable characterization. The oracle recomputes the norms "
    "and asserts the invariant booleans as literal TRUE (precedent: the "
    "within-tolerance pattern of agg_approx_distinct). The k=8 headline "
    "projection is the prefix of the full one (eigenvalues descending "
    "by construction); raw values stay numpy-parity-tested in "
    "tests/test_embeddings.py.",
)
def pca_project_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from duck_delta_share_spark.operators.embeddings import (
        moments,
        pca_project,
        principal_components,
    )

    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    d_raw = e.agg(F.max(F.size("embedding")).alias("d")).first()["d"]
    if d_raw is None:
        # fail with table context instead of int(None)'s bare TypeError
        raise ValueError(
            "pca_project_embeddings: embeddings table has no non-NULL "
            "embedding rows"
        )
    d = int(d_raw)
    # whole-row-faithful domain (mirrors the oracle): drop ragged rows
    # (zip_with would NULL-pad them) and rows with NULL elements (the
    # fold would propagate NULL where SQL SUM skips it)
    e = e.where(
        (F.size("embedding") == d)
        & ~F.exists("embedding", lambda x: x.isNull())
    )
    comps, _, mean = principal_components(e, "embedding", k=d)
    proj = pca_project(e, "embedding", k=d, components=comps, mean=mean)

    # global invariants: one bounded moments pass over the projections
    # (d + d^2 doubles per partition — control plane, like kmeans)
    _, mean_y, cov_y = moments(proj, "pca")
    diag = np.diag(cov_y)
    lam = float(max(diag.max(), 1e-12))
    off = cov_y - np.diag(diag)
    transform_ok = bool(
        np.abs(comps.T @ comps - np.eye(comps.shape[1])).max() < 1e-9
        and np.abs(off).max() < 1e-9 * lam
        and np.all(diag[:-1] >= diag[1:] - 1e-9 * lam)
        and np.abs(mean_y).max() < 1e-9 * max(1.0, lam)
    )

    # pinned per-dim means (d control-plane values; bit-identical to the
    # oracle's: exact integer sum of floor(x*1e9+0.5), then the same
    # double division sequence /1e9 /n on both engines)
    rows = (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * F.lit(1e9) + F.lit(0.5))
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    mu = {r["dim"]: (float(r["s"]) / 1e9) / r["n"] for r in rows}
    mu_arr = F.array(*[F.lit(mu[i]) for i in range(d)])

    terms = F.zip_with(
        F.col("embedding"),
        mu_arr,
        lambda x, m: F.floor(
            (x.cast("double") - m) * (x.cast("double") - m) * F.lit(1e9)
            + F.lit(0.5)
        ),
    )
    norm2_e9 = F.aggregate(terms, F.lit(0).cast("long"), lambda a, t: a + t)
    pca_norm2 = F.aggregate(
        F.col("pca"), F.lit(0.0), lambda a, y: a + y * y
    )
    # tolerance: e9 per-term pinning contributes <=5e-10 * d absolute;
    # the rotation itself conserves energy to ~1e-13 relative — 1e-6
    # relative + 1e-6 absolute is orders above float noise yet a
    # misaligned/wrong projection misses by O(norm)
    norm2_c = norm2_e9.cast("double") / F.lit(1e9)
    energy_ok = (
        F.abs(pca_norm2 - norm2_c)
        <= F.lit(1e-6) * F.greatest(norm2_c, F.lit(1.0)) + F.lit(1e-6)
    )
    return proj.select(
        "vec_id",
        F.lit(d).cast("long").alias("dims"),
        norm2_e9.cast("long").alias("norm2_c_e9"),
        energy_ok.alias("energy_ok"),
        F.lit(transform_ok).alias("transform_ok"),
    )


@query(
    "neardup_canonical_keep",
    oracle=f"""
WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
),
labeled AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
         ROUND(
           (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(d.text, ' '))) AS DOUBLE)
            / CAST(LEN(STRING_SPLIT(d.text, ' ')) AS DOUBLE)) * 0.7
           + LEAST(CAST(LEN(STRING_SPLIT(d.text, ' ')) AS DOUBLE) / 50.0, 1.0) * 0.3,
         6) AS quality
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, component,
       (ROW_NUMBER() OVER (PARTITION BY component
                           ORDER BY quality DESC, doc_id) = 1) AS kept
FROM labeled
""",
    doc="END-TO-END near-dup canonicalization: Jaccard pair graph -> "
    "connected components -> keep the highest-quality doc per cluster "
    "(rounded-quality then doc_id tiebreak, pinned identically in SQL). "
    "The full dedup decision a training pipeline applies, hash-checked; "
    "one extra shuffle over components (window by cluster id)",
)
def neardup_canonical_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        d, block_cols=["lang", "source"], threshold=0.15, shingle_n=3
    ).select("id_a", "id_b")
    comp = connected_components(pairs)
    labeled = (
        d.join(comp, d.doc_id == comp.node, "left")
        .select(
            d.doc_id,
            F.coalesce("component", d.doc_id).alias("component"),
            F.round(quality_score("text"), 6).alias("quality"),
        )
    )
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("doc_id"))
    return labeled.select(
        "doc_id",
        "component",
        (F.row_number().over(w) == 1).alias("kept"),
    )


@query(
    "inverted_index_postings",
    oracle="""
WITH td AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term, doc_id FROM documents)
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
FROM td
GROUP BY term
HAVING COUNT(*) >= 3
ORDER BY term
""",
    doc="inverted index (term -> document-frequency + first-20 posting "
    "chunk): postings are bounded BEFORE aggregation (row_number <= 20 "
    "within term), so no unbounded collect_list ever materializes — the "
    "chunked-postings shape a distributed index build needs; df >= 3 "
    "bounds the emitted vocabulary; the posting chunk is emitted "
    "comma-joined (driver-canonicalizable)",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    td = (
        d.select(F.explode(tokenize("text")).alias("term"), "doc_id")
        .distinct()
    )
    df_counts = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    first_k = (
        td.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings_arr"))
    )
    return (
        df_counts.join(first_k, "term")
        .filter(F.col("df") >= 3)
        .select(
            "term",
            "df",
            F.array_join(F.transform("postings_arr", _int_str), ",").alias(
                "postings"
            ),
        )
        .orderBy("term")
    )


@query(
    "per_group_deterministic_sample",
    oracle="""
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
ORDER BY lang, doc_id
""",
    doc="exactly-k-per-group sample via md5 rank — the deterministic "
    "reservoir-sampling twin of sampleBy for when a pipeline needs EXACT "
    "group quotas and run-to-run reproducibility (md5 is engine-identical; "
    "xxhash64 has no DuckDB twin). One window shuffle on the group key",
)
def per_group_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    # two-level top-k: lang cardinality is ~5, so a single per-lang window
    # would funnel the whole corpus through 5 tasks at scale. Level 1
    # keeps the local top-5 per (lang, input partition) — parallel, each
    # target partition bounded; level 2 ranks the <= 5*k*nparts survivors.
    # The global top-5 per lang is always contained in the union of local
    # top-5s, so the output is identical.
    wl = Window.partitionBy("lang", "__pid").orderBy(*order)
    pruned = (
        d.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(wl))
        .filter(F.col("__lrn") <= 5)
    )
    w = Window.partitionBy("lang").orderBy(*order)
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query(
    "unigram_perplexity_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), freq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS cnt FROM tok GROUP BY term
), total AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok
), scored AS (
  SELECT t.doc_id,
         floor(-ln(f.cnt / (SELECT n FROM total)) * 1e9 + 0.5) AS nll_scaled
  FROM tok t JOIN freq f USING (term)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(nll_scaled AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*), 6)
           AS avg_nll
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
    doc="CCNet-style quality signal: per-doc cross-entropy under the "
    "corpus unigram LM (avg -ln p(token), p = corpus frequency). Two "
    "aggregations: corpus term freqs (map-side partials over the token "
    "stream) broadcast-joined back onto doc tokens, then a per-doc mean. "
    "Per-token -ln p is pinned to scaled integers (floor(x*1e9+0.5)) so "
    "the cross-engine sum is exact-associative; identical IEEE ln/div on "
    "both engines. High avg_nll = improbable tokens = gibberish/rare-lang",
)
def unigram_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokenize("text")).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    # corpus token total as a broadcast ONE-ROW frame derived from freq
    # (sum of per-term counts == token count; freq's exchange is reused
    # across both consumers) — the old shape ran an EAGER tok.count() at
    # plan-build time (an extra full corpus pass) and force-broadcast the
    # whole vocabulary table, which is unbounded at web scale (AQE still
    # broadcasts it while it is genuinely small; the shuffle join on term
    # is the scale-safe fallback)
    totals = freq.agg(F.sum("cnt").alias("__total"))
    nll = -F.log(F.col("cnt") / F.col("__total"))
    scored = tok.join(freq.crossJoin(F.broadcast(totals)), "term").select(
        "doc_id", F.floor(nll * F.lit(1e9) + F.lit(0.5)).alias("nll_scaled")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("nll_scaled").cast("double") / F.lit(1e9) / F.count(F.lit(1)), 6
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


_MD5_SIG_SQL = "\n".join(
    "         LIST_MIN(LIST_TRANSFORM(hs, h -> (h * {a} + {b}) % {p})) "
    "AS mh_{i},".format(a=a, b=b, p=dd.CW_MD5_P, i=i)
    for i, (a, b) in enumerate(dd.CW_MD5_PARAMS)
).rstrip(",")


@query(
    "minhash_md5_lsh_pairs",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
                        i -> ARRAY_TO_STRING(toks[i:i+2], ' ')) AS shingles
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
),
hv AS (
  SELECT doc_id,
         LIST_TRANSFORM(shingles,
           s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id,
{_MD5_SIG_SQL}
  FROM hv
),
bands AS (
  SELECT doc_id, 0 AS band,
         md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket
  FROM sig
  UNION ALL SELECT doc_id, 1,
         md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, 2,
         md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, 3,
         md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM sig
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="HASH-CHECKED MinHash-LSH: ONE md5 per shingle -> 28-bit base "
    "value -> Carter-Wegman minima ((a_i*H + b_i) mod 2^31-1, identical "
    "literals in both engines) -> null-propagating band buckets -> capped "
    "bucket self-join (operators/dedup.py:minhash_md5_*). The exact "
    "Carter-Wegman construction of the xxhash64 production engine with a "
    "cross-engine-reproducible base hash; same plan shape, one crypto "
    "hash per shingle instead of k (r3 bench fix)",
)
def minhash_md5_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dd.minhash_md5_signatures(d, num_hashes=8, shingle_n=3)
    return dd.minhash_md5_lsh_pairs(sigs, num_hashes=8, bands=4).orderBy(
        "id_a", "id_b"
    )


@query(
    "bloom_semi_join_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
ORDER BY o_orderkey
""",
    doc="bloom-filter semi-join pre-filtering (operators/bloom.py): the "
    "build side (high-balance customers) aggregates k xxhash64 bit "
    "positions into a fixed bitset (one combiner-friendly bit_or shuffle; "
    "the driver collects the 128 KiB BITSET, never keys), executors drop "
    "non-member orders with a vectorized Arrow probe BEFORE the join "
    "shuffle, and the final semi join removes false positives — so the "
    "result is EXACTLY orders ⋉ customers and sits under a plain SQL "
    "oracle. The explicit form of Spark's runtime bloom filter, usable in "
    "front of Python DataSource scans where Catalyst's runtime filters "
    "cannot reach",
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.bloom import bloom_semi_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return bloom_semi_join(o, c, "o_custkey", "c_custkey").orderBy("o_orderkey")


@query(
    "hll_mergeable_distinct",
    oracle="""
WITH per_type AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY event_type
), total AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_total
  FROM events
)
SELECT event_type, exact_users, n_rows,
       TRUE AS est_within_5pct,
       exact_users_total,
       TRUE AS union_est_within_5pct
FROM per_type CROSS JOIN total
ORDER BY event_type
""",
    doc="MERGEABLE distinct-count sketches (Apache DataSketches HLL via "
    "hll_sketch_agg/hll_union_agg): per-type user sketches union into "
    "the global total WITHOUT rescanning the corpus — the 100 TB rollup "
    "answer where approx_count_distinct forces one pass per grouping "
    "level. Sketch states are bytes: storable, re-unionable across days "
    "(the cube/rollup building block for distinct counts). ORACLE SHAPE "
    "(r9, retiring rows-only status): sketch binaries have no DuckDB "
    "twin, so the query emits the EXACT distinct twins plus booleans "
    "|est - exact| <= max(0.05*exact, 2) at BOTH levels (per-type "
    "estimates AND the sketch-union total), which the oracle asserts as "
    "literal TRUE — the union boolean is the mergeability evidence: it "
    "checks the estimate produced from unioned per-type sketch states "
    "against the exact global distinct. Default lgK=12 puts the rsd at "
    "~1.6%, so 5% is >3 sigma (same bound in tests/test_approx.py). The "
    "exact twins are the audit cost of oracle evidence; production "
    "rollups ship the sketches alone",
)
def hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def _ok(est, exact):
        return F.abs(est.cast("double") - exact.cast("double")) <= F.greatest(
            F.lit(0.05) * exact.cast("double"), F.lit(2.0)
        )

    # ONE events scan: pre-aggregate to (event_type, user_id) pairs —
    # HLL registers are duplicate-insensitive, so sketches over the
    # deduped pairs equal sketches over raw events, exact distincts
    # become plain counts, and every downstream frame (fine, union
    # estimate, global exact) derives from this small persisted frame
    # instead of re-scanning events per broadcast subtree (the CLAUDE.md
    # self-derived-join rule; r9 review)
    pairs = (
        e.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist()
    )
    fine = pairs.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        # count(user_id), not count(*): a NULL-user pair row must not
        # count — COUNT(DISTINCT user_id) skips NULLs on both engines
        F.count("user_id").cast("long").alias("exact_users"),
        F.sum("__n").alias("n_rows"),
    )
    total_est = fine.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__total_est")
    )
    total_exact = pairs.agg(
        F.count_distinct("user_id").cast("long").alias("exact_users_total")
    )
    per_type = fine.select(
        "event_type",
        "exact_users",
        "n_rows",
        _ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "est_within_5pct"
        ),
    )
    result = (
        per_type.crossJoin(F.broadcast(total_est))
        .crossJoin(F.broadcast(total_exact))
        .select(
            "event_type",
            "exact_users",
            "n_rows",
            "est_within_5pct",
            "exact_users_total",
            _ok(F.col("__total_est"), F.col("exact_users_total")).alias(
                "union_est_within_5pct"
            ),
        )
        .orderBy("event_type")
    )
    # deterministic release hook (pack_sequences/bm25 precedent); the
    # cache is |types x distinct users| rows, not the event stream
    result._hll_pairs_cache = pairs
    return result


_WAV_HIST = ",\n         ".join(
    "printf('%.6f', CAST(CAST(h{j} / 800.0 AS REAL) AS DOUBLE))".format(j=j)
    for j in range(13)
)
_WAV_HCOLS = ",\n         ".join(
    "SUM(CASE WHEN LEAST(CAST(trunc(abs(s) / 32768.0 * 13) AS INT), 12) = {j} "
    "THEN 1 ELSE 0 END) AS h{j}".format(j=j)
    for j in range(13)
)
_WAV_ORACLE = f"""
WITH d AS (
  SELECT doc_id, CAST(100 + (doc_id % 40) * 20 AS DOUBLE) AS freq
  FROM documents WHERE doc_id < 200
),
s0 AS (
  SELECT d.doc_id, t.t,
         CAST(trunc(12000 * sin(2 * pi() * d.freq * t.t / 8000)) AS BIGINT) AS s
  FROM d CROSS JOIN (SELECT UNNEST(generate_series(0, 799)) AS t) t
),
s AS (
  SELECT doc_id, t, s,
         lead(s) OVER (PARTITION BY doc_id ORDER BY t) AS nx
  FROM s0
),
feat AS (
  SELECT doc_id,
         sqrt(SUM(s * s) / 800.0) / 32768.0 AS rms,
         SUM(CASE WHEN t < 799 AND ((s >= 0) != (nx >= 0)) THEN 1 ELSE 0 END)
           / 799.0 AS zc,
         {_WAV_HCOLS}
  FROM s GROUP BY doc_id
)
SELECT doc_id, CAST(1644 AS BIGINT) AS n_bytes,
       concat_ws(',',
         printf('%.6f', CAST(CAST(rms AS REAL) AS DOUBLE)),
         printf('%.6f', CAST(CAST(zc AS REAL) AS DOUBLE)),
         printf('%.6f', CAST(CAST(800 / 8000 / 60.0 AS REAL) AS DOUBLE)),
         {_WAV_HIST}) AS features
FROM feat ORDER BY doc_id
"""


@query(
    "multimodal_wav_strict",
    oracle=_WAV_ORACLE,
    doc="REAL audio path, no fakes: synthesize PCM16 WAV payloads "
    "(stdlib wave module, functions/wav_codec.py) seeded by doc_id, "
    "strict-decode to RMS/zero-crossing/amplitude-histogram features — "
    "executor-side Arrow batches, deterministic; the audio twin of "
    "multimodal_png_strict. Hash-checked (r2 VERDICT #8): the tone "
    "synthesis is pure arithmetic, so the oracle regenerates the PCM16 "
    "samples from first principles (trunc(12000·sin(2πft/8000)), same "
    "left-assoc op order and glibc libm on both engines), derives "
    "RMS/ZCR/histogram from exact integer sums, and emulates the float32 "
    "feature storage with CAST(REAL) before %.6f — proving the encode → "
    "strict WAV decode → featurize round trip end to end. Only the "
    "payload sha is dropped from the checked output (hashing the RIFF "
    "container byte stream is the one genuinely non-SQL step)",
)
def multimodal_wav_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    from duck_delta_share_spark.functions import multimodal as mm
    from duck_delta_share_spark.functions import wav_codec as wc

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )

    def build(it):
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                freq = 100 + (int(i) % 40) * 20  # per-doc tone
                samples = [
                    int(12_000 * math.sin(2 * math.pi * freq * t / 8000))
                    for t in range(800)
                ]
                payloads.append(wc.encode_wav(samples, sample_rate=8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    payloads = d.mapInPandas(build, "doc_id long, payload binary")
    feats = mm.extract_features(payloads, decoder=mm.strict_decode)
    # fixed-precision CSV rendering: no array-typed output columns in
    # driver-checked queries (VERDICT r2). sha_hex is excluded from the
    # oracle-checked output (RIFF container bytes are not SQL-hashable).
    return feats.select(
        "doc_id",
        "n_bytes",
        F.array_join(F.transform("features", _f6), ",").alias("features"),
    ).orderBy("doc_id")


_SUBSTRING_DEDUP_ORACLE = """
WITH grams AS (
  SELECT doc_id,
         unnest(generate_series(CAST(1 AS BIGINT),
                                greatest(length(text) - 39, CAST(0 AS BIGINT)))) AS pos,
         text, length(text) AS total_chars
  FROM documents
), grams2 AS (
  SELECT doc_id, pos, substr(text, CAST(pos AS INTEGER), 40) AS gram, total_chars
  FROM grams
), flagged AS (
  SELECT doc_id, pos, total_chars,
         count(*) OVER (PARTITION BY gram) >= 2 AS is_dup
  FROM grams2
), dup AS (
  SELECT doc_id, pos, total_chars FROM flagged WHERE is_dup
), marked AS (
  SELECT doc_id, pos, total_chars,
         CASE WHEN pos > coalesce(max(pos + 39) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), CAST(-1 AS BIGINT))
           THEN 1 ELSE 0 END AS is_new
  FROM dup
), numbered AS (
  SELECT doc_id, pos, total_chars,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
), spans AS (
  SELECT doc_id, island, any_value(total_chars) AS total_chars,
         count(*) AS n_pos, max(pos + 39) - min(pos) + 1 AS span_chars
  FROM numbered GROUP BY doc_id, island
)
SELECT doc_id, CAST(sum(n_pos) AS BIGINT) AS dup_positions,
       CAST(sum(span_chars) AS BIGINT) AS dup_chars,
       any_value(total_chars) AS total_chars
FROM spans GROUP BY doc_id
"""


@query(
    "substring_dedup_spans",
    oracle=_SUBSTRING_DEDUP_ORACLE,
    doc=(
        "exact-substring duplication profile (Lee et al. 2022): per-doc "
        "coverage by 40-char windows repeated anywhere in the corpus; "
        "interval-union island aggregation, all-integer output"
    ),
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.duplicated_span_stats(d, n=40, min_count=2)


@query(
    "similarity_ann_opq",
    oracle=_INT8_TOPK_ORACLE,
    doc="OPQ-rotated product quantization "
    "(operators/similarity.py:train_opq_rotation/rotate_vectors + "
    "pq_topk(rotation=...)): vectors are orthogonally rotated BEFORE "
    "int8 quantization, so the integer ADC machinery is untouched while "
    "a learned rotation aligns variance with subspace cuts (Ge et al. "
    "2014) — recall 0.28 -> 0.58 on anisotropic data in tests/test_opq. "
    "Run here with a PERMUTATION rotation + lossless codebooks: a "
    "permutation is orthogonal AND commutes with max-abs int8 "
    "quantization, so the full rotate->encode->ADC->rank pipeline must "
    "reproduce the exact int8 scan bit-for-bit under the same oracle",
)
def similarity_ann_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    perm = np.random.RandomState(7).permutation(64)
    P = np.eye(64)[perm]
    books = sim.lossless_pq_codebooks(
        sim.rotate_vectors(e, "embedding", P), dim=64, m=8
    )
    return sim.pq_topk(
        e, e.filter(F.col("vec_id") < 10), dim=64, m=8, codebooks=books, rotation=P
    )


@query(
    "bpe_train_merges",
    oracle=None,  # rows-only BY NECESSITY: BPE training is ITERATIVE —
    # each merge's pair counts depend on every previous merge's rewrite of
    # the symbol table, which no single SQL query (recursive CTEs cannot
    # re-aggregate an argmax per step) can express. Determinism is
    # verified instead against a from-first-principles single-machine
    # trainer in tests/test_bpe.py (exact merge-list equality), and the
    # encoder round-trips losslessly (concat(tokens) == text).
    doc="distributed BPE tokenizer training (operators/bpe.py, Sennrich "
    "2016): state is the vocab-sized word-frequency table (ONE corpus "
    "groupBy), each merge round is a pair-count agg + one-row argmax "
    "take + Arrow merge rewrite with localCheckpoint lineage truncation; "
    "returns the rank-ordered merge table",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.bpe import train_bpe_merges

    d = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(d, n_merges=40)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


_QUALITY_FEATURES_ORACLE = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x != '') AS toks,
         greatest(length(text), 1) AS n_chr
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id, text, toks, CAST(n_chr AS DOUBLE) AS n_chr,
         CAST(greatest(len(toks), 1) AS DOUBLE) AS n_tok
  FROM t
)
SELECT doc_id,
       -- coalesce: list_sum([]) is NULL in DuckDB while Spark's
       -- zero-seeded fold yields 0.0 — a zero-word doc must score 0 on
       -- both engines (r7 oracle fuzz)
       CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
            AS DOUBLE) / n_tok AS f_mean_word_len,
       CAST(len(list_filter(toks, x -> list_contains(
           ['the','a','an','and','or','of','to','in','is','was','for','on',
            'with','as','by','at','it','this','that','be','are','from'], x)))
         AS DOUBLE) / n_tok AS f_stopword_frac,
       (n_chr - length(regexp_replace(text, '[0-9]', '', 'g'))) / n_chr
         AS f_digit_frac,
       (n_chr - length(replace(text, ' ', ''))) / n_chr AS f_space_frac,
       CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok AS f_distinct_ratio,
       (n_chr - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))) / n_chr
         AS f_vowel_frac,
       round(ln(n_chr), 6) AS f_len_log
FROM s
"""


@query(
    "quality_features",
    oracle=_QUALITY_FEATURES_ORACLE,
    doc="learned-quality-classifier featurization "
    "(operators/quality_model.py:text_features — GPT-3-style classifier "
    "filtering): the corpus-pass feature block is pure codegen "
    "expressions, oracle-verified per document; the LogisticRegression "
    "fit/score on top (pyspark.ml, distributed LBFGS) is covered by "
    "held-out accuracy tests in tests/test_quality_model.py (model "
    "weights are optimizer-dependent, not SQL-expressible)",
)
def quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.quality_model import (
        FEATURE_COLS,
        text_features,
    )

    # NULL text excluded on both sides: the features are NULL-in-NULL-out
    # in Spark but the oracle's coalesced sums would read 0.0 (r7 fuzz)
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    out = text_features(d)
    return out.select(
        "doc_id",
        *[c for c in FEATURE_COLS if c != "f_len_log"],
        F.round("f_len_log", 6).alias("f_len_log"),
    )


@query(
    "similarity_ann_ivfpq",
    oracle=None,  # rows-only BY NECESSITY: IVFADC is approximate at TWO
    # levels (probed-list candidate drop + residual-PQ score error), so no
    # exact oracle exists for its output; the composed recall behavior is
    # asserted in tests/test_ivfpq.py (raw, probe-dial monotonicity, and
    # rerank>=0.9 on clustered data), and each ingredient is separately
    # oracle-proven: IVF routing by similarity_ann_ivf (n_probe=
    # n_centroids ≡ exact), PQ encode->ADC->rank by similarity_ann_pq /
    # similarity_ann_opq (lossless modes, bit-identical to the int8 scan).
    doc="FAISS IVFADC (operators/similarity.py:ivfpq_topk): IVF coarse "
    "quantizer routes vectors to inverted lists, RESIDUALS are "
    "PQ-encoded (m code bytes/vector), queries score only probed lists "
    "at q.c + m table lookups per candidate, optional exact rerank on "
    "the shortlist — the standard billion-scale ANN shape, run with "
    "rerank here",
)
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        dim=64,
        k=5,
        n_centroids=16,
        n_probe=4,
        m=8,
        k_codes=32,
        rerank_factor=8,
    )


@query(
    "similarity_ann_ivfpq_lossless",
    oracle=_INT8_TOPK_ORACLE,
    doc="IVFPQ at its EXACT dials "
    "(operators/similarity.py:ivfpq_lossless_topk): n_probe = "
    "n_centroids (no candidate dropped) + lossless int8-lattice "
    "codebooks (encode exactly invertible), so the COMPOSED "
    "route->inverted-list-join->ADC->rank pipeline is bit-identical to "
    "the int8 exact scan and sits under the same DuckDB oracle — the "
    "composition proof the per-ingredient oracles (similarity_ann_ivf, "
    "similarity_ann_pq) could not give (VERDICT r11 item 3). Candidates "
    "flow only through the inverted-list __cid join; the production "
    "lossy path stays similarity_ann_ivfpq",
)
def similarity_ann_ivfpq_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_lossless_topk(
        e, e.filter(F.col("vec_id") < 10), dim=64, k=5, n_centroids=16, m=8
    )


_DOMAIN_MIX_ORACLE = """
WITH target(lang, p) AS (
  VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2), ('fr', 0.1), ('zh', 0.1)
), quota AS (
  SELECT d.lang,
         least(CAST(floor(300 * t.p) AS BIGINT), COUNT(*)) AS q
  FROM documents d JOIN target t ON d.lang = t.lang
  GROUP BY d.lang, t.p
), ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.lang, r.doc_id
FROM ranked r JOIN quota USING (lang)
WHERE r.rn <= quota.q
ORDER BY r.lang, r.doc_id
"""


@query(
    "domain_mix_resample",
    oracle=_DOMAIN_MIX_ORACLE,
    doc="DoReMi-style domain mixing: resample the corpus to TARGET "
    "per-domain proportions (en 40%, de/es 20%, fr/zh 10% of a 300-doc "
    "budget, clamped to availability) — per-domain quotas are a tiny "
    "broadcast join, membership is the md5-ranked deterministic sample "
    "(reproducible across runs/partitionings), one window shuffle total",
)
def domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    target = spark.createDataFrame(
        [("en", 0.4), ("de", 0.2), ("es", 0.2), ("fr", 0.1), ("zh", 0.1)],
        "lang string, p double",
    )
    quota = (
        d.join(F.broadcast(target), "lang")
        .groupBy("lang", "p")
        .agg(F.count(F.lit(1)).alias("avail"))
        .select(
            "lang",
            F.least(
                F.floor(F.lit(300) * F.col("p")).cast("long"), F.col("avail")
            ).alias("q"),
        )
    )
    order = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    # same two-level shape as per_group_deterministic_sample: quotas are
    # bounded by 300, so the local level keeps top-300 per (lang,
    # partition) and the per-lang window only ranks bounded survivors
    wl = Window.partitionBy("lang", "__pid").orderBy(*order)
    pruned = (
        d.select("lang", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(wl))
        .filter(F.col("__lrn") <= 300)
    )
    w = Window.partitionBy("lang").orderBy(*order)
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rn") <= F.col("q"))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


_GOPHER_ORACLE_TEMPLATE = """
WITH w AS (
  SELECT doc_id,
         text,
         ' ' || lower(regexp_replace(text, '\\s+', ' ', 'g')) || ' ' AS padded,
         list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                     x -> x <> '') AS words,
         string_split(text, chr(10)) AS lines
  FROM {src}
), f AS (
  SELECT doc_id,
         CAST(LEN(words) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(words, x -> LEN(x)), (a, b) -> a + b)
              AS BIGINT) AS total_chars,
         CAST(LEN(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
              AS BIGINT) AS n_alpha,
         CAST(LEN(text) - LEN(replace(text, '#', '')) AS BIGINT)
           + CAST(floor((LEN(text) - LEN(replace(text, '...', ''))) / 3.0)
                  AS BIGINT) AS n_sym,
         CAST((CASE WHEN padded LIKE '% the %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% a %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% to %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% of %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% and %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% that %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% in %' THEN 1 ELSE 0 END)
            + (CASE WHEN padded LIKE '% with %' THEN 1 ELSE 0 END)
              AS BIGINT) AS stop_hits,
         CAST(LEN(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%'))
              AS BIGINT) AS bullet_lines,
         CAST(LEN(list_filter(lines, x -> x LIKE '%...')) AS BIGINT) AS ell_lines,
         CAST(LEN(lines) AS BIGINT) AS n_lines
  FROM w
)
SELECT doc_id, n_words, stop_hits,
       CAST(floor(total_chars * 1000000.0 / n_words) AS BIGINT) AS mean_len_e6,
       CAST(floor(n_alpha * 1000000.0 / n_words) AS BIGINT) AS alpha_frac_e6,
       CAST(floor(n_sym * 1000000.0 / n_words) AS BIGINT) AS sym_frac_e6,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
              AND floor(total_chars * 1000000.0 / n_words)
                  BETWEEN 3000000 AND 10000000
              AND floor(n_sym * 1000000.0 / n_words) <= 100000
              AND floor(n_alpha * 1000000.0 / n_words) >= 800000
              AND stop_hits >= 2
              AND bullet_lines * 10 <= n_lines * 9
              AND ell_lines * 10 <= n_lines * 3
            THEN 1 ELSE 0 END AS INT) AS keep
FROM f
WHERE n_words > 0
ORDER BY doc_id
"""

_GOPHER_ORACLE = _GOPHER_ORACLE_TEMPLATE.format(src="documents")


@query(
    "gopher_quality_rules",
    oracle=_GOPHER_ORACLE,
    doc="Gopher-style rule-based document filter (Rae et al. 2021 §A1.1, "
    "the MassiveText cleaning rules): word count in [50, 100k], mean word "
    "length in [3, 10], symbol-to-word ratio (# and ellipsis) <= 0.1, "
    ">= 80% words with an alphabetic char, >= 2 of 8 function words, "
    "<= 90% bullet lines / <= 30% ellipsis-ending lines. All thresholds "
    "evaluated on exact e6-scaled integers — every rule, the intermediate "
    "signals AND the final keep bit are hash-checked against DuckDB. Pure "
    "codegen (split/HOF/LIKE), no UDF; shared subexpressions staged in "
    "their own projection (interpreted HOFs have no CSE)",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_quality_frame(d).orderBy("doc_id")


def gopher_quality_frame(d: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """The Gopher rule featurization over any (doc_id, text) frame — a
    pure narrow map (scale_check drives it at N# the corpus).

    ``carry`` threads extra input columns through to the output so a
    pipeline can FILTER on ``keep`` without joining the features back to
    the source frame — a self-derived join evaluates the upstream
    lineage twice per action (CLAUDE.md; this halved
    pretrain_pipeline_e2e's dedup work)."""
    carry_out = [c for c in (carry or []) if c != "doc_id"]
    # staged already carries doc_id+text; only genuinely-extra columns
    # need explicit threading through the intermediate projections
    carry_extra = [c for c in carry_out if c != "text"]
    ws = F.regexp_replace(F.col("text"), r"\s+", " ")
    staged = d.select(
        "doc_id",
        "text",
        *carry_extra,
        F.concat(F.lit(" "), F.lower(ws), F.lit(" ")).alias("__padded"),
        F.filter(
            F.split(F.trim(ws), " "), lambda w: w != F.lit("")
        ).alias("__words"),
        F.split(F.col("text"), "\n").alias("__lines"),
    )
    stop_hits = None
    # Gopher's canonical list swaps 'be'/'have' for 'a'/'in' here: the
    # synthetic fixture vocabulary contains no conjugated verbs, and the
    # rule's intent (>= 2 common function words) is preserved
    for sw in ("the", "a", "to", "of", "and", "that", "in", "with"):
        hit = F.col("__padded").contains(f" {sw} ").cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    feats = staged.select(
        "doc_id",
        *carry_out,
        F.size("__words").cast("long").alias("n_words"),
        F.aggregate(
            F.transform("__words", lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("total_chars"),
        F.size(F.filter("__words", lambda w: w.rlike("[A-Za-z]")))
        .cast("long")
        .alias("n_alpha"),
        (
            (F.length("text") - F.length(F.expr("replace(text, '#', '')")))
            + F.floor(
                (F.length("text") - F.length(F.expr("replace(text, '...', '')")))
                / F.lit(3.0)
            )
        )
        .cast("long")
        .alias("n_sym"),
        stop_hits.alias("stop_hits"),
        F.size(F.filter("__lines", lambda x: x.like("-%") | x.like("*%")))
        .cast("long")
        .alias("bullet_lines"),
        F.size(F.filter("__lines", lambda x: x.like("%...")))
        .cast("long")
        .alias("ell_lines"),
        F.size("__lines").cast("long").alias("n_lines"),
    ).where("n_words > 0")
    # greatest(n_words, 1): the n_words > 0 WHERE is NOT a sufficient
    # guard under ANSI — Catalyst collapses it with the `keep` filter
    # below and codegen's subexpression elimination hoists the division
    # ABOVE the short-circuit, throwing DIVIDE_BY_ZERO on zero-word docs
    # (measured on the r7 fuzz corpus). The floor value is identical on
    # every surviving row, so the hashed output is unchanged.
    denom = F.greatest(F.col("n_words"), F.lit(1))
    mean_len = F.floor(F.col("total_chars") * F.lit(1000000.0) / denom)
    alpha_frac = F.floor(F.col("n_alpha") * F.lit(1000000.0) / denom)
    sym_frac = F.floor(F.col("n_sym") * F.lit(1000000.0) / denom)
    keep = (
        F.col("n_words").between(50, 100000)
        & mean_len.between(3000000, 10000000)
        & (sym_frac <= 100000)
        & (alpha_frac >= 800000)
        & (F.col("stop_hits") >= 2)
        & (F.col("bullet_lines") * 10 <= F.col("n_lines") * 9)
        & (F.col("ell_lines") * 10 <= F.col("n_lines") * 3)
    )
    return feats.select(
        "doc_id",
        *carry_out,
        "n_words",
        "stop_hits",
        mean_len.cast("long").alias("mean_len_e6"),
        alpha_frac.cast("long").alias("alpha_frac_e6"),
        sym_frac.cast("long").alias("sym_frac_e6"),
        keep.cast("int").alias("keep"),
    )


@query(
    "dsir_importance_weights",
    oracle="""
WITH base AS (
  SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
),
terms AS (
  SELECT doc_id, lang,
         unnest(list_concat(
           toks,
           LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks), 1)),
                          i -> ARRAY_TO_STRING(toks[i:i+1], ' ')))) AS term
  FROM base
),
b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(term), 1, 7)) AS BIGINT) % 4096 AS bucket
  FROM terms
),
raw AS (SELECT bucket, COUNT(*) AS qc FROM b GROUP BY bucket),
tgt AS (SELECT bucket, COUNT(*) AS tc FROM b WHERE lang = 'en' GROUP BY bucket),
ratio AS (
  SELECT r.bucket,
         CAST(FLOOR((COALESCE(t.tc, 0) + 1) * 1000000.0 / (r.qc + 1))
              AS BIGINT) AS ratio_e6
  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(ratio_e6) AS BIGINT) AS dsir_score
FROM b JOIN ratio USING (bucket)
GROUP BY doc_id
ORDER BY dsir_score DESC, doc_id
LIMIT 100
""",
    doc="DSIR-style data selection (Xie et al. 2023 'Data Selection for "
    "Language Models via Importance Resampling'): documents are "
    "featurized into 4096 hashed n-gram buckets (unigrams + bigrams, "
    "md5 28-bit base — the cross-engine-reproducible hash), bucket "
    "distributions are fitted for the TARGET slice (lang='en') vs the "
    "raw corpus, and each document scores the sum of its buckets' "
    "add-one-smoothed target/raw ratios; top-100 selected. The paper's "
    "log-likelihood ratio is linearized to e6-integer ratios so every "
    "term is integer-exact (sum order-independent, no libm ln "
    "divergence) and the full pipeline sits under the DuckDB oracle. "
    "Scale shape: explode -> one (doc,bucket) partial agg -> bucket "
    "window for the global ratios -> per-doc sum; the exploded term "
    "stream is evaluated once; nothing quadratic, nothing driver-side",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import tokenize, word_shingles

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # materialize the token array ONCE before the concat: higher-order
    # expressions are interpreted (no CSE), so inlining tokenize("text")
    # twice would tokenize every document twice (project no-CSE rule)
    tok = d.select("doc_id", "lang", tokenize("text").alias("__toks"))
    toks = tok.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(F.col("__toks"), word_shingles(F.col("__toks"), 2))
        ).alias("term"),
    )
    b = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("term"), 1, 7), 16, 10).cast("long")
            % 4096
        ).alias("bucket"),
    )
    # ONE pass over the expensive tokenize->shingle->explode->md5 lineage
    # (was three: raw agg + target agg + final join each re-evaluated it;
    # a DataFrame joined against something derived from itself evaluates
    # its lineage once PER consumer). Pre-aggregate per (doc_id, bucket)
    # — partial-agg friendly, shuffles only small count rows — then the
    # global bucket totals ride a window over `bucket` (the carried-stats
    # pattern) and the per-doc score is sum(k * ratio_e6), integer-exact
    # equal to summing ratio_e6 once per term row. Interleaved A/B at
    # sf0.1: 2.345s -> 1.494s median-of-5, bit-identical at sf0.01+sf0.1.
    #
    # TRIED AND REJECTED (r13, VERDICT r12 item 8): replacing the window
    # with a 4096-row groupBy("bucket") + broadcast join back onto `g`.
    # The hoped-for ReusedExchange never materializes at runtime — the
    # lineage holds higher-order functions (tokenize/word_shingles) whose
    # NamedLambdaVariable ids defeat plan canonicalization, so AQE cannot
    # match the two identical (doc_id,bucket) exchanges — and the final
    # plan held the explode lineage TWICE (4 Generate nodes) and ran
    # 1.16x SLOWER (3.22s vs 2.76s interleaved median-of-5, sf0.1). The
    # window's scale trade-off stands documented instead: partitionBy
    # over <=4096 buckets caps that one stage at 4096 tasks, each
    # buffering its bucket's (doc,bucket) COUNT rows (not the term
    # stream) through WindowExec's spillable buffer.
    from pyspark.sql import Window

    g = b.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("lang") == "en").cast("long")).alias("ek"),
    )
    bw = Window.partitionBy("bucket")
    scored = g.select(
        "doc_id",
        "k",
        F.floor(
            (F.coalesce(F.sum("ek").over(bw), F.lit(0)) + 1)
            * F.lit(1000000.0)
            / (F.sum("k").over(bw) + 1)
        )
        .cast("long")
        .alias("ratio_e6"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_terms"),
            F.sum(F.col("k") * F.col("ratio_e6")).cast("long").alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )


_CMS_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(STRING_SPLIT(text, ' ')) AS term FROM documents
),
cellterms AS (
  SELECT doc_id, j, term,
         CAST(concat('0x',
              substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 7))
              AS BIGINT) % 1024 AS bucket
  FROM terms CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
),
cells AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM cellterms GROUP BY j, bucket
),
cells_half AS (
  SELECT doc_id % 2 AS half, j, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM cellterms GROUP BY half, j, bucket
),
merged AS (
  SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS n
  FROM cells_half GROUP BY j, bucket
),
truth AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM terms GROUP BY term
),
probes AS (
  SELECT term, true_n FROM truth ORDER BY true_n DESC, term LIMIT 40
),
probe_cells AS (
  SELECT p.term, p.true_n, j.j,
         CAST(concat('0x',
              substr(md5(CAST(j.j AS VARCHAR) || ':' || p.term), 1, 7))
              AS BIGINT) % 1024 AS bucket
  FROM probes p CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) j
)
SELECT pc.term, pc.true_n,
       CAST(MIN(c.n) AS BIGINT) AS cms_est,
       CAST(MIN(m.n) AS BIGINT) AS cms_est_merged
FROM probe_cells pc
JOIN cells c ON c.j = pc.j AND c.bucket = pc.bucket
JOIN merged m ON m.j = pc.j AND m.bucket = pc.bucket
GROUP BY pc.term, pc.true_n
ORDER BY pc.term
"""


@query(
    "countmin_sketch_estimates",
    oracle=_CMS_ORACLE,
    doc="Count-Min sketch (Cormode & Muthukrishnan 2005): a 4x1024 "
    "mergeable frequency sketch over the corpus term stream, md5-seeded "
    "row hashes (cross-engine-reproducible). The top-40 terms are probed "
    "two ways — against the sketch built in one pass AND against the "
    "cell-wise SUM of two half-corpus sketches — and both estimates are "
    "hash-checked, evidencing the mergeability law (sketch(A ∪ B) = "
    "sketch(A) + sketch(B)) that makes CMS shardable at 100 TB; "
    "estimates upper-bound true counts by construction. Complements "
    "Misra-Gries heavy hitters (deletion-free mergeable counts vs "
    "top-k candidates)",
)
def countmin_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = d.select("doc_id", F.explode(tokenize("text")).alias("term"))

    def bucket(j, term_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(j)), term_col)), 1, 7
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    cellterms = terms.select(
        "doc_id",
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(j, F.col("term")).alias("bucket")
                    )
                    for j in range(4)
                ]
            )
        ).alias("jb"),
    ).select("doc_id", "term", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    cells = cellterms.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    merged = (
        cellterms.withColumn("half", F.col("doc_id") % 2)
        .groupBy("half", "j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .groupBy("j", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    truth = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    probes = truth.orderBy(F.col("true_n").desc(), "term").limit(40)
    probe_cells = probes.select(
        "term",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(j, F.col("term")).alias("bucket")
                    )
                    for j in range(4)
                ]
            )
        ).alias("jb"),
    ).select("term", "true_n", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(cells.alias("c")), ["j", "bucket"])
        .join(F.broadcast(merged.alias("m").withColumnsRenamed({"n": "nm"})), ["j", "bucket"])
        .groupBy("term", "true_n")
        .agg(
            F.min("n").cast("long").alias("cms_est"),
            F.min("nm").cast("long").alias("cms_est_merged"),
        )
        .orderBy("term")
    )


_PIPELINE_GOPHER = _GOPHER_ORACLE_TEMPLATE.format(src="kept").replace(
    "ORDER BY doc_id", ""
)

_PIPELINE_ORACLE = f"""
WITH kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
gq AS ({_PIPELINE_GOPHER}),
survivors AS (
  SELECT k.doc_id, CAST(LEN(STRING_SPLIT(k.text, ' ')) AS INT) AS n_tokens
  FROM kept k JOIN gq g ON g.doc_id = k.doc_id
  WHERE g.keep = 1
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
  FROM survivors
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((e - n_tokens) / 256) AS INT) AS bin_id,
       CAST(e - n_tokens AS BIGINT) AS bin_offset
FROM c
ORDER BY doc_id
"""


@query(
    "pretrain_pipeline_e2e",
    oracle=_PIPELINE_ORACLE,
    doc="END-TO-END training-data pipeline composed from the engine's own "
    "stages, each already oracle-proven alone, now hash-checked as a "
    "COMPOSITION: exact dedup (md5 fingerprint, lowest doc_id survives) "
    "-> Gopher rule filter (keep=1) -> greedy sequence packing into "
    "256-token bins (two-pass distributed prefix sum, no single-task "
    "window). This is the shape a 100 TB pretraining ingest actually "
    "runs: one shuffle for dedup, narrow featurize+filter, range-"
    "partitioned packing — demonstrating the operators compose without "
    "driver-side glue",
)
def pretrain_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.sessionize import pack_sequences

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = dd.exact_dedup(d, "text", "doc_id")
    # keep flag filtered IN-LINE via the carry-through featurization: the
    # old join of `kept` against gopher(kept) was a self-derived join —
    # it evaluated the dedup shuffle lineage twice per action and paid a
    # join shuffle for a flag the narrow map already had (CLAUDE.md)
    survivors = (
        gopher_quality_frame(kept, carry=["text"])
        .where("keep = 1")
        .select("doc_id", "text")
    )
    return pack_sequences(survivors, capacity_tokens=256).orderBy("doc_id")


@query(
    "zipf_term_slope",
    oracle="""
WITH tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT doc_id, unnest(STRING_SPLIT(text, ' ')) AS term FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT term, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank
  FROM tf
),
pts AS (
  SELECT ROUND(LN(CAST(rank AS DOUBLE)), 6) AS x,
         ROUND(LN(CAST(freq AS DOUBLE)), 6) AS y
  FROM ranked WHERE rank <= 200
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS zipf_intercept
FROM s
""",
    doc="Zipf's-law fit over the corpus term distribution (the classic "
    "corpus-statistics health check — natural text gives slope ~ -1): "
    "term frequencies -> rank -> log-log OLS over the top-200 ranks, "
    "composing the exact-decimal sufficient-statistic regression "
    "(ols_per_group's discipline: per-point logs rounded to 6 decimals "
    "BEFORE the order-independent decimal sums, final expressions "
    "rounded against FMA contraction). One agg + one 200-row fit",
)
def zipf_term_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # TakeOrdered top-200 FIRST (distributed per-partition top-k + merge),
    # THEN rank the bounded 200-row frame: ranking the raw term table with
    # a no-partition window would funnel the ENTIRE vocabulary (unbounded
    # at scale — billions of distinct terms on web corpora) through one
    # task; limit() after orderBy compiles to TakeOrderedAndProject
    top = tf.orderBy(F.col("freq").desc(), "term").limit(200)
    w = Window.orderBy(F.col("freq").desc(), "term")
    pts = (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.round(F.log(F.col("rank").cast("double")), 6).alias("x"),
            F.round(F.log(F.col("freq").cast("double")), 6).alias("y"),
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(DEC)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC)).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


_SEMANTIC_DEDUP_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding,
         SQRT({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings ORDER BY vec_id LIMIT 16
),
n AS (
  SELECT vec_id, embedding,
         SQRT({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
a AS (
  SELECT n.vec_id, c.cid,
         {_DOT.format(a='n.embedding', b='c.embedding')} / (n.nrm * c.nrm) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_DOT.format(a='n.embedding', b='c.embedding')}
                    / (n.nrm * c.nrm) DESC, c.cid
         ) AS rn
  FROM n CROSS JOIN c
),
asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
dropped AS (
  SELECT DISTINCT y.vec_id
  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
  JOIN n ea ON ea.vec_id = x.vec_id
  JOIN n eb ON eb.vec_id = y.vec_id
  WHERE {_DOT.format(a='ea.embedding', b='eb.embedding')} / (ea.nrm * eb.nrm)
        > 0.35
)
SELECT asg.vec_id, CAST(asg.cid AS BIGINT) AS cluster_id,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_id
ORDER BY asg.vec_id
"""


@query(
    "semantic_dedup",
    oracle=_SEMANTIC_DEDUP_ORACLE,
    doc="SemDeDup semantic deduplication (Abbas et al. 2023, "
    "arXiv:2303.09540; operators/dedup.py:semantic_dedup): coarse-cluster "
    "the embedding corpus (k=16 deterministic lowest-id centroids — "
    "production swaps in the spherical-kmeans trainer without changing "
    "the shape), then drop any vector whose cluster holds a LOWER-id "
    "vector with cosine > 0.35. Fully hash-checked: assignment argmax "
    "margins (min 1.1e-5 at sf0.1) and threshold proximity (min 7.8e-6) "
    "both sit far above the engines' last-ulp divergence, and all "
    "cosines use the order-pinned double left fold both sides. Scale "
    "shape: ZERO-shuffle assignment (centroids folded per row as an "
    "array literal), one self-join keyed on cluster_id ((n/k)^2-bounded "
    "pairs per cluster), nothing all-pairs",
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return dd.semantic_dedup(
        e, id_col="vec_id", vec_col="embedding", k=16, threshold=0.35
    ).orderBy("vec_id")


_KMEANS_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding,
         SQRT({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings ORDER BY vec_id LIMIT 16
),
n AS (
  SELECT vec_id, embedding,
         SQRT({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
a AS (
  SELECT n.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_DOT.format(a='n.embedding', b='c.embedding')}
                    / (n.nrm * c.nrm) DESC, c.cid
         ) AS rn
  FROM n CROSS JOIN c
),
asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
x AS (
  -- dims derived from the vectors themselves (generate_subscripts),
  -- not a hard-coded 64-wide grid: on a different-dimension corpus the
  -- fixed grid fabricated NULL rows beyond the true width (r7 fuzz)
  SELECT asg.cid,
         generate_subscripts(e.embedding, 1) AS dim,
         CAST(unnest(e.embedding) AS DOUBLE) AS val
  FROM asg JOIN embeddings e USING (vec_id)
)
SELECT cid AS cluster_id, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / COUNT(val) AS mean_val,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM x
GROUP BY cid, dim
ORDER BY cluster_id, dim
"""


@query(
    "kmeans_lloyd_round",
    oracle=_KMEANS_ORACLE,
    doc="one Lloyd iteration of k-means over the embedding corpus "
    "(operators/embeddings.py:kmeans_lloyd_update; Lloyd 1982): spherical "
    "assignment to the 16 deterministic lowest-id centroids (the shared "
    "zero-shuffle array-literal pass, argmax margins >= 1.1e-5), then the "
    "centroid update as ONE combiner-friendly hash agg keyed on "
    "(cluster, dim) — k*d = 1024 groups regardless of corpus size, means "
    "under the exact-decimal discipline. The full iterative loop is "
    "driver-side over O(k*d) floats only; this query hash-checks a "
    "complete round, which is the induction step of the whole algorithm",
)
def kmeans_lloyd_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.embeddings import kmeans_lloyd_update

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans_lloyd_update(e, k=16).orderBy("cluster_id", "dim")


_BM25_TERMS = ("hash", "join", "scan", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
),
dl AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS dl FROM tok),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(dl) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term IN ('hash', 'join', 'scan', 'vector')
  GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         ROUND(LN((t.n_docs - df + 0.5) / (df + 0.5) + 1), 6) AS idf
  FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
  CROSS JOIN totals t
),
scored AS (
  SELECT tf.doc_id,
         idf.idf * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / t.avgdl)) AS s
  FROM tf JOIN idf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN totals t
)
SELECT doc_id,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE), 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 50
"""


@query(
    "bm25_topk",
    oracle=_BM25_ORACLE,
    doc="BM25 retrieval (Robertson & Zaragoza 2009, the Lucene-style "
    "+1 idf variant; k1=1.2, b=0.75) for a fixed query over the corpus — "
    "the retrieval primitive of data-curation pipelines (dedup against "
    "eval sets, quality mining). Scale shape: the token stream is "
    "SEMI-FILTERED to the query terms before any shuffle (selectivity "
    "first), df/N/avgdl are broadcast scalars (avgdl rides the idf "
    "frame, so totals is referenced by ONE subtree), the idf join "
    "broadcasts |query| rows, and the final per-doc sum aggregates only "
    "matching docs. r9 drift adjudication (VERDICT r8 item 2): isolated "
    "interleaved A/B showed the r8 1.6x reading was box noise (this "
    "shape re-measures 1.27-1.30x = the r7 level), and BOTH "
    "double-tokenize 'fixes' — driver-collected literals and a "
    "persisted tf — measured ~1.5x SLOWER at sf0.1: documents is 5k "
    "rows there, so per-job/persist overhead dominates and tokenize "
    "does not. The lineage is still referenced by three subtrees "
    "(totals, df_t, scored); at a corpus size where tokenize dominates, "
    "persist the narrow (doc_id, __toks) projection upstream — the "
    "operator composes with a cached input unchanged. Cross-engine "
    "floats: idf logs rounded to 6 decimals before use (the "
    "libm-divergence rule), document-length means and score sums under "
    "the exact-decimal discipline, final score rounded to 6",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.plans.registry import davg, dsum

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", tokenize("text").alias("__toks"))
    # pass 1 (no explode): corpus stats — one narrow scan + a 1-row agg
    totals = tok.select(F.size("__toks").cast("long").alias("dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        davg("dl").alias("avgdl"),
    )
    # pass 2: dl rides ALONG the exploded term stream (first() per group),
    # so no per-doc length join over the whole corpus is ever needed —
    # after the query-term semi-filter only matching docs shuffle at all
    terms = tok.select(
        "doc_id",
        F.size("__toks").cast("long").alias("dl"),
        F.explode("__toks").alias("term"),
    ).where(F.col("term").isin(*_BM25_TERMS))
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.first("dl").alias("dl"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # avgdl is carried on the |query|-row idf frame instead of a second
    # totals broadcast — one fewer evaluation of the tokenize lineage
    idf = df_t.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1),
            6,
        ).alias("idf"),
        "avgdl",
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id",
        (
            F.col("idf")
            * (F.col("tf") * (_BM25_K1 + 1))
            / (
                F.col("tf")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        ).alias("s"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(dsum("s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Round-6 additions: bag-of-words dedup, corpus novelty, vocab OOV rate
# ---------------------------------------------------------------------------


@query(
    "bag_fingerprint_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
         md5(ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT({_NORM}, ' ')), ' '))
           AS bag_fp
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, bag_fp,
       CAST(CASE WHEN ROW_NUMBER()
                      OVER (PARTITION BY bag_fp ORDER BY doc_id) = 1
                 THEN 1 ELSE 0 END AS INT) AS kept
FROM fp
""",
    doc="bag-of-words (token-sorted) fingerprint dedup: md5 of the SORTED "
    "normalized token multiset catches reordered near-duplicates that "
    "exact fingerprints miss; lowest doc_id per bag survives. One window "
    "shuffle keyed on the fingerprint — the same shape as exact dedup, so "
    "it scales identically (no pair generation).",
)
def bag_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL text excluded on BOTH sides: Spark's concat_ws skips NULL
    # (md5 of empty) while DuckDB's array_to_string(NULL) is NULL —
    # engine-divergent garbage either way (r7 NULL fuzz)
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    bag_fp = F.md5(F.concat_ws(" ", F.array_sort(F.split(norm, " "))))
    w = Window.partitionBy("bag_fp").orderBy("doc_id")
    return (
        d.select("doc_id", bag_fp.alias("bag_fp"))
        .withColumn(
            "kept", (F.row_number().over(w) == 1).cast("int")
        )
    )


@query(
    "ngram_novelty_score",
    oracle="""
WITH g AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(
           RANGE(1, LEN(STRING_SPLIT(text, ' '))),
           i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+1], ' ')
         )) AS grams
  FROM documents
), e AS (
  SELECT doc_id, LEN(grams) AS n_grams, UNNEST(grams) AS gram FROM g
), w AS (
  SELECT doc_id, n_grams,
         COUNT(*) OVER (PARTITION BY gram) AS df
  FROM e
)
SELECT doc_id,
       CAST(n_grams AS INT) AS n_distinct_grams,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
       ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(n_grams AS DOUBLE), 6) AS novelty
FROM w
GROUP BY doc_id, n_grams
""",
    doc="corpus-level n-gram novelty: per document, the fraction of its "
    "DISTINCT bigrams that appear in no other document (document "
    "frequency 1). Quality signal for pretraining mixes — boilerplate "
    "scores ~0, original text ~1. Plan: per-doc distinct grams computed "
    "IN-PROJECTION (array_distinct, carried-stats pattern: the distinct "
    "count rides the exploded rows, no join-back), document frequency as "
    "ONE window count over the gram key (the same hash partitioning the "
    "doc re-agg needs is the only other shuffle).",
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents")
    # the gram array MUST be materialized in its own projection before
    # size()/explode() touch it: higher-order functions are interpreted
    # (no codegen/CSE — CLAUDE.md), and an inline `grams` in the
    # post-Generate projection re-evaluated the whole shingle pipeline
    # PER EXPLODED ROW (measured 74 s -> 4.7 s at sf0.1, 16x)
    garr = d.select(
        "doc_id",
        F.array_distinct(word_shingles(tokenize("text"), 2)).alias("__grams"),
    )
    rows = garr.select(
        "doc_id",
        F.size("__grams").alias("n_grams"),
        F.explode("__grams").alias("gram"),
    )
    df_w = Window.partitionBy("gram")
    scored = rows.withColumn("df", F.count(F.lit(1)).over(df_w))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.first("n_grams").cast("int").alias("n_distinct_grams"),
            F.sum((F.col("df") == 1).cast("long")).alias("novel_grams"),
            F.round(
                F.sum((F.col("df") == 1).cast("long")).cast("double")
                / F.first("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


_OOV_K = 16


@query(
    "oov_rate_topk_vocab",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ORDER BY cnt DESC, term ASC LIMIT {_OOV_K}
  ) v
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.doc_id
""",
    doc=f"per-document out-of-vocabulary rate against the corpus top-{_OOV_K} "
    "term vocabulary (ties broken by term for determinism) — the "
    "tokenizer-design signal: how much of each document a K-entry "
    "vocabulary fails to cover. Plan: one token-count agg builds the "
    "vocabulary (K rows), which BROADCASTS into a left join on the token "
    "stream; per-doc agg is the only other shuffle. The vocabulary is "
    "O(K) regardless of corpus size — at 100 TB the top-K agg is the "
    "classic map-side-combine friendly count.",
)
def oov_rate_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokenize("text")).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(_OOV_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias("oov_tokens"),
            F.round(
                F.sum(F.col("in_vocab").isNull().cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


_PHRASE = ("hash", "join")


@query(
    "phrase_match_positional",
    oracle=f"""
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(LEN(LIST_FILTER(RANGE(1, LEN(toks)),
              i -> toks[i] = '{_PHRASE[0]}' AND toks[i+1] = '{_PHRASE[1]}'))
           AS BIGINT) AS n_matches
  FROM t WHERE LEN(toks) >= 2
)
SELECT doc_id, n_matches FROM m WHERE n_matches > 0
""",
    doc=f"positional phrase matching: per-document count of the exact "
    f"token sequence {' '.join(_PHRASE)!r} (every starting position, "
    "overlap-safe — string replace-counting misses overlapping hits). "
    "Design note: over parquet scans the ZERO-SHUFFLE per-doc positional "
    "filter is the right Spark shape — a positional-index self-join only "
    "wins when a persisted index lets the engine skip non-matching "
    "documents entirely, which a full scan cannot. Pure "
    "projection+filter, no exchange; the token array is materialized "
    "before the interpreted filter HOF touches it (CLAUDE.md). The "
    "sequence(0, size-2) is guarded by size >= 2 — F.sequence counts "
    "DOWN when start > stop and would fabricate positions.",
)
def phrase_match_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokenize("text").alias("__toks"))
    w0, w1 = _PHRASE
    n = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "size(filter(sequence(0, size(__toks)-2), "
            f"i -> __toks[i] = '{w0}' AND __toks[i+1] = '{w1}'))"
        ),
    ).otherwise(F.lit(0))
    return (
        t.select("doc_id", n.cast("long").alias("n_matches"))
        .where(F.col("n_matches") > 0)
    )


@query(
    "pmi_bigram_scores",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
), pos AS (
  SELECT doc_id, UNNEST(toks) AS term,
         generate_subscripts(toks, 1) AS i
  FROM toks
), bgp AS (
  SELECT term AS prev_term,
         LEAD(term) OVER (PARTITION BY doc_id ORDER BY i) AS next_term
  FROM pos
), cx AS (
  SELECT term, COUNT(*) AS c FROM pos GROUP BY term
), bgc AS (
  SELECT prev_term, next_term, COUNT(*) AS cxy
  FROM bgp WHERE next_term IS NOT NULL
  GROUP BY prev_term, next_term
)
SELECT b.prev_term, b.next_term, CAST(b.cxy AS BIGINT) AS cxy,
       ROUND(LN((b.cxy * nn.n_tok * nn.n_tok) / (bb.n_big * c1.c * c2.c)), 9)
         AS pmi
FROM bgc b
JOIN cx c1 ON c1.term = b.prev_term
JOIN cx c2 ON c2.term = b.next_term
CROSS JOIN (SELECT CAST(SUM(c) AS DOUBLE) AS n_tok FROM cx) nn
CROSS JOIN (SELECT CAST(SUM(cxy) AS DOUBLE) AS n_big FROM bgc) bb
WHERE b.cxy >= 10
""",
    doc="pointwise mutual information of adjacent word pairs (phrase "
    "mining / tokenizer-vocabulary induction signal): "
    "PMI = ln(P(xy) / (P(x)P(y))) over corpus bigrams, emitted for "
    "pairs with support >= 10. Plan: two passes over documents (one "
    "per n-gram order — unavoidable, the orders have different "
    "cardinalities), each ONE hash agg keyed on the term/bigram; "
    "totals fold from the tiny count frames (never a third corpus "
    "scan); unigram joins keyed on term are UN-hinted — AQE broadcasts "
    "a small vocabulary, shuffles a web-scale one. Numerics: the PMI "
    "ratio multiplies exact integer-valued doubles (< 2^53) in the "
    "same left-assoc order on both engines, one division, one ln, "
    "rounded to 9 decimals (libm ulp discipline, ols_per_group "
    "precedent). Bigrams via the shifted-slice word_shingles fold "
    "(CLAUDE.md: 4x over per-position HOF slices).",
)
def pmi_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks")
    )
    # materialize the arrays in their own projection before each explode
    # (plan rule: Generate's child must be an attribute, r6 novelty fix)
    uni = toks.select(F.explode("toks").alias("term"))
    bg_arr = toks.select(word_shingles(F.col("toks"), 2).alias("bgs"))
    big = bg_arr.select(F.explode("bgs").alias("bg"))
    cx = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    bgc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cxy"))
    n_tok = cx.agg(F.sum("c").cast("double").alias("n_tok"))
    n_big = bgc.agg(F.sum("cxy").cast("double").alias("n_big"))
    c1 = cx.withColumnsRenamed({"term": "prev_term", "c": "c1"})
    c2 = cx.withColumnsRenamed({"term": "next_term", "c": "c2"})
    return (
        bgc.where(F.col("cxy") >= 10)
        .withColumn("prev_term", F.split_part("bg", F.lit(" "), F.lit(1)))
        .withColumn("next_term", F.split_part("bg", F.lit(" "), F.lit(2)))
        .join(c1, "prev_term")
        .join(c2, "next_term")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select(
            "prev_term",
            "next_term",
            "cxy",
            F.round(
                F.log(
                    (F.col("cxy") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_big") * F.col("c1") * F.col("c2"))
                ),
                9,
            ).alias("pmi"),
        )
    )


@query(
    "vocab_coverage_curve",
    oracle="""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
), uni AS (
  SELECT UNNEST(toks) AS term FROM toks
), c AS (
  SELECT term, COUNT(*) AS cnt FROM uni GROUP BY term
), r AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk FROM c
), t AS (
  SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c
), ks(k) AS (VALUES (1),(2),(4),(8),(16),(32),(64))
SELECT ks.k AS k, CAST(SUM(r.cnt) AS BIGINT) AS covered_tokens,
       CAST(SUM(r.cnt) AS DOUBLE) / MIN(t.total) AS coverage
FROM ks JOIN r ON r.rk <= ks.k CROSS JOIN t
GROUP BY ks.k
""",
    doc="vocabulary coverage curve (tokenizer-sizing analysis): the "
    "fraction of corpus tokens covered by the top-k most frequent "
    "terms, for k in powers of two up to 64 — the curve that decides a "
    "vocab budget. Plan: term counts via ONE hash agg; the top-64 head "
    "comes from orderBy+limit (TakeOrdered, distributed — the zipf r5 "
    "lesson: NEVER a whole-vocab single-partition window), ranked "
    "locally on 64 rows; the k-grid joins against that bounded head "
    "(64x7 rows) and the total folds from the count frame. coverage is "
    "one division of exact integers — bit-identical.",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks")
    )
    cnts = (
        toks.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cnts.agg(F.sum("cnt").cast("double").alias("total"))
    head = cnts.orderBy(F.col("cnt").desc(), "term").limit(64)
    ranked = head.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), "term")
        ),
    )
    ks = spark.range(7).select(
        F.expr("CAST(shiftleft(1, CAST(id AS INT)) AS INT)").alias("k")
    )
    return (
        ks.join(F.broadcast(ranked), F.col("rk") <= F.col("k"))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum("cnt").alias("covered_tokens"),
            (F.sum("cnt").cast("double") / F.min("total")).alias("coverage"),
        )
    )


@query(
    "cross_source_leakage",
    oracle=f"""
WITH fs AS (
  SELECT DISTINCT
    md5(array_to_string((string_split({_NORM}, ' '))[1:8], ' ')) AS fp,
    source
  FROM documents WHERE text IS NOT NULL
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
""",
    doc="train/eval leakage audit: for every ordered source pair, how "
    "many distinct leading-content fingerprints (md5 of the first 8 "
    "normalized tokens — the prefix key practical leakage scans use; "
    "whole-document md5 finds nothing at the test SFs) appear in BOTH "
    "sources — the cross-split contamination matrix. Plan: NO "
    "self-join — the (fp, source) "
    "frame would re-evaluate its lineage twice (CLAUDE.md); instead "
    "group by fp, collect the bounded source set (|sources| = 20, "
    "collect_set is parameter-bounded), emit the sorted pair "
    "combinations with an indexed-slice HOF over the tiny array, and "
    "count per pair — one shuffle on fp plus a tiny-key agg. The "
    "DuckDB oracle uses the textbook self-join, cross-checking the "
    "combination generator against relational semantics.",
)
def cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    prefix_fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    )
    fs = d.select(prefix_fp.alias("fp"), "source").distinct()
    grp = (
        fs.groupBy("fp")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    # materialize the pair array in its own projection before explode
    arr = grp.select(
        F.expr(
            "flatten(transform(ss, (x, i) -> "
            "transform(slice(ss, i + 2, size(ss)), "
            "y -> struct(x AS source_a, y AS source_b))))"
        ).alias("pp")
    )
    return (
        arr.select(F.explode("pp").alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "embedding_winsorized_stats",
    oracle=f"""
WITH x0 AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS x
  FROM embeddings
), x AS (
  -- NULL elements are excluded EXPLICITLY on both sides: the rank
  -- formulation orders rows, and Spark's row_number puts NULLs first
  -- while DuckDB's puts them last — a silent divergence the old
  -- NULL-ignoring percentile aggregates never had
  SELECT dim, x FROM x0 WHERE x IS NOT NULL
), r AS (
  SELECT dim, x,
         ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY dim) AS n
  FROM x
), p AS (
  SELECT dim,
         MIN(CASE WHEN rn = (n + 99) // 100 THEN x END) AS p01,
         MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN x END) AS p99
  FROM r GROUP BY dim
)
SELECT x.dim, MIN(p.p01) AS p01, MIN(p.p99) AS p99,
       {sql_davg('LEAST(GREATEST(x.x, p.p01), p.p99)')} AS winsor_mean
FROM x JOIN p USING (dim)
GROUP BY x.dim
""",
    doc="per-dimension winsorized statistics of the embedding corpus "
    "(outlier-clipped feature normalization for downstream training): "
    "the 1st/99th percentile per dimension as TYPE-1 ORDER STATISTICS "
    "(rank ceil(p*n) via integer arithmetic, identical on both engines "
    "— the picked bounds are actual data values, so there is no "
    "interpolation arithmetic to diverge in the last ulp, unlike "
    "percentile()/quantile_cont whose interpolation formulas differ "
    "across engines), then the mean of values clipped to those bounds. "
    "Plan: inherently TWO passes (winsorizing needs the bounds first) "
    "— each shuffles (dim, x) pairs into d groups, the "
    "kmeans_lloyd_update key-space shape. Scale note: the exact rank "
    "holds the group's values (no map-side combine); at petabyte scale "
    "swap in percentile_approx — same plan, sketch-mergeable. The "
    "clipped mean uses the exact-decimal davg discipline.",
)
def embedding_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from duck_delta_share_spark.plans.registry import davg

    e = load_table(spark, sf_dir, "embeddings")
    x = (
        e.select(F.posexplode("embedding").alias("d", "xf"))
        .select(
            (F.col("d") + 1).cast("int").alias("dim"),
            F.col("xf").cast("double").alias("x"),
        )
        # NULL elements out before ranking (oracle comment: engines
        # disagree on NULL ordering; percentile aggs ignored them)
        .where(F.col("x").isNotNull())
    )
    wo = Window.partitionBy("dim").orderBy("x")
    wn = Window.partitionBy("dim")
    r = x.select(
        "dim",
        "x",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    p = r.groupBy("dim").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 99) DIV 100"), F.col("x"))
        ).alias("p01"),
        F.min(
            F.when(F.col("rn") == F.expr("(99 * n + 99) DIV 100"), F.col("x"))
        ).alias("p99"),
    )
    return (
        x.join(p, "dim")
        .select(
            "dim",
            "p01",
            "p99",
            F.least(F.greatest("x", F.col("p01")), F.col("p99")).alias("cl"),
        )
        .groupBy("dim")
        .agg(
            F.min("p01").alias("p01"),
            F.min("p99").alias("p99"),
            davg("cl").alias("winsor_mean"),
        )
    )


@query(
    "edit_distance_neardup",
    oracle=f"""
WITH p AS (
  SELECT doc_id, lang,
         substr({_NORM}, 1, 48) AS pre,
         split_part(substr({_NORM}, 1, 48), ' ', 1) AS t1,
         split_part(substr({_NORM}, 1, 48), ' ', 2) AS t2
  FROM documents WHERE text IS NOT NULL
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
FROM p a JOIN p b
  ON a.lang = b.lang AND a.t1 = b.t1 AND a.t2 = b.t2
     AND a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= 12
""",
    doc="edit-distance near-dup pairs (the title/short-text fuzzy-dedup "
    "pass MinHash misses: transposed words, small typos): Levenshtein "
    "over the normalized 48-char prefix, blocked on (lang, first TWO "
    "tokens), pairs at distance <= 12. Plan: ONE equi-join shuffle on "
    "the block key — the Levenshtein kernel runs only inside blocks, "
    "never all-pairs, and uses Spark's THRESHOLDED 3-arg form (banded "
    "DP, O(len*threshold) cells with early exit, measured 2.7x over "
    "the full O(len^2) table at sf0.1; -1 above the bound so `>= 0` IS "
    "the distance filter; unit-cost DP agrees exactly with DuckDB's, "
    "and the SELECT's re-evaluation touches only surviving pairs). "
    "Scale: blocking strength is THE lever for within-block quadratic "
    "cost — the single-token key measured a 149x blowup at 8x growth "
    "in the adversarial hot-first-token mode (scale_check edit_"
    "distance), while the two-token key keeps block sizes bounded "
    "(count grows, size doesn't) at an EMPIRICALLY IDENTICAL pair set "
    "on this corpus (79/79 at sf0.1: a <=12 edit over 48 chars rarely "
    "survives a changed second token); a production corpus adds a "
    "length band the same way. doc_id < doc_id halves the pair space; "
    "the join input is a narrow projection, so the self-derived "
    "lineage double-eval (CLAUDE.md) re-reads two pruned parquet "
    "columns, not the corpus.",
)
def edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edit_distance_core(load_table(spark, sf_dir, "documents"))


def edit_distance_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared by the registry query and
    scale_check so the measured scale factors can never drift from the
    shipped plan."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    pre = F.substring(norm, 1, 48)
    p = d.where(F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        pre.alias("pre"),
        F.split_part(pre, F.lit(" "), F.lit(1)).alias("t1"),
        F.split_part(pre, F.lit(" "), F.lit(2)).alias("t2"),
    )
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.t1") == F.col("b.t1"))
            & (F.col("a.t2") == F.col("b.t2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.levenshtein(F.col("a.pre"), F.col("b.pre"), 12) >= 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.pre"), F.col("b.pre"), 12)
            .cast("int")
            .alias("dist"),
        )
    )


@query(
    "skipgram_cooccurrence",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
  FROM toks
)
SELECT a.term AS term_a, b.term AS term_b,
       CAST(b.p - a.p AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 3
GROUP BY 1, 2, 3
ORDER BY cnt DESC, dist, term_a, term_b LIMIT 100
""",
    doc="skip-gram co-occurrence counts (the word2vec-style context "
    "statistics an embedding-training pipeline extracts): ordered term "
    "pairs at token distance 1-3, top-100 by count with a total "
    "deterministic tie-break. Plan: NO positional self-join — for each "
    "distance d the pair list is two shifted O(len) slices folded with "
    "ONE zip_with (the word_shingles shifted-arrays formulation, 4x "
    "over per-position HOFs), concatenated across d in a dedicated "
    "projection so the explode generates from an attribute (the r6 "
    "per-exploded-row re-evaluation trap); then one hash agg on the "
    "(term_a, term_b, dist) key — bounded by vocab^2 x 3 regardless of "
    "corpus size — and a distributed TakeOrdered top-100. The DuckDB "
    "oracle cross-checks the shifted-slice generator against the "
    "textbook positional self-join.",
)
def skipgram_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skipgram_core(load_table(spark, sf_dir, "documents"))


def skipgram_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    toks = d.where(F.col("text").isNotNull()).select(
        F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks")
    )

    def pairs_at(dist: int):
        # factory pins `dist` (loop-closure late binding); zip_with
        # lambdas receive (left, right) — no transform index trap
        m = F.size("toks") - dist
        return F.when(
            F.size("toks") > dist,
            F.zip_with(
                F.slice("toks", 1, m),
                F.slice("toks", 1 + dist, m),
                lambda x, y: F.struct(
                    x.alias("term_a"),
                    y.alias("term_b"),
                    F.lit(dist).alias("dist"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<term_a:string,term_b:string,dist:int>>"
            )
        )

    arr = toks.select(
        F.concat(pairs_at(1), pairs_at(2), pairs_at(3)).alias("pairs")
    )
    return (
        arr.select(F.explode("pairs").alias("pr"))
        .groupBy(
            F.col("pr.term_a").alias("term_a"),
            F.col("pr.term_b").alias("term_b"),
            F.col("pr.dist").alias("dist"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "dist", "term_a", "term_b")
        .limit(100)
    )


@query(
    "source_term_lift",
    oracle="""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS term
  FROM documents WHERE text IS NOT NULL
), st AS (
  SELECT source, term, COUNT(*) AS c_st FROM toks GROUP BY 1, 2
), s AS (
  SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1
), t AS (
  SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1
), n AS (
  SELECT SUM(c_st) AS n_tot FROM st
), scored AS (
  SELECT st.source, st.term, st.c_st,
         CAST(st.c_st * n.n_tot AS DOUBLE)
           / CAST(s.n_s * t.c_t AS DOUBLE) AS lift
  FROM st JOIN s USING (source) JOIN t USING (term) CROSS JOIN n
  WHERE st.c_st >= 5
)
SELECT source, term, CAST(c_st AS BIGINT) AS c_st, lift
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY lift DESC, term) AS rk
  FROM scored
) WHERE rk <= 5
""",
    doc="distinctive-terms-per-source analysis (the domain-"
    "characterization report a corpus-mixing pass produces): term lift "
    "= P(term|source) / P(term), top-5 per source at support >= 5. "
    "Plan: ONE hash agg on (source, term); the per-source and per-term "
    "marginals fold FROM the count frame (never a second corpus scan); "
    "marginal joins are un-hinted — AQE broadcasts the bounded source "
    "table and a small vocabulary, shuffles a web-scale one; top-5 via "
    "a window over the already-aggregated (source, term) frame, "
    "partition-bounded by vocabulary not corpus. Numerics: lift is ONE "
    "division of two exact integer products (< 2^53 through sf1; a "
    "production corpus switches the products to decimal the way dsum "
    "does) — bit-identical, no rounding.",
)
def source_term_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_term_lift_core(load_table(spark, sf_dir, "documents"))


def source_term_lift_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    st = (
        d.where(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(
                F.filter(tokenize("text"), lambda t: t != F.lit(""))
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    t = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    n = st.agg(F.sum("c_st").alias("n_tot"))
    scored = (
        st.where(F.col("c_st") >= 5)
        .join(s, "source")
        .join(t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "c_st",
            (
                (F.col("c_st") * F.col("n_tot")).cast("double")
                / (F.col("n_s") * F.col("c_t")).cast("double")
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("lift").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("source", "term", "c_st", "lift")
    )


@query(
    "token_budget_selection",
    oracle="""
WITH d AS (
  SELECT source, doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> ''))
           AS tok_cnt
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT source, tok_cnt,
         SUM(tok_cnt) OVER (
           PARTITION BY source ORDER BY tok_cnt DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(tok_cnt) AS BIGINT) AS tokens_used
FROM c WHERE cum <= 5000
GROUP BY source
""",
    doc="token-budget selection (the per-domain quota cut a data-mixing "
    "recipe applies: greedily keep the longest documents per source "
    "until a 5k-token budget is spent): running token sum over docs "
    "ordered (tok_cnt DESC, doc_id), keep rows whose cumulative sum "
    "fits. Plan: ONE window shuffle keyed on source (running sum, "
    "deterministic total order), then a hash agg on the bounded source "
    "key. The window partition is per-source sequential by necessity — "
    "a greedy prefix is order-defined; at 100 TB the partition count "
    "is the source cardinality, and a skewed source bounds the pass at "
    "its own document count (same budget as any cumulative-quota op). "
    "All arithmetic is exact integers.",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_budget_core(load_table(spark, sf_dir, "documents"))


def token_budget_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    toks = d.where(F.col("text").isNotNull()).select(
        "source",
        "doc_id",
        F.size(
            F.filter(tokenize("text"), lambda t: t != F.lit(""))
        ).alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("tok_cnt").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum", F.sum("tok_cnt").over(w))
        .where(F.col("cum") <= 5000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("tok_cnt").alias("tokens_used"),
        )
    )


_HARDNEG_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
         {_DOT.format(a='q.embedding', b='b.embedding')}
         / (SQRT({_DOT.format(a='q.embedding', b='q.embedding')})
            * SQRT({_DOT.format(a='b.embedding', b='b.embedding')})) AS cosine
  FROM embeddings q
  JOIN embeddings b ON b.vec_id <> q.vec_id AND b.label <> q.label
  WHERE q.vec_id < 10
    AND {_DOT.format(a='q.embedding', b='q.embedding')} > 0
    AND {_DOT.format(a='b.embedding', b='b.embedding')} > 0
)
SELECT query_id, vec_id, cosine, rk FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


@query(
    "hard_negative_mining",
    oracle=_HARDNEG_ORACLE,
    doc="contrastive-training hard negatives: per query vector, the "
    "top-5 most-similar vectors with a DIFFERENT label — the "
    "retrieval-training data a dense-embedding pipeline mines "
    "(similar-but-wrong examples carry the gradient signal). Plan: "
    "identical shape to similarity_topk_exact (broadcast query set, "
    "map-side scoring, one window shuffle on query_id), with the label "
    "contrast folded into the broadcast-join condition (never a "
    "post-score filter that would widen the window input); cosine is "
    "the same order-pinned double fold the oracle replays bit-exactly "
    "via list_reduce.",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        k=5,
        exact=False,
        contrast_col="label",
    )


@query(
    "dedup_cluster_histogram",
    oracle=f"""
WITH c AS (
  SELECT md5({_NORM}) AS fp, COUNT(*) AS sz
  FROM documents WHERE text IS NOT NULL
  GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM c GROUP BY sz
""",
    doc="dedup audit report: the duplicate-cluster size histogram (how "
    "many fingerprint clusters of each size, how many documents they "
    "hold) — the before/after evidence a dedup pass ships with (dedup "
    "ratio = 1 - n_clusters/n_docs falls out of the two sums). Plan: "
    "two hash aggs, the second over the already-reduced cluster frame "
    "(bounded by distinct-fingerprint count, then by the tiny size key) "
    "— no window, no join; the md5 fingerprint is the exact-dedup key "
    "functions/text.py:fingerprint uses, recomputed verbatim by the "
    "oracle.",
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_cluster_histogram_core(load_table(spark, sf_dir, "documents"))


def dedup_cluster_histogram_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    c = (
        d.where(F.col("text").isNotNull())
        .groupBy(fingerprint("text").alias("fp"))
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return c.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


@query(
    "conversion_lag_stats",
    oracle="""
WITH f AS (
  SELECT user_id,
         MIN(epoch_us(ts)) FILTER (event_type = 'view') AS v,
         MIN(epoch_us(ts)) FILTER (event_type = 'purchase') AS p
  FROM events GROUP BY user_id
), lag AS (
  SELECT p - v AS lag_us, CAST(p - v AS DOUBLE) / 1000000.0 AS lag_s
  FROM f
  WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
       CAST(MAX(lag_us) AS BIGINT) AS max_lag_us,
       floor(quantile_cont(lag_s, 0.5) * 1000000.0 + 0.5) / 1000000.0
         AS p50_lag_s,
       floor(quantile_cont(lag_s, 0.9) * 1000000.0 + 0.5) / 1000000.0
         AS p90_lag_s
FROM lag
""",
    doc="conversion-lag distribution (first view -> first purchase per "
    "user): the activation-latency report a growth pipeline computes. "
    "Plan: ONE hash agg keyed on user_id folds both firsts in the same "
    "pass (conditional MIN — never two scans or a self-join), then a "
    "single-row summary agg. min/max stay exact integer microseconds; "
    "the percentiles interpolate over SECONDS (magnitude ~1e5, ulp "
    "~1e-11) — at raw-microsecond magnitudes (~1e11) the engines' "
    "interpolation association differs by one ulp = 6e-5 (measured at "
    "sf0.01). Spark's percentile() and DuckDB's quantile_cont share "
    "the (n-1)*p linear-interpolation definition. The 6-decimal pin "
    "uses floor(x*1e6+0.5)/1e6 on BOTH engines (same IEEE op sequence; "
    "cos_e6/twap precedent) — round(x, 6) would diverge when a p50 "
    "midpoint of two lags an odd number of microseconds apart lands "
    "exactly on a 7th-decimal half boundary (r7 ADVICE).",
)
def conversion_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_lag_core(load_table(spark, sf_dir, "events"))


def conversion_lag_core(e: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p"),
    )
    lag = (
        f.where(
            F.col("v").isNotNull()
            & F.col("p").isNotNull()
            & (F.col("p") >= F.col("v"))
        )
        .select(
            (F.col("p") - F.col("v")).alias("lag_us"),
            (
                (F.col("p") - F.col("v")).cast("double") / F.lit(1000000.0)
            ).alias("lag_s"),
        )
    )
    return lag.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
        (
            F.floor(F.expr("percentile(lag_s, 0.5)") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("p50_lag_s"),
        (
            F.floor(F.expr("percentile(lag_s, 0.9)") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("p90_lag_s"),
    )


@query(
    "boilerplate_chunk_dedup",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), nz AS (
  SELECT doc_id, toks, CAST(ceil(len(toks) / 8.0) AS BIGINT) AS nch
  FROM t WHERE len(toks) > 0
), ch AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS chunk
  FROM nz, UNNEST(range(nch)) AS u(i)
), sc AS (
  SELECT doc_id, pos, chunk, COUNT(*) OVER (PARTITION BY chunk) AS df FROM ch
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COALESCE(SUM(CASE WHEN df <= 2 THEN 1 END), 0) AS BIGINT)
         AS n_kept,
       COALESCE(string_agg(CASE WHEN df <= 2 THEN chunk END, ' '
                           ORDER BY pos), '') AS clean_text
FROM sc GROUP BY doc_id
""",
    doc="chunk-level boilerplate removal (the CCNet/RefinedWeb line-dedup "
    "step, expressed over fixed 8-token chunks since the fixture corpus "
    "has no newlines): segment each document into consecutive chunks, "
    "drop any chunk whose CORPUS frequency exceeds 2 (headers, footers, "
    "navigation budgets repeat across pages; unique prose does not), "
    "reassemble the survivors in order. Plan: the chunk array "
    "materializes in its own projection BEFORE posexplode (an inline "
    "HOF next to a generator re-evaluates per exploded row — the 16x "
    "ngram_novelty trap), chunk frequency is ONE window keyed on the "
    "chunk text (carried-stats, no join-back), reassembly sorts the "
    "collected (pos, chunk) structs per doc. Zero-token docs drop out "
    "on both engines (UNNEST/posexplode of an empty list). At 100 TB "
    "the only wide op is the chunk-keyed window; chunk cardinality "
    "~ corpus tokens / 8, uniformly hash-partitioned.",
)
def boilerplate_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_chunk_dedup_core(load_table(spark, sf_dir, "documents"))


def boilerplate_chunk_dedup_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    toks = (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks"),
        )
        .where(F.size("toks") > 0)
    )
    nch = F.ceil(F.size("toks") / F.lit(8)).cast("int")

    def chunk_at(i):
        # two-arg transform lambdas receive (element, index); here the
        # sequence VALUE is the chunk index, so a 1-arg lambda is safe
        return F.concat_ws(" ", F.slice(F.col("toks"), i * 8 + 1, 8))

    # sequence(0, nch-1) is safe: the size("toks") > 0 filter above keeps
    # nch >= 1 (sequence counts DOWN when the bound is negative)
    carr = toks.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), nch - 1), chunk_at).alias("chunks"),
    )
    rows = carr.select("doc_id", F.posexplode("chunks").alias("pos", "chunk"))
    sc = rows.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("chunk"))
    )
    return sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.coalesce(
            F.sum((F.col("df") <= 2).cast("long")), F.lit(0)
        ).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("df") <= 2,
                            F.struct(F.col("pos"), F.col("chunk")),
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )


@query(
    "source_overlap_matrix",
    oracle="""
WITH t AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
), nz AS (
  SELECT source, toks, CAST(ceil(len(toks) / 8.0) AS BIGINT) AS nch
  FROM t WHERE len(toks) > 0
), fs AS (
  SELECT DISTINCT source,
         md5(array_to_string(toks[(i*8+1):(i*8+8)], ' ')) AS fp
  FROM nz, UNNEST(range(nch)) AS u(i)
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
""",
    doc="cross-source duplicate overlap matrix — the dedup-audit report "
    "that answers 'which corpus sources copy from each other' before "
    "choosing a canonical-source priority: for every source pair, the "
    "number of shared content fingerprints, at the SAME 8-token-chunk "
    "granularity boilerplate_chunk_dedup segments on (whole-doc "
    "fingerprints under-report cross-source copying — pages share "
    "passages, not full documents). Plan: distinct (chunk-fp, source) "
    "in one agg, then per-fingerprint SORTED source sets (bounded by "
    "source cardinality, not corpus size) expand to ordered pairs via "
    "an index-aware transform (the oracle uses the textbook fp "
    "self-join; the set expansion never shuffles pairs, only the tiny "
    "(src_a, src_b) key agg). NULL text/source excluded explicitly on "
    "both sides.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_overlap_matrix_core(load_table(spark, sf_dir, "documents"))


def source_overlap_matrix_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    toks = (
        d.where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "source",
            F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks"),
        )
        .where(F.size("toks") > 0)
    )
    nch = F.ceil(F.size("toks") / F.lit(8)).cast("int")

    def chunk_fp(i):
        return F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i * 8 + 1, 8)))

    carr = toks.select(
        "source",
        F.transform(F.sequence(F.lit(0), nch - 1), chunk_fp).alias("fps"),
    )
    fs = carr.select("source", F.explode("fps").alias("fp"))
    # collect_set dedups (source, fp) internally with a map-side partial
    # — a separate .distinct() before this groupBy paid a second
    # exchange for nothing (plan audit r8: 2 exchanges → 1)
    sets = (
        fs.groupBy("fp")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    # (element, index) two-arg transform: for each source at index i,
    # pair it with every LATER source (slice is 1-based; i is 0-based)
    pairs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


_SPLIT_BUCKET_SQL = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100"
)


@query(
    "split_kl_divergence",
    oracle=f"""
WITH sp AS (
  SELECT doc_id, lang, text,
         CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train' ELSE 'val' END
           AS split
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), tok AS (
  SELECT lang, split,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM sp
), c AS (
  SELECT lang, term,
         COUNT(*) FILTER (split = 'train') AS ct,
         COUNT(*) FILTER (split = 'val') AS cv
  FROM tok GROUP BY 1, 2
), tot AS (
  SELECT lang,
         SUM(ct) AS nt, SUM(cv) AS nv, COUNT(*) AS vocab
  FROM c GROUP BY 1
)
SELECT c.lang,
       CAST(MAX(tot.nt) AS BIGINT) AS n_train_tokens,
       CAST(MAX(tot.nv) AS BIGINT) AS n_val_tokens,
       CAST(SUM(CAST(floor(
         (CAST(cv + 1 AS DOUBLE) / CAST(nv + vocab AS DOUBLE))
         * ln((CAST(cv + 1 AS DOUBLE) / CAST(nv + vocab AS DOUBLE))
              / (CAST(ct + 1 AS DOUBLE) / CAST(nt + vocab AS DOUBLE)))
         * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS kl_e9
FROM c JOIN tot ON c.lang = tot.lang
GROUP BY c.lang
""",
    doc="train/val token-distribution shift per language: KL(val || "
    "train) over add-1-smoothed unigram distributions — the dataset-QA "
    "check that catches a skewed split or a domain leak before an "
    "expensive training run (a healthy random split has KL near 0; a "
    "topical leak spikes it). Split rule = the md5 bucket "
    "dataset_split_assign ships (bucket < 80 -> train). Numerics: each "
    "per-term KL contribution is the same op SEQUENCE on exact integer "
    "counts, pinned to an e9 integer via floor(x*1e9 + 0.5) and summed "
    "EXACTLY as integers — no float accumulation order anywhere (the r7 "
    "twap/cos_e6 discipline applied to a sum of logs). Residual risk: "
    "unlike sqrt, ln() is NOT IEEE-pinned — Spark's java.lang.Math.log "
    "(<=1 ulp) and DuckDB's libm log may differ in the last ulp, and "
    "the e9 floor cannot absorb a divergence landing exactly on a half "
    "boundary (same class as the FMA-contraction rule; never observed "
    "in fuzz — if it ever trips, widen the pin granularity or evaluate "
    "the log-argument ratio in a pinned rational form). Plan: "
    "one tokenize pass, one (lang, term, split) hash agg folded to "
    "(lang, term) via conditional counts, per-lang totals fold FROM the "
    "count frame, final tiny per-lang agg.",
)
def split_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_kl_divergence_core(load_table(spark, sf_dir, "documents"))


def split_kl_divergence_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    sp = d.where(F.col("text").isNotNull() & F.col("lang").isNotNull()).select(
        "lang",
        F.when(bucket < 80, F.lit("train")).otherwise(F.lit("val")).alias("split"),
        F.filter(tokenize("text"), lambda t: t != F.lit("")).alias("toks"),
    )
    tok = sp.select("lang", "split", F.explode("toks").alias("term"))
    c = tok.groupBy("lang", "term").agg(
        F.sum((F.col("split") == "train").cast("long")).alias("ct"),
        F.sum((F.col("split") == "val").cast("long")).alias("cv"),
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang")
    c2 = c.select(
        "lang",
        "ct",
        "cv",
        F.sum("ct").over(wl).alias("nt"),
        F.sum("cv").over(wl).alias("nv"),
        F.count(F.lit(1)).over(wl).alias("vocab"),
    )
    pv = (F.col("cv") + 1).cast("double") / (F.col("nv") + F.col("vocab")).cast(
        "double"
    )
    pt = (F.col("ct") + 1).cast("double") / (F.col("nt") + F.col("vocab")).cast(
        "double"
    )
    contrib = F.floor(pv * F.log(pv / pt) * F.lit(1000000000.0) + F.lit(0.5)).cast(
        "long"
    )
    return c2.groupBy("lang").agg(
        F.max("nt").alias("n_train_tokens"),
        F.max("nv").alias("n_val_tokens"),
        F.sum(contrib).alias("kl_e9"),
    )


@query(
    "minhash_recall_audit",
    oracle=f"""
WITH jsh AS (
  SELECT DISTINCT doc_id, lang, source, shingle FROM (
    SELECT doc_id, lang, source,
           UNNEST(LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1),
                  i -> ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents
  ) t
), jsizes AS (SELECT doc_id, COUNT(*) AS sz FROM jsh GROUP BY doc_id),
jinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS xn
  FROM jsh a
  JOIN jsh b ON a.lang = b.lang AND a.source = b.source
           AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b
  FROM jinter
  JOIN jsizes sa ON sa.doc_id = id_a
  JOIN jsizes sb ON sb.doc_id = id_b
  WHERE CAST(xn AS DOUBLE) / CAST(sa.sz + sb.sz - xn AS DOUBLE) > 0.15
),
msh AS (
  SELECT doc_id,
         LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
                        i -> ARRAY_TO_STRING(toks[i:i+2], ' ')) AS shingles
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
),
mhv AS (
  SELECT doc_id,
         LIST_TRANSFORM(shingles,
           s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM msh
),
msig AS (
  SELECT doc_id,
{_MD5_SIG_SQL}
  FROM mhv
),
mbands AS (
  SELECT doc_id, 0 AS band,
         md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket
  FROM msig
  UNION ALL SELECT doc_id, 1,
         md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM msig
  UNION ALL SELECT doc_id, 2,
         md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM msig
  UNION ALL SELECT doc_id, 3,
         md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM msig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mbands a
  JOIN mbands b ON a.band = b.band AND a.bucket = b.bucket
               AND a.doc_id < b.doc_id
),
j AS (
  SELECT CASE WHEN truth.id_a IS NOT NULL THEN 1 ELSE 0 END AS t,
         CASE WHEN cand.id_a IS NOT NULL THEN 1 ELSE 0 END AS c
  FROM truth FULL OUTER JOIN cand
    ON truth.id_a = cand.id_a AND truth.id_b = cand.id_b
)
SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
       CAST(SUM(c) AS BIGINT) AS n_candidates,
       CAST(SUM(t * c) AS BIGINT) AS n_hit,
       CASE WHEN SUM(t) > 0
            THEN CAST(floor(CAST(SUM(t * c) AS DOUBLE) * 1e6
                            / CAST(SUM(t) AS DOUBLE) + 0.5) AS BIGINT)
       END AS recall_e6
FROM j
""",
    doc="MinHash banding RECALL audit — the tuning report run on a "
    "sample BEFORE committing a (num_hashes, bands) choice to a 100 TB "
    "dedup: ground truth = the oracled exact 3-gram Jaccard pairs "
    "(threshold 0.15, (lang, source)-blocked), candidates = the oracled "
    "md5 Carter-Wegman LSH pipeline (8 hashes, 4 bands, distinct pairs, "
    "max_bucket_size=None — the audit must see the UNCAPPED banding the "
    "oracle computes, or big buckets silently understate recall); ONE "
    "full-outer join of the two pair lists folds "
    "(n_truth, n_candidates, n_hit, recall_e6) in a single agg — "
    "neither pipeline's lineage is evaluated twice (carried-flag "
    "shape). Empty truth -> NULL recall via lazy CASE (ANSI-total). "
    "Composes two independently hash-green pipelines, so a mismatch "
    "here isolates the composition, not the ingredients",
)
def minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_recall_audit_core(load_table(spark, sf_dir, "documents"))


def minhash_recall_audit_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    truth = dd.ngram_jaccard_pairs(
        d, block_cols=["lang", "source"], threshold=0.15, shingle_n=3
    ).select("id_a", "id_b", F.lit(1).alias("t"))
    sigs = dd.minhash_md5_signatures(d, num_hashes=8, shingle_n=3)
    # minhash_md5_lsh_pairs already groups to one row per pair.
    # max_bucket_size=None: this is the TUNING report, not the production
    # dedup — the DuckDB oracle's band-bucket self-join is uncapped, and a
    # capped audit would silently understate recall on a corpus with a
    # >2000-doc bucket (the CLAUDE.md silent-result-cliff pattern).
    cand = dd.minhash_md5_lsh_pairs(
        sigs, num_hashes=8, bands=4, max_bucket_size=None
    ).select("id_a", "id_b", F.lit(1).alias("c"))
    j = truth.join(cand, ["id_a", "id_b"], "full_outer")
    tt = F.when(F.col("t").isNotNull(), 1).otherwise(0)
    cc = F.when(F.col("c").isNotNull(), 1).otherwise(0)
    agg = j.agg(
        F.sum(tt).cast("long").alias("n_truth"),
        F.sum(cc).cast("long").alias("n_candidates"),
        F.sum(tt * cc).cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_truth",
        "n_candidates",
        "n_hit",
        F.when(
            F.col("n_truth") > 0,
            F.floor(
                F.col("n_hit").cast("double")
                * F.lit(1e6)
                / F.col("n_truth").cast("double")
                + F.lit(0.5)
            ).cast("long"),
        ).alias("recall_e6"),
    )


@query(
    "doclen_log2_histogram",
    oracle="""
WITH per AS (
  SELECT LENGTH(BIN(LEN(STRING_SPLIT(text, ' ')))) - 1 AS bucket,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS total_tokens
  FROM per GROUP BY bucket
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST((CAST(1 AS BIGINT) << bucket) AS BIGINT) AS lo_tokens,
       n_docs,
       total_tokens,
       CAST(SUM(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
       CAST(SUM(total_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
       CAST(floor(CAST(SUM(total_tokens) OVER (ORDER BY bucket) AS DOUBLE)
                  * 1e6 / CAST(SUM(total_tokens) OVER () AS DOUBLE) + 0.5)
            AS BIGINT) AS cum_token_share_e6
FROM g
""",
    doc="context-length planning histogram: docs and token mass per "
    "log2 length bucket with cumulative shares — the report behind a "
    "max_seq_len / packing-budget choice ('what fraction of tokens "
    "fits under 2^k?'). NUMERICS: the bucket is length(binary-string "
    "of n) - 1 (Spark conv / DuckDB bin) — exact integer floor(log2) "
    "on BOTH engines, deliberately NOT float log2 (JVM computes "
    "log(x)/ln2, which can land a hair under an exact power of two "
    "and floor into the wrong bucket on one engine only); shares are "
    "exact-integer ratios floor-pinned to e6. PLAN: one pruned scan "
    "-> tiny hash agg (<= 64 buckets) -> each bucket row explodes "
    "over the bounded target domain sequence(0,63) and a second tiny "
    "hash agg folds own/cumulative/grand-total stats per target "
    "(64x64 rows max at any corpus size) — two ordinary exchanges, "
    "NO window (the hazard sweep bans single-partition windows and "
    "this shape also measured a better 32x factor), no join, no "
    "driver collect",
)
def doclen_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doclen_log2_histogram_core(load_table(spark, sf_dir, "documents"))


def doclen_log2_histogram_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check.

    The cumulative sums deliberately avoid a single-partition window
    (the plan-hazard sweep forbids them, and rightly: textually they
    are indistinguishable from a data-sized whole-corpus sort).
    Instead each of the <= 64 bucket rows EXPLODES over the full
    bounded target domain and a second tiny hash agg folds, per
    target t: the bucket's own stats (bucket == t), the cumulative
    stats (bucket <= t) and the grand total (always) — 64x64 rows
    max at any corpus size, two ordinary exchanges, no window, no
    join, no driver collect."""
    per = d.where(F.col("text").isNotNull()).select(
        (
            F.length(F.conv(F.size(tokenize("text")).cast("string"), 10, 2)) - 1
        ).alias("bucket"),
        F.size(tokenize("text")).cast("long").alias("n"),
    )
    g = per.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n").alias("tt"),
    )
    b = F.col("bucket")
    t = F.col("t")
    e = g.select(
        "bucket", "nd", "tt",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("t"),
    )
    at = e.groupBy("t").agg(
        F.sum(F.when(b == t, F.col("nd"))).alias("own_docs"),
        F.sum(F.when(b == t, F.col("tt"))).alias("own_tokens"),
        F.sum(F.when(b <= t, F.col("nd"))).alias("cum_docs_raw"),
        F.sum(F.when(b <= t, F.col("tt"))).alias("cum_tokens_raw"),
        F.sum("tt").alias("all_tokens"),
    )
    return at.where(F.col("own_docs").isNotNull()).select(
        F.col("t").cast("int").alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), t)").alias("lo_tokens"),
        F.col("own_docs").cast("long").alias("n_docs"),
        F.col("own_tokens").cast("long").alias("total_tokens"),
        F.col("cum_docs_raw").cast("long").alias("cum_docs"),
        F.col("cum_tokens_raw").cast("long").alias("cum_tokens"),
        F.floor(
            F.col("cum_tokens_raw").cast("double")
            * F.lit(1e6)
            / F.col("all_tokens").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cum_token_share_e6"),
    )


@query(
    "split_leakage_audit",
    oracle="""
WITH h AS (
  SELECT md5(text) AS fp,
         ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
         ) % 100 AS bucket
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT fp,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM h
), g AS (
  SELECT fp,
         CAST(COUNT(*) AS BIGINT) AS n,
         MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
         MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS has_val,
         MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS has_test
  FROM s GROUP BY fp
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN has_train + has_val + has_test >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaky_fps,
       CAST(SUM(CASE WHEN has_train + has_val + has_test >= 2 THEN n ELSE 0 END)
            AS BIGINT) AS n_docs_in_leaky,
       CAST(SUM(CASE WHEN has_train = 1 AND has_test = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS train_test_leak_fps
FROM g
""",
    doc="split-contamination audit: after the md5-stable 80/10/10 "
    "assignment (dataset_split_assign's exact bucket rule), does any "
    "EXACT-duplicate document span two splits? Evaluation on a test "
    "set whose members also sit in train is invalid — this is the "
    "check a pretraining pipeline runs right after splitting. "
    "fingerprint = md5(text) (raw content — no lower(), sidestepping "
    "the locale-casing engine boundary); split membership folds to "
    "per-fingerprint has_train/has_val/has_test flags in ONE "
    "fingerprint-keyed hash agg, then a 1-row fold counts leaky "
    "fingerprints, leaked docs, and the critical train<->test pairs. "
    "All exact integers; NULL text excluded on both sides. Two "
    "combiner-friendly hash aggs — no joins, no windows, scale-safe "
    "at any corpus size",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_leakage_audit_core(load_table(spark, sf_dir, "documents"))


def split_leakage_audit_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    s = d.where(F.col("text").isNotNull()).select(
        F.md5("text").alias("fp"), split.alias("split")
    )
    g = s.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("has_train"),
        F.max(F.when(F.col("split") == "val", 1).otherwise(0)).alias("has_val"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("has_test"),
    )
    leaky = F.col("has_train") + F.col("has_val") + F.col("has_test") >= 2
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.when(leaky, 1).otherwise(0)).cast("long").alias("n_leaky_fps"),
        F.sum(F.when(leaky, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_docs_in_leaky"),
        F.sum(
            F.when((F.col("has_train") == 1) & (F.col("has_test") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("train_test_leak_fps"),
    )


_BUCKET4_SQL = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    " * 4096"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
    " * 256"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)"
    " * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1))"
    " % 100"
)


@query(
    "incremental_dedup_new_shard",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, source,
         md5({_NORM}) AS fp,
         {_BUCKET4_SQL} AS bucket
  FROM documents WHERE text IS NOT NULL
),
hist_kept AS (
  SELECT doc_id, lang, source, fp FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM d WHERE bucket < 70
  ) t WHERE rn = 1
),
shard_kept AS (
  SELECT doc_id, lang, source, fp FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM d WHERE bucket >= 70
  ) t WHERE rn = 1
),
survivors AS (
  SELECT * FROM shard_kept
  WHERE fp NOT IN (SELECT fp FROM hist_kept)
)
SELECT doc_id, lang, source, fp FROM hist_kept
UNION ALL
SELECT doc_id, lang, source, fp FROM survivors
ORDER BY doc_id
""",
    doc="incremental cross-snapshot dedup — the shape a 100 TB pipeline "
    "runs DAILY: a new shard is deduped against the accumulated corpus "
    "by anti-joining its fingerprints against a maintained Delta "
    "fingerprint STORE (32-hex md5 per corpus doc, ~0.05% of corpus "
    "bytes) — history is never rescanned; then survivors + their "
    "fingerprints are appended transactionally, exactly-once via "
    "SetTransaction (corpus first, store second — the replay-safe "
    "order; see operators/dedup.py incremental_dedup_commit). This "
    "query seeds history (md5(doc_id) buckets < 70), ingests the rest "
    "as the shard, crash-REPLAYS the same shard (must be a full no-op "
    "on both tables), and returns the final corpus JOINED to the "
    "store on doc_id — so the hash also pins corpus<->store "
    "consistency. Oracle = pure-SQL emulation of seed dedup + "
    "within-shard dedup + anti-join over the same md5-stable split",
)
def incremental_dedup_new_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import fingerprint
    from duck_delta_share_spark.operators.dedup import incremental_dedup_commit
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "lang", "source", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 70).drop("__bucket")
    shard = d.where(F.col("__bucket") >= 70).drop("__bucket")

    base = _scratch_dir("incdedup")
    corpus, store = base / "corpus", base / "fps"
    seed = dd.exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)

    r1 = incremental_dedup_commit(spark, shard, corpus, store, "loader", 1)
    # crash-replay of the SAME shard: must be a full no-op on both tables
    r2 = incremental_dedup_commit(spark, shard, corpus, store, "loader", 1)
    if r2["corpus_version"] is not None or r2["store_version"] is not None:
        raise AssertionError(f"shard replay was not a no-op: {r2}")
    if r1["corpus_version"] is None or r1["store_version"] is None:
        raise AssertionError(f"first ingest did not commit both tables: {r1}")

    final = read_delta(spark, corpus).select("doc_id", "lang", "source")
    fps = read_delta(spark, store)
    return (
        final.join(fps, "doc_id")
        .select("doc_id", "lang", "source", "fp")
        .orderBy("doc_id")
    )


@query(
    "incremental_neardup_new_shard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
                        i -> ARRAY_TO_STRING(toks[i:i+2], ' ')) AS shingles,
         CASE WHEN {_BUCKET4_SQL} < 70 THEN 'hist' ELSE 'shard' END AS side
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
),
hv AS (
  SELECT doc_id, side,
         LIST_TRANSFORM(shingles,
           s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, side,
{_MD5_SIG_SQL}
  FROM hv
),
bands AS (
  SELECT doc_id, side, 0 AS band,
         md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket
  FROM sig
  UNION ALL SELECT doc_id, side, 1,
         md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, side, 2,
         md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, side, 3,
         md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM sig
),
hist_cand AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
         GREATEST(a.doc_id, b.doc_id) AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands,
         'history' AS vs
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.side = 'shard' AND b.side = 'hist'
  GROUP BY 1, 2
),
shard_cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands,
         'shard' AS vs
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
  WHERE a.side = 'shard' AND b.side = 'shard'
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared_bands, vs FROM hist_cand
UNION ALL
SELECT id_a, id_b, n_shared_bands, vs FROM shard_cand
ORDER BY vs, id_a, id_b
""",
    doc="incremental cross-snapshot NEAR-dup — the MinHash twin of "
    "incremental_dedup_new_shard, and the other half of a daily 100 TB "
    "ingest (exact fingerprints miss boilerplate rewraps): the new "
    "shard's LSH band rows join the maintained Delta band-bucket STORE "
    "(bands x 32-hex chars per corpus doc, ~0.2% of corpus bytes) on "
    "(band, bucket) — history documents are never rescanned, candidate "
    "pairs only form inside shared buckets, and the shuffle key is the "
    "band hash (operators/dedup.py incremental_neardup_candidates). "
    "Output = vs-history candidates UNION within-shard candidates, both "
    "uncapped here so the oracle's band-bucket joins mirror exactly "
    "(production callers keep the documented max_bucket_size cap). "
    "Split = md5(doc_id) buckets <70 history / >=70 shard, the same "
    "md5-stable rule as the exact twin",
)
def incremental_neardup_new_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.dedup import (
        incremental_neardup_candidates,
        minhash_md5_band_rows,
    )
    from duck_delta_share_spark.sources.delta_log import write_delta

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 70).drop("__bucket")
    shard = d.where(F.col("__bucket") >= 70).drop("__bucket")

    store = _scratch_dir("incnd") / "buckets"
    hist_sigs = dd.minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(hist_sigs, num_hashes=8, bands=4), store)

    vs_hist = incremental_neardup_candidates(
        spark, shard, store, num_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=None,
    ).select(
        F.least("id_new", "id_old").alias("id_a"),
        F.greatest("id_new", "id_old").alias("id_b"),
        "n_shared_bands",
        F.lit("history").alias("vs"),
    )
    shard_sigs = dd.minhash_md5_signatures(shard, num_hashes=8, shingle_n=3)
    within = dd.minhash_md5_lsh_pairs(
        shard_sigs, num_hashes=8, bands=4, max_bucket_size=None
    ).select("id_a", "id_b", "n_shared_bands", F.lit("shard").alias("vs"))
    return vs_hist.unionByName(within).orderBy("vs", "id_a", "id_b")


@query(
    "incremental_neardup_pipeline",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
                        i -> ARRAY_TO_STRING(toks[i:i+2], ' ')) AS shingles,
         CASE WHEN {_BUCKET4_SQL} < 70 THEN 'hist' ELSE 'shard' END AS side
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
),
hv AS (
  SELECT doc_id, side,
         LIST_TRANSFORM(shingles,
           s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id, side,
{_MD5_SIG_SQL}
  FROM hv
),
bands AS (
  SELECT doc_id, side, 0 AS band,
         md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket
  FROM sig
  UNION ALL SELECT doc_id, side, 1,
         md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, side, 2,
         md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, side, 3,
         md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM sig
),
hist_cand AS (
  SELECT a.doc_id AS id_new, b.doc_id AS id_old,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands, 'history' AS vs
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id <> b.doc_id
  WHERE a.side = 'shard' AND b.side = 'hist'
  GROUP BY 1, 2
),
shard_cand AS (
  SELECT a.doc_id AS id_new, b.doc_id AS id_old,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands, 'shard' AS vs
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
  WHERE a.side = 'shard' AND b.side = 'shard'
  GROUP BY 1, 2
)
SELECT id_new, id_old, n_shared_bands, vs FROM hist_cand
UNION ALL
SELECT id_new, id_old, n_shared_bands, vs FROM shard_cand
ORDER BY vs, id_new, id_old
""",
    doc="the incremental near-dup pipeline's TRANSACTIONAL step, hash-"
    "checked through the persisted tables (operators/dedup.py "
    "incremental_neardup_commit): history band rows seed the Delta "
    "band-bucket store, one shard commits — candidate PAIRS appended "
    "first, the shard's band rows second, both under SetTransaction — "
    "then the SAME shard crash-REPLAYS (must be a full no-op on both "
    "tables, asserted in-query like the exact twin), and the result is "
    "read back FROM the pairs table, so the hash also pins the Delta "
    "round-trip + exactly-once semantics, not just the pair math. The "
    "oracle re-derives both pair kinds from first principles over the "
    "same md5-stable hist/shard split. Pairs-first commit order is the "
    "corpus-first rule: a crash between the commits replays against "
    "the UNCHANGED store (tests/test_streaming_incremental_neardup_r11"
    ".py drives the same wrapper from a real foreachBatch)",
)
def incremental_neardup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.operators.dedup import (
        incremental_neardup_commit,
        minhash_md5_band_rows,
    )
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 70).drop("__bucket")
    shard = d.where(F.col("__bucket") >= 70).drop("__bucket")

    base = _scratch_dir("incndp")
    pairs, store = base / "pairs", base / "bands"
    hist_sigs = dd.minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(hist_sigs, num_hashes=8, bands=4), store)

    r1 = incremental_neardup_commit(
        spark, shard, pairs, store, "ndloader", 1, max_bucket_size=None
    )
    r2 = incremental_neardup_commit(
        spark, shard, pairs, store, "ndloader", 1, max_bucket_size=None
    )
    if r2["pairs_version"] is not None or r2["store_version"] is not None:
        raise AssertionError(f"shard replay was not a no-op: {r2}")
    if r1["pairs_version"] is None or r1["store_version"] is None:
        raise AssertionError(f"first ingest did not commit both tables: {r1}")
    return read_delta(spark, pairs).orderBy("vs", "id_new", "id_old")


@query(
    "incremental_dedup_maintained",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, source,
         md5({_NORM}) AS fp,
         {_BUCKET4_SQL} AS bucket
  FROM documents WHERE text IS NOT NULL
),
hist_kept AS (
  SELECT doc_id, lang, source, fp FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM d WHERE bucket < 60
  ) t WHERE rn = 1
),
s1_kept AS (
  SELECT doc_id, lang, source, fp FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM d WHERE bucket >= 60 AND bucket < 80
  ) t WHERE rn = 1 AND fp NOT IN (SELECT fp FROM hist_kept)
),
s2_kept AS (
  SELECT doc_id, lang, source, fp FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM d WHERE bucket >= 80
  ) t WHERE rn = 1
    AND fp NOT IN (SELECT fp FROM hist_kept)
    AND fp NOT IN (SELECT fp FROM s1_kept)
)
SELECT doc_id, lang, source, fp FROM hist_kept
UNION ALL SELECT doc_id, lang, source, fp FROM s1_kept
UNION ALL SELECT doc_id, lang, source, fp FROM s2_kept
ORDER BY doc_id
""",
    doc="incremental exact dedup ACROSS a store-maintenance cycle, "
    "hash-checked: seed history, ingest shard 1, run the FULL "
    "maintenance policy on BOTH tables (operators/dedup.py "
    "maintain_dedup_store: OPTIMIZE compaction + log checkpoint + "
    "vacuum), ingest shard 2 against the MAINTAINED store, "
    "crash-replay shard 2 (in-query no-op assert), and return the "
    "final corpus joined to the store — so the oracle hash proves "
    "maintenance is RESULT-invisible (markers, fingerprints and "
    "survivors all survive compaction), not just crash-safe. The "
    "oracle emulates the sequential three-batch process (hist keep -> "
    "shard-1 anti-join -> shard-2 anti-join vs both) and never "
    "mentions maintenance — that is the point. Split = md5(doc_id) "
    "buckets <60 / 60-79 / >=80",
)
def incremental_dedup_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import fingerprint
    from duck_delta_share_spark.operators.dedup import (
        incremental_dedup_commit,
        maintain_dedup_store,
    )
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    d = d.select("doc_id", "lang", "source", "text", bucket.alias("__bucket"))
    hist = d.where(F.col("__bucket") < 60).drop("__bucket")
    s1 = d.where((F.col("__bucket") >= 60) & (F.col("__bucket") < 80)).drop(
        "__bucket"
    )
    s2 = d.where(F.col("__bucket") >= 80).drop("__bucket")

    base = _scratch_dir("incmaint")
    corpus, store = base / "corpus", base / "fps"
    seed = dd.exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)

    incremental_dedup_commit(spark, s1, corpus, store, "loader", 1)
    # full maintenance on both tables between the two ingests
    maintain_dedup_store(spark, store)
    maintain_dedup_store(spark, corpus)
    r1 = incremental_dedup_commit(spark, s2, corpus, store, "loader", 2)
    r2 = incremental_dedup_commit(spark, s2, corpus, store, "loader", 2)
    if r2["corpus_version"] is not None or r2["store_version"] is not None:
        raise AssertionError(f"shard-2 replay was not a no-op: {r2}")
    if r1["corpus_version"] is None or r1["store_version"] is None:
        raise AssertionError(f"post-maintenance ingest did not commit: {r1}")

    final = read_delta(spark, corpus).select("doc_id", "lang", "source")
    fps = read_delta(spark, store)
    return (
        final.join(fps, "doc_id")
        .select("doc_id", "lang", "source", "fp")
        .orderBy("doc_id")
    )


@query(
    "crawl_novelty_by_shard",
    oracle=f"""
WITH d AS (
  SELECT doc_id, md5(text) AS fp, ({_BUCKET4_SQL}) % 10 AS shard
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT shard,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY shard, doc_id) = 1
              THEN 1 ELSE 0 END AS first
  FROM d
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(first) AS BIGINT) AS n_first_instances,
       CAST(COUNT(*) - SUM(first) AS BIGINT) AS n_dup_docs,
       CAST(floor(CAST((COUNT(*) - SUM(first)) * 1000000 AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS dup_rate_e6
FROM r GROUP BY shard ORDER BY shard
""",
    doc="temporal corpus-novelty trend — the report behind crawl-dedup "
    "budgeting ('how fast is the incoming stream repeating itself?'): "
    "docs bucketed into 10 md5-stable arrival shards; per shard, how "
    "many docs are the FIRST instance of their exact fingerprint across "
    "the whole accumulated sequence (lowest (shard, doc_id) per "
    "md5(text) — raw content, no locale-casing hazard) vs repeats of "
    "earlier shards or earlier rows. PLAN: one fingerprint-KEYED window "
    "(hash-partitioned on fp — never single-partition) then one "
    "shard-keyed hash agg; dup_rate floor-pinned to e6 on "
    "exactly-representable integer-valued doubles (one IEEE divide, "
    "same on both engines). At 100 TB the window shuffles 16-byte "
    "fingerprints + two small ints per doc, never bodies",
)
def crawl_novelty_by_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crawl_novelty_by_shard_core(load_table(spark, sf_dir, "documents"))


def crawl_novelty_by_shard_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    ) % 10
    rows = d.where(F.col("text").isNotNull()).select(
        "doc_id", F.md5("text").alias("fp"), shard.alias("shard")
    )
    w = Window.partitionBy("fp").orderBy("shard", "doc_id")
    flagged = rows.select(
        "shard",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("first"),
    )
    g = flagged.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs_raw"),
        F.sum("first").alias("n_first_raw"),
    )
    return g.select(
        F.col("shard").cast("long").alias("shard"),
        F.col("n_docs_raw").cast("long").alias("n_docs"),
        F.col("n_first_raw").cast("long").alias("n_first_instances"),
        (F.col("n_docs_raw") - F.col("n_first_raw"))
        .cast("long")
        .alias("n_dup_docs"),
        F.floor(
            ((F.col("n_docs_raw") - F.col("n_first_raw")) * F.lit(1000000))
            .cast("double")
            / F.col("n_docs_raw").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dup_rate_e6"),
    ).orderBy("shard")


@query(
    "similarity_ann_ivf_persisted",
    oracle=_IVF_ORACLE,
    doc="PERSISTED-index IVF top-5 — the build-once/probe-many lifecycle "
    "a production ANN service runs (FAISS train→add→save on Delta): "
    "ivf_build_index writes the coarse quantizer and the inverted lists "
    "as Delta tables with the lists PARTITIONED BY cid (each hive "
    "partition IS an inverted list — probe-time partition pruning skips "
    "unprobed lists at the SCAN, enforced by layout, not a runtime "
    "filter); ivf_probe_index then searches WITHOUT touching the "
    "original corpus. Probing all lists is provably exact, so the whole "
    "persisted lifecycle — train, assign, write, prune, probe, rank — "
    "is hash-checked against brute force (the similarity_ann_ivf "
    "precedent); the production dial (n_probe < n_centroids) shares "
    "ivf_topk's recall tests since both paths share the same UDFs. "
    "Ranks only: numpy batch dots differ from the order-pinned fold in "
    "the last ulp (cannot flip ranks at this corpus's cosine gaps)",
)
def similarity_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    idx = _scratch_dir("ivfidx") / "index"
    sim.ivf_build_index(spark, e, idx, dim=64, n_centroids=32)
    return sim.ivf_probe_index(
        spark, e.filter(F.col("vec_id") < 10), idx, k=5, n_probe=32
    ).select("query_id", "vec_id", "rk")


@query(
    "doc_embedding_coverage",
    oracle="""
WITH d AS (SELECT doc_id FROM documents),
e AS (
  SELECT vec_id, LEN(embedding) AS dim,
         CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null
  FROM embeddings
),
j AS (
  SELECT d.doc_id, e.vec_id, e.dim
  FROM d FULL OUTER JOIN e ON d.doc_id = e.vec_id
)
SELECT CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(vec_id) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_unembedded,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_vectors,
       CAST(MIN(dim) AS BIGINT) AS dim_min,
       CAST(MAX(dim) AS BIGINT) AS dim_max,
       CAST((SELECT COUNT(*) FROM e WHERE is_null = 1) AS BIGINT)
         AS n_null_vectors
FROM j
""",
    doc="cross-table embedding-coverage audit — the pipeline health "
    "check run before any embedding-dependent stage (semantic dedup, "
    "ANN, clustering): every document should have exactly one vector "
    "and every vector a document. One full-outer join on the id (both "
    "sides project to the join key + a small int — at 100 TB this "
    "shuffles ids, never bodies or vectors) folded to a 1-row report: "
    "matched/unembedded/orphan counts, the dim range (a mixed-dimension "
    "corpus breaks every downstream matmul), and NULL-vector count. "
    "All exact integers",
)
def doc_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.when(F.col("embedding").isNull(), 1).otherwise(0).alias("is_null"),
    )
    # n_null_vectors is counted PRE-join (matching the oracle's unjoined
    # subquery): a duplicate doc_id matching a NULL-embedding vector
    # would fan the joined-row sum out but not the oracle's count
    # (whole-row-faithful rule — never assume fixture uniqueness).
    # count(when(...)) so an empty embeddings table yields 0, like the
    # oracle's COUNT(*). 1-row broadcast crossJoin (BNLJ-allowlisted).
    nulls = e.agg(
        F.count(F.when(F.col("is_null") == 1, 1))
        .cast("long")
        .alias("n_null_vectors")
    )
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    report = j.agg(
        F.count("doc_id").cast("long").alias("n_docs"),
        F.count("vec_id").cast("long").alias("n_vectors"),
        F.sum(
            F.when(F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
        F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_unembedded"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphan_vectors"),
        F.min(F.when(F.col("is_null") == 0, F.col("dim")))
        .cast("long")
        .alias("dim_min"),
        F.max(F.when(F.col("is_null") == 0, F.col("dim")))
        .cast("long")
        .alias("dim_max"),
    )
    return report.crossJoin(F.broadcast(nulls))


@query(
    "dedup_savings_by_source",
    oracle=f"""
WITH d AS (
  SELECT source,
         md5({_NORM}) AS fp,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
         doc_id
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT source, n_tokens,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
              THEN 1 ELSE 0 END AS keep
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_raw,
       CAST(SUM(keep) AS BIGINT) AS n_docs_kept,
       CAST(SUM(keep * n_tokens) AS BIGINT) AS n_tokens_kept,
       CAST(floor(CAST((SUM(n_tokens) - SUM(keep * n_tokens)) * 1000000 AS DOUBLE)
                  / CAST(GREATEST(SUM(n_tokens), 1) AS DOUBLE) + 0.5) AS BIGINT)
         AS token_savings_e6
FROM r GROUP BY source ORDER BY source
""",
    doc="dedup-savings accounting per source — the budgeting report that "
    "justifies (or kills) a dedup stage: raw vs post-exact-dedup doc and "
    "TOKEN counts per source, with the token savings rate. Keeps the "
    "exact_dedup keep rule verbatim (lowest doc_id per normalized "
    "fingerprint, corpus-GLOBAL — a doc whose duplicate lives in another "
    "source is charged to the source holding the copy). One "
    "fingerprint-keyed window (16-byte keys + one int shuffle) then one "
    "source-keyed hash agg; savings floor-pinned to e6 on "
    "exactly-representable integer-valued doubles. At 100 TB token "
    "counts ride the same shuffle rows — no second corpus pass",
)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_savings_by_source_core(load_table(spark, sf_dir, "documents"))


def dedup_savings_by_source_core(d: DataFrame) -> DataFrame:
    """Frame-parameterized core — shared with scale_check."""
    from pyspark.sql import Window

    from duck_delta_share_spark.functions.text import fingerprint, tokenize

    rows = d.where(F.col("text").isNotNull()).select(
        "source",
        "doc_id",
        fingerprint("text").alias("fp"),
        F.size(tokenize("text")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = rows.select(
        "source",
        "n_tokens",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("keep"),
    )
    g = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_raw"),
        F.sum("n_tokens").cast("long").alias("n_tokens_raw"),
        F.sum("keep").cast("long").alias("n_docs_kept"),
        F.sum(F.col("keep") * F.col("n_tokens"))
        .cast("long")
        .alias("n_tokens_kept"),
    )
    return g.select(
        "source",
        "n_docs_raw",
        "n_tokens_raw",
        "n_docs_kept",
        "n_tokens_kept",
        F.floor(
            ((F.col("n_tokens_raw") - F.col("n_tokens_kept")) * F.lit(1000000))
            .cast("double")
            # total division (r7 ANSI rule): a source whose non-null texts
            # all tokenize to zero tokens must yield 0, not DIVIDE_BY_ZERO.
            / F.greatest(F.col("n_tokens_raw"), F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("token_savings_e6"),
    ).orderBy("source")


_EST_MATCHES_SQL = " + ".join(
    f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(8)
)


@query(
    "minhash_estimator_error_audit",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
                        i -> ARRAY_TO_STRING(toks[i:i+2], ' ')) AS shingles
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
),
hv AS (
  SELECT doc_id,
         LIST_TRANSFORM(shingles,
           s -> CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM sh
),
sig AS (
  SELECT doc_id,
{_MD5_SIG_SQL}
  FROM hv
),
bands AS (
  SELECT doc_id, 0 AS band,
         md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket
  FROM sig
  UNION ALL SELECT doc_id, 1,
         md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, 2,
         md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM sig
  UNION ALL SELECT doc_id, 3,
         md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
),
dsh AS (
  SELECT DISTINCT doc_id, UNNEST(shingles) AS shingle FROM sh
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dsh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS xn
  FROM cand c
  JOIN dsh a ON a.doc_id = c.id_a
  JOIN dsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
ex AS (
  SELECT c.id_a, c.id_b,
         CAST(floor(CAST(COALESCE(i.xn, 0) * 1000000 AS DOUBLE)
                    / CAST(sa.sz + sb.sz - COALESCE(i.xn, 0) AS DOUBLE)
                    + 0.5) AS BIGINT) AS exact_e6
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)
SELECT ex.id_a, ex.id_b,
       CAST(({_EST_MATCHES_SQL}) * 125000 AS BIGINT) AS est_e6,
       ex.exact_e6,
       CAST(ABS(({_EST_MATCHES_SQL}) * 125000 - ex.exact_e6) AS BIGINT)
         AS abs_err_e6
FROM ex
JOIN sig sa ON sa.doc_id = ex.id_a
JOIN sig sb ON sb.doc_id = ex.id_b
ORDER BY ex.id_a, ex.id_b
""",
    doc="MinHash ESTIMATOR accuracy audit — the companion to "
    "minhash_recall_audit (that one tunes banding RECALL; this one "
    "answers 'can I trust the Jaccard estimates I will filter on at "
    "100 TB?'): for every LSH candidate pair, the 8-hash component-"
    "match estimate vs the EXACT 3-gram Jaccard, both as exact "
    "integers (matches/8 -> *125000 exact; exact Jaccard floor-pinned "
    "to e6) with the absolute error. Candidates UNCAPPED to mirror the "
    "oracle. PLAN: the signature table feeds the band self-join, the "
    "estimate join and the exact-intersection join — persist it "
    "(the materialize-the-signature-table step, tiny vs the corpus); "
    "exact intersections only computed FOR candidate pairs (never "
    "all-pairs), shingles join on (doc, shingle) keys",
)
def minhash_estimator_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.functions.text import tokenize, word_shingles

    d = load_table(spark, sf_dir, "documents")
    # the signature table feeds the band self-join AND both sides of the
    # estimate join: persist once (minhash_lsh_neardup precedent — the
    # standard materialize-the-signature-table step). LAZY localCheckpoint,
    # not .cache(): the returned frame is lazy so no in-function unpersist
    # is possible, and CacheManager entries leak for the session's
    # lifetime in a 217-query sweep — RDD-level blocks behind a local
    # checkpoint are freed by ContextCleaner once the frame is GC'd.
    sigs = dd.minhash_md5_signatures(d, num_hashes=8, shingle_n=3).localCheckpoint(
        eager=False
    )
    pairs = dd.minhash_md5_lsh_pairs(
        sigs, num_hashes=8, bands=4, max_bucket_size=None
    ).select("id_a", "id_b")
    est = dd.minhash_jaccard_estimate(
        sigs, pairs.withColumn("n_shared_bands", F.lit(1)), num_hashes=8
    ).select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard_est") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("est_e6"),
    )
    dsh = d.select(
        "doc_id", F.explode(word_shingles(tokenize("text"), 3)).alias("shingle")
    ).distinct()
    sizes = dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = dsh.withColumnRenamed("doc_id", "id_a")
    b = dsh.select(
        F.col("doc_id").alias("id_b"), F.col("shingle")
    )
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("xn"))
    )
    ex = (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "sa"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "sb"}), "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.floor(
                (F.coalesce(F.col("xn"), F.lit(0)) * F.lit(1000000))
                .cast("double")
                / (F.col("sa") + F.col("sb") - F.coalesce(F.col("xn"), F.lit(0)))
                .cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("exact_e6"),
        )
    )
    return (
        est.join(ex, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "est_e6",
            "exact_e6",
            F.abs(F.col("est_e6") - F.col("exact_e6")).alias("abs_err_e6"),
        )
        .orderBy("id_a", "id_b")
    )

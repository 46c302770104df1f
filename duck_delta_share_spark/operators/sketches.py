"""Bounded-memory sketches for corpus statistics at 100 TB.

``heavy_hitter_terms`` — EXACT frequent-terms via the two-pass distributed
Misra-Gries pattern:

1. Pass 1 (narrow, zero shuffle): each partition maintains a Misra-Gries
   summary with k = ceil(1/θ) counters over its token stream — O(k)
   memory regardless of partition size — and emits its surviving
   candidate terms plus its token count.
   Containment guarantee (standard MG argument): if an item had local
   frequency ≤ N_p/(k+1) in EVERY partition, its global count is
   ≤ N/(k+1) < θN — so every global θ-heavy hitter survives in at least
   one partition's summary. The union of candidates is complete.
2. Pass 2: exact recount of the (tiny) candidate set — broadcast semi
   join against the token stream, then an aggregation that shuffles only
   candidate rows — and the θN threshold filter.

Result: EXACT counts of exactly the terms with frequency ≥ θ·total, with
per-executor memory O(1/θ) instead of a full-vocabulary groupBy (whose
hash tables at web scale hold billions of keys). This is the classic
candidates-then-recount shape (MG: Misra & Gries 1982; distributed
merge bound: Berinde et al., PODS'09).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import tokenize


def misra_gries_candidates(
    tokens: DataFrame, term_col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries → (term, NULL) candidate rows
    plus one (NULL, n_tokens) meta row per batch stream; a narrow
    mapInPandas, no shuffle."""

    def mg(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            for t in pdf[term_col]:
                n += 1
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:  # decrement-all step; drop exhausted counters
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                term_col: list(counters.keys()) + [None],
                "__n": [0] * len(counters) + [n],
            }
        )

    return tokens.mapInPandas(mg, f"{term_col} string, __n long")


def heavy_hitter_terms(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 1 / 128,
) -> DataFrame:
    """All terms with frequency ≥ ``threshold`` of the corpus token count,
    with EXACT counts — (term, cnt, frac) sorted by count.

    ``threshold`` should be a binary-exact fraction (1/128, 1/256, ...)
    so the θ·N comparison is bit-identical across engines.
    """
    k = int(math.ceil(1.0 / threshold))
    spark = df.sparkSession
    toks = df.select(F.explode(tokenize(text_col)).alias("term"))
    # ONE action over the summary pass: total token count and the deduped
    # candidate set together (collect_set skips the NULL meta rows).  No
    # cache to pin or release, no second distinct+collect job — the
    # candidate set stays bounded by the per-partition MG guarantee
    # (≤ k counters each), and baking it as literals keeps the returned
    # lazy plan free of any reference to the summary pass.
    row = misra_gries_candidates(toks, "term", k).agg(
        F.sum("__n").alias("total"), F.collect_set("term").alias("cands")
    ).collect()[0]
    total = row["total"] or 0
    cand_terms = list(row["cands"] or [])
    candidates = spark.createDataFrame(
        [(t,) for t in cand_terms], "`term` STRING"
    )
    counts = (
        toks.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold) * F.lit(total))
    )
    return counts.select(
        "term",
        "cnt",
        F.round(F.col("cnt") / F.lit(total).cast("double"), 6).alias("frac"),
    ).orderBy(F.col("cnt").desc(), "term")

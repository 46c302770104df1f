"""Misra-Gries heavy hitters: exactness vs a full groupBy, containment
under adversarial partitioning, and bounded candidate volume."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.sketches import (
    heavy_hitter_terms,
    misra_gries_candidates,
)
from tests.conftest import SF_DIR


def _exact(df, threshold):
    from duck_delta_share_spark.functions.text import tokenize

    toks = df.select(F.explode(tokenize("text")).alias("term"))
    total = toks.count()
    return {
        (r.term, r.cnt)
        for r in toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold * total)
        .collect()
    }


def test_heavy_hitters_exact_on_documents(spark):
    d = load_table(spark, SF_DIR, "documents")
    got = {(r.term, r.cnt) for r in heavy_hitter_terms(d, threshold=1 / 128).collect()}
    assert got == _exact(d, 1 / 128) and len(got) > 0


def test_heavy_hitters_survive_adversarial_partitioning(spark):
    """The containment bound must hold however rows are partitioned: a
    term spread thinly across many partitions still surfaces as long as
    its GLOBAL frequency clears theta."""
    d = load_table(spark, SF_DIR, "documents").repartition(32, "doc_id")
    got = {(r.term, r.cnt) for r in heavy_hitter_terms(d, threshold=1 / 64).collect()}
    assert got == _exact(d, 1 / 64)


def test_candidate_volume_bounded(spark):
    """Pass-1 candidates per partition are capped by k counters — the
    whole point of the sketch (memory O(1/theta), not O(vocabulary))."""
    from duck_delta_share_spark.functions.text import tokenize

    d = load_table(spark, SF_DIR, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("term"))
    n_parts = toks.rdd.getNumPartitions()
    vocab = toks.distinct().count()
    k = max(4, vocab // 4)  # force k << vocabulary on the small fixture
    cands = misra_gries_candidates(toks, "term", k)
    n_candidates = cands.filter(F.col("term").isNotNull()).count()
    assert n_candidates <= k * n_parts
    assert n_candidates < vocab, "sketch emitted the whole vocabulary"


def test_streaming_twin_contains_all_batch_heavy_hitters(spark, tmp_path):
    """Every exact theta-heavy term (batch) must appear among the streaming
    MG candidates, and each shard's candidate set stays <= k."""
    from duck_delta_share_spark.streaming.heavy_hitters import heavy_hitters_stream
    from duck_delta_share_spark.streaming.pipeline import read_documents_stream

    theta = 1 / 64
    stream = heavy_hitters_stream(
        read_documents_stream(spark, SF_DIR), threshold=theta, n_shards=4
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_hh_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM t_hh_stream").collect()
    candidates = {r.term for r in rows}
    exact = {t for (t, _) in _exact(load_table(spark, SF_DIR, "documents"), theta)}
    assert exact and exact <= candidates

    import math
    k = math.ceil(1 / theta)
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, set()).add(r.term)
    assert all(len(terms) <= k for terms in per_shard.values())

    # lower bounds never exceed true counts
    truth = {t: c for (t, c) in _exact(load_table(spark, SF_DIR, "documents"), 0.0)}
    assert all(r.cnt_lower <= truth[r.term] for r in rows if r.term in truth)

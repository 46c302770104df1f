"""Round-6 query additions: bag-of-words fingerprint dedup, corpus n-gram
novelty, top-K-vocabulary OOV rate, retention cohorts. Semantics pinned on
hand-built corpora; physical plans pinned to the docstrings' scale claims
(oracle parity runs in the driver sweep / tests/parity harness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _plan(df) -> str:
    # simple mode: each operator appears ONCE, so .count() is a node count
    # (formatted mode repeats nodes in the detail blocks)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bag_fingerprint_catches_reordered_duplicates(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "fox brown quick the"),     # permutation of 1 -> same bag
            (3, "the quick brown foxes"),   # different multiset
            (4, "The  quick brown FOX "),   # normalization twin of 1
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {r.doc_id: (r.bag_fp, r.kept)
           for r in llm.bag_fingerprint_dedup(spark, SF_DIR).collect()}
    assert out[1][0] == out[2][0] == out[4][0] != out[3][0]
    assert out[1][1] == 1 and out[2][1] == 0 and out[4][1] == 0
    assert out[3][1] == 1


def test_bag_fingerprint_single_shuffle(spark):
    plan = _plan(QUERIES["bag_fingerprint_dedup"].spark_fn(spark, SF_DIR))
    assert plan.count("Exchange") == 1, "bag dedup must be one window shuffle"
    assert "Exchange SinglePartition" not in plan


def test_ngram_novelty_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    docs = spark.createDataFrame(
        [
            (1, "a b c"),    # grams: "a b", "b c"
            (2, "a b d"),    # grams: "a b", "b d"
            (3, "x y"),      # gram: "x y"
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {r.doc_id: r for r in llm.ngram_novelty_score(spark, SF_DIR).collect()}
    # "a b" df=2 (shared), "b c"/"b d"/"x y" df=1 (novel)
    assert (out[1].n_distinct_grams, out[1].novel_grams) == (2, 1)
    assert (out[2].n_distinct_grams, out[2].novel_grams) == (2, 1)
    assert (out[3].n_distinct_grams, out[3].novel_grams) == (1, 1)
    assert abs(out[1].novelty - 0.5) < 1e-9 and out[3].novelty == 1.0


def test_ngram_novelty_no_join_back(spark):
    # carried-stats shape: df via window over gram, re-agg by doc — two
    # exchanges, no join (a join back to the exploded frame would
    # evaluate the tokenize/explode lineage twice)
    plan = _plan(QUERIES["ngram_novelty_score"].spark_fn(spark, SF_DIR))
    assert plan.count("Exchange") == 2
    assert "Join" not in plan
    # the generator input must be a MATERIALIZED attribute, not the
    # inline HOF pipeline: interpreted higher-order expressions in the
    # post-Generate projection re-evaluate per exploded row (measured
    # 16x at sf0.1)
    import re

    m = re.search(r"Generate explode\((\w+)", plan)
    assert m and m.group(1).startswith("__grams"), plan[:400]


def test_oov_rate_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    monkeypatch.setattr(llm, "_OOV_K", 2)
    # corpus counts: a=4, b=3, c=2, d=1 -> top-2 vocab {a, b}
    docs = spark.createDataFrame(
        [
            (1, "a a b c"),
            (2, "a b c d"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {r.doc_id: r for r in llm.oov_rate_topk_vocab(spark, SF_DIR).collect()}
    assert (out[1].n_tokens, out[1].oov_tokens) == (4, 1)   # c
    assert (out[2].n_tokens, out[2].oov_tokens) == (4, 2)   # c, d
    assert (out[3].n_tokens, out[3].oov_tokens) == (2, 0)


def test_oov_vocab_broadcasts(spark):
    plan = _plan(QUERIES["oov_rate_topk_vocab"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "K-row vocab must broadcast"
    assert "SortMergeJoin" not in plan


def test_retention_cohorts_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.functions_sweep as fs

    rows = [
        # user 1: first seen Mon 2024-01-01 week, active weeks 0 and 1
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        # user 2: same cohort, only week 0
        (2, "2024-01-03 09:00:00"),
        # user 3: cohort of 2024-01-08, active weeks 0 and 2
        (3, "2024-01-10 08:00:00"),
        (3, "2024-01-22 08:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    monkeypatch.setattr(fs, "load_table", lambda s, d, t: ev)
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in fs.retention_cohorts(spark, SF_DIR).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert out[("2024-01-08", 2)] == 1
    assert ("2024-01-08", 1) not in out


def test_phrase_match_semantics_overlap_safe(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    monkeypatch.setattr(llm, "_PHRASE", ("a", "a"))
    docs = spark.createDataFrame(
        [
            (1, "a a a"),        # overlapping: positions 0 and 1 -> 2
            (2, "a b a a"),      # one match
            (3, "b c d"),        # none -> filtered out
            (4, "a"),            # below phrase length -> filtered out
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {r.doc_id: r.n_matches
           for r in llm.phrase_match_positional(spark, SF_DIR).collect()}
    assert out == {1: 2, 2: 1}


def test_phrase_match_zero_shuffle(spark):
    plan = _plan(QUERIES["phrase_match_positional"].spark_fn(spark, SF_DIR))
    assert "Exchange" not in plan, "phrase match must be a pure projection"
    assert "Join" not in plan

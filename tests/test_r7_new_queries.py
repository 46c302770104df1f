"""Round-7 query additions: edit-distance near-dup (blocked Levenshtein),
skip-gram co-occurrence, per-source term lift, token-budget selection,
event debounce dedup, daily-volume anomaly. Semantics pinned on hand-built
corpora; physical plans pinned to the docstrings' scale claims (oracle
parity runs in the driver sweep / tests/parity harness)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_edit_distance_blocking_and_threshold(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "alpha beta gamma delth", "en"),   # dist 1 from 1
            (3, "alpha beta different words here etc", "en"),  # same block
            (4, "alpha beta gamma delta", "fr"),   # other lang: other block
            (5, "omega beta gamma delta", "en"),   # other first token
        ],
        "doc_id long, text string, lang string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {
        (r.doc_a, r.doc_b): r.dist
        for r in llm.edit_distance_neardup(spark, SF_DIR).collect()
    }
    assert out == {(1, 2): 1}, out  # 3 exceeds 12; 4/5 land in other blocks


def test_edit_distance_single_equi_join_no_cartesian(spark):
    plan = _plan(QUERIES["edit_distance_neardup"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # blocked equi-join: the Levenshtein kernel must sit on a hash join
    assert "Join" in plan


def test_skipgram_semantics_distances_and_order(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    rows = llm.skipgram_cooccurrence(spark, SF_DIR).collect()
    got = {(r.term_a, r.term_b, r.dist): r.cnt for r in rows}
    # doc1: d1 pairs (a,b)(b,c)(c,d); d2 (a,c)(b,d); d3 (a,d); doc2: (a,b)
    assert got[("a", "b", 1)] == 2
    assert got[("b", "c", 1)] == 1 and got[("c", "d", 1)] == 1
    assert got[("a", "c", 2)] == 1 and got[("b", "d", 2)] == 1
    assert got[("a", "d", 3)] == 1
    assert len(got) == 6  # single-token doc emits nothing
    # top-100 ordering: cnt desc, then dist/term tie-break
    assert (rows[0].term_a, rows[0].term_b, rows[0].dist) == ("a", "b", 1)


def test_skipgram_explodes_an_attribute(spark):
    # the pair array must be materialized in its own projection: explode
    # over the raw HOF expression re-evaluates it per output row (r6)
    df = QUERIES["skipgram_cooccurrence"].spark_fn(spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    m = re.search(r"Generate explode\(([^)]*)", opt)
    assert m, opt
    # an attribute renders as `name#id`; any '(' means an inline
    # expression that would re-evaluate per exploded row (r6, 16x)
    assert "(" not in m.group(1), f"explode child must be an attribute: {m.group(0)}"


def test_source_term_lift_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    # srcA: 10x "x", 5x "y"; srcB: 5x "y", 10x "z" -> lift(x|A) highest
    docs = spark.createDataFrame(
        [
            (1, " ".join(["x"] * 10 + ["y"] * 5), "A"),
            (2, " ".join(["y"] * 5 + ["z"] * 10), "B"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {
        (r.source, r.term): (r.c_st, r.lift)
        for r in llm.source_term_lift(spark, SF_DIR).collect()
    }
    # lift(x|A) = (10 * 30) / (15 * 10) = 2.0; lift(y|A) = (5*30)/(15*10)=1.0
    assert out[("A", "x")] == (10, 2.0)
    assert out[("A", "y")] == (5, 1.0)
    assert out[("B", "z")] == (10, 2.0)
    assert ("A", "z") not in out  # c_st = 0: never a candidate


def test_token_budget_selection_greedy_prefix(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    # src A docs with token counts 3000, 2000, 1500, 100:
    # greedy longest-first under 5000 keeps 3000 + 2000 and STOPS (1500
    # would push cum to 6500; 100 after it is also past the prefix cut)
    def doc(doc_id, n, src):
        return (doc_id, " ".join(["t"] * n), src)

    docs = spark.createDataFrame(
        [doc(1, 3000, "A"), doc(2, 2000, "A"), doc(3, 1500, "A"),
         doc(4, 100, "A"), doc(5, 400, "B")],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {
        r.source: (r.n_selected, r.tokens_used)
        for r in llm.token_budget_selection(spark, SF_DIR).collect()
    }
    assert out["A"] == (2, 5000)
    assert out["B"] == (1, 400)


def test_event_debounce_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.functions_sweep as fs

    T = pd.Timestamp
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "ts": [
                    T("2024-01-01 10:00:00"),
                    T("2024-01-01 10:05:00"),  # same user+type, 5m: dup
                    T("2024-01-01 10:20:00"),  # 15m after previous: kept
                    T("2024-01-01 10:01:00"),  # other type: kept
                    T("2024-01-01 10:02:00"),  # other user: kept
                ],
                "user_id": [1, 1, 1, 1, 2],
                "event_type": ["click", "click", "click", "view", "click"],
            }
        )
    )
    monkeypatch.setattr(fs, "load_table", lambda s, d, t: events)
    out = {
        r.event_type: (r.kept, r.dropped)
        for r in fs.event_debounce_dedup(spark, SF_DIR).collect()
    }
    assert out["click"] == (3, 1)
    assert out["view"] == (1, 0)


def test_event_volume_anomaly_exact_moments(spark, monkeypatch):
    import math

    import duck_delta_share_spark.plans.functions_sweep as fs

    T = pd.Timestamp
    # one type, three days with counts 1, 2, 3: mean 2, var 1, std 1
    rows = []
    eid = 0
    for day, n in [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)]:
        for i in range(n):
            rows.append((eid, T(f"{day} 10:0{i}:00"), 1, "click"))
            eid += 1
    events = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    )
    monkeypatch.setattr(fs, "load_table", lambda s, d, t: events)
    out = {
        r.day: (r.cnt, r.z)
        for r in fs.event_volume_anomaly(spark, SF_DIR).collect()
    }
    assert out["2024-01-01"] == (1, -1.0)
    assert out["2024-01-02"] == (2, 0.0)
    assert out["2024-01-03"] == (3, 1.0)
    assert all(isinstance(d, str) for d in out), "day must be STRING-typed"


def test_anomaly_stats_join_broadcasts(spark):
    plan = _plan(QUERIES["event_volume_anomaly"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "per-type stats must broadcast"


def test_budget_and_debounce_single_shuffle_before_agg(spark):
    for name in ("token_budget_selection", "event_debounce_dedup"):
        plan = _plan(QUERIES[name].spark_fn(spark, SF_DIR))
        assert "Exchange SinglePartition" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_anomaly_zero_variance_yields_null_not_throw(spark, monkeypatch):
    # a type with EQUAL counts every day has zero variance: the unguarded
    # division THROWS under Spark 4 ANSI and DuckDB returns NaN — the
    # guard must yield NULL on both engines (r7 self-review)
    import duckdb

    import duck_delta_share_spark.plans.functions_sweep as fs
    from duck_delta_share_spark.plans import QUERIES

    T = pd.Timestamp
    rows = [
        (1, T("2024-01-01 10:00:00"), 1, "flat"),
        (2, T("2024-01-02 10:00:00"), 1, "flat"),
        (3, T("2024-01-01 10:00:00"), 1, "vary"),
        (4, T("2024-01-02 10:00:00"), 1, "vary"),
        (5, T("2024-01-02 11:00:00"), 1, "vary"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    events = spark.createDataFrame(pdf)
    monkeypatch.setattr(fs, "load_table", lambda s, d, t: events)
    out = {
        (r.event_type, r.day): r.z
        for r in fs.event_volume_anomaly(spark, SF_DIR).collect()
    }
    assert out[("flat", "2024-01-01")] is None
    assert out[("flat", "2024-01-02")] is None
    # counts 1, 2: mean 1.5, sample std sqrt(0.5) -> z = -/+0.707106781
    assert out[("vary", "2024-01-01")] == -0.707106781
    assert out[("vary", "2024-01-02")] == 0.707106781
    # and the ORACLE agrees on the same degenerate input
    con = duckdb.connect()
    con.register("events", pdf)
    odf = con.execute(QUERIES["event_volume_anomaly"].oracle).df()
    orc = {(r.event_type, r.day): r.z for r in odf.itertuples()}
    import math

    assert math.isnan(orc[("flat", "2024-01-01")]) or orc[("flat", "2024-01-01")] is None


def test_hard_negative_mining_excludes_same_label(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    # query 0 (label 0): nearest is the near-identical SAME-label vec 1,
    # which must be excluded; the top hard negative is the similar
    # DIFFERENT-label vec 2, then the orthogonal-ish vec 3
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.99, 0.1, 0.0], 0),    # same label: never a candidate
            (2, [0.9, 0.4, 0.0], 1),     # best hard negative
            (3, [0.0, 1.0, 0.0], 1),
            (4, [0.0, 0.0, 0.0], 1),     # zero norm: skipped
        ],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: emb)
    rows = llm.hard_negative_mining(spark, SF_DIR).collect()
    got = [(r.query_id, r.vec_id, r.rk) for r in rows if r.query_id == 0]
    assert (0, 1, 1) not in got and all(v != 1 for _, v, _ in got)
    assert (0, 2, 1) in got and (0, 3, 2) in got
    assert all(v != 4 for _, v, _ in got), "zero-norm vector must be skipped"


def test_dedup_cluster_histogram_counts(spark, monkeypatch):
    import duck_delta_share_spark.plans.llm_ops as llm

    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "A  b C"),   # normalization twin of 1
            (3, "a b c "),   # trim twin of 1
            (4, "d e"),
            (5, "d e"),
            (6, "unique"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: docs)
    out = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in llm.dedup_cluster_histogram(spark, SF_DIR).collect()
    }
    assert out == {3: (1, 3), 2: (1, 2), 1: (1, 1)}


def test_conversion_lag_semantics(spark, monkeypatch):
    import duck_delta_share_spark.plans.functions_sweep  # noqa: F401
    import duck_delta_share_spark.plans.llm_ops as llm

    T = pd.Timestamp
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": [
                    T("2024-01-01 10:00:00"),  # u1 view
                    T("2024-01-01 10:00:10"),  # u1 purchase: lag 10s
                    T("2024-01-01 09:00:00"),  # u2 purchase BEFORE view
                    T("2024-01-01 10:00:00"),  # u2 view (p < v: excluded)
                    T("2024-01-01 10:00:00"),  # u3 view only (excluded)
                    T("2024-01-01 10:00:00"),  # u4 view
                    T("2024-01-01 10:00:30"),  # u4 purchase: lag 30s
                ],
                "user_id": [1, 1, 2, 2, 3, 4, 4],
                "event_type": [
                    "view", "purchase", "purchase", "view", "view",
                    "view", "purchase",
                ],
            }
        )
    )
    monkeypatch.setattr(llm, "load_table", lambda s, d, t: events)
    r = llm.conversion_lag_stats(spark, SF_DIR).collect()[0]
    assert r.n_users == 2
    assert r.min_lag_us == 10_000_000 and r.max_lag_us == 30_000_000
    assert r.p50_lag_s == 20.0  # interpolated midpoint of {10, 30}
    assert abs(r.p90_lag_s - 28.0) < 1e-9  # 10 + 0.9 * 20

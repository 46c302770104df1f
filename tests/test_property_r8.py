"""Hypothesis property tests for the three late-r7 operators (the six
earlier r7 ops got theirs in test_property_r7.py): hard-negative mining's
contrast-in-join-condition, dedup_cluster_histogram's two-stage
aggregation, and conversion_lag_stats' conditional-MIN folding — each
pinned against a from-first-principles Python reference on corpora the
fixtures never produce (NULL labels, all-NULL users, zero-norm vectors,
purchase-before-view users, single-event users).
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import os

_SETTINGS = dict(
    # 10 keeps the suite fast; HYP_MAX_EXAMPLES=200 for the deep local
    # sweep each operator got before registration
    max_examples=int(os.environ.get("HYP_MAX_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# small integer grid keeps dot products exact while the float fold stays
# the interesting part; includes the zero vector (must be excluded on
# both sides, never ranked)
_VEC = st.lists(
    st.integers(-3, 3).map(float), min_size=3, max_size=3
)
_LABEL = st.sampled_from(["a", "b", "c", None])


@given(rows=st.lists(st.tuples(_VEC, _LABEL), min_size=2, max_size=14))
@settings(**_SETTINGS)
def test_hard_negative_mining_matches_reference(spark, rows):
    """brute_force_topk(contrast_col=...) vs a bit-exact Python replay:
    dot_fast is a left fold from 0.0 over float64 products, so a plain
    accumulation loop reproduces the cosine to the last ulp — ranks and
    values must match exactly. Contrast uses SQL <> (NULL labels never
    match, so a NULL-labeled query has NO candidates and vice versa)."""
    from duck_delta_share_spark.operators.similarity import brute_force_topk

    data = [(i, v, lab) for i, (v, lab) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label string"
    )
    k = 3
    got = {
        (r.query_id, r.rk): (r.vec_id, r.cosine)
        for r in brute_force_topk(
            df,
            df.filter("vec_id < 4"),
            k=k,
            exact=False,
            contrast_col="label",
        ).collect()
    }

    def fold_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    want = {}
    for qid, qv, qlab in data[: min(4, len(data))]:
        qn = math.sqrt(fold_dot(qv, qv))
        if qn <= 0 or qlab is None:
            continue  # zero-norm query / NULL label: no candidates
        cands = []
        for bid, bv, blab in data:
            bn = math.sqrt(fold_dot(bv, bv))
            if bid == qid or bn <= 0 or blab is None or blab == qlab:
                continue
            cands.append((fold_dot(qv, bv) / (qn * bn), bid))
        cands.sort(key=lambda c: (-c[0], c[1]))
        for rk, (cos, bid) in enumerate(cands[:k], 1):
            want[(qid, rk)] = (bid, cos)
    assert got == want


_TXT = st.one_of(
    st.none(),
    st.text(alphabet=" abcdeXY.,", min_size=0, max_size=24),
)


@given(texts=st.lists(_TXT, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_dedup_cluster_histogram_matches_reference(spark, texts):
    """Two-stage aggregation vs a Counter-of-Counters reference; the
    fingerprint normalization (lower → trim → collapse space runs) is
    replayed in Python. ASCII-only corpus: Spark's Java casing and
    Python's str.lower agree outside locale-special codepoints
    (tests/test_unicode_semantics_r6.py pins that boundary)."""
    from pyspark.sql import functions as F

    from duck_delta_share_spark.functions.text import fingerprint

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    c = (
        df.where(F.col("text").isNotNull())
        .groupBy(fingerprint("text").alias("fp"))
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in c.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
        )
        .collect()
    }

    clusters: dict[str, int] = {}
    for t in texts:
        if t is None:
            continue
        key = re.sub(" +", " ", t.lower().strip(" "))
        clusters[key] = clusters.get(key, 0) + 1
    want: dict[int, list[int]] = {}
    for sz in clusters.values():
        want.setdefault(sz, [0, 0])
        want[sz][0] += 1
        want[sz][1] += sz
    assert got == {sz: tuple(v) for sz, v in want.items()}


_EVT = st.tuples(
    st.integers(0, 4),  # user
    st.sampled_from(["view", "purchase", "click"]),
    st.integers(0, 10_000_000),  # offset in MICROseconds (odd deltas ok)
)


@given(events=st.lists(_EVT, min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_conversion_lag_stats_matches_reference(spark, events):
    """Conditional-MIN folding vs an explicit per-user scan: first view,
    first purchase, lag filter (both present, p >= v), exact integer
    min/max, interpolated percentiles compared at 1e-6 (the Python
    interpolation may differ from Spark's in the last ulp; the engine
    pair itself is pinned by the floor discipline, not this test)."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    rows = [
        (i, pd.Timestamp((base + off) * 1000), u, et, 1.0)
        for i, (u, et, off) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df = spark.createDataFrame(pdf)

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = df.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p"),
    )
    lag = f.where(
        F.col("v").isNotNull()
        & F.col("p").isNotNull()
        & (F.col("p") >= F.col("v"))
    ).select(
        (F.col("p") - F.col("v")).alias("lag_us"),
        ((F.col("p") - F.col("v")).cast("double") / F.lit(1000000.0)).alias(
            "lag_s"
        ),
    )
    got = lag.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
        (F.floor(F.expr("percentile(lag_s, 0.5)") * 1e6 + F.lit(0.5)) / 1e6).alias("p50"),
        (F.floor(F.expr("percentile(lag_s, 0.9)") * 1e6 + F.lit(0.5)) / 1e6).alias("p90"),
    ).collect()[0]

    firsts: dict[int, dict[str, int]] = {}
    for i, (u, et, off) in enumerate(events):
        d = firsts.setdefault(u, {})
        if et in ("view", "purchase"):
            d[et] = min(d.get(et, off), off)
    lags = sorted(
        d["purchase"] - d["view"]
        for d in firsts.values()
        if "view" in d and "purchase" in d and d["purchase"] >= d["view"]
    )
    if not lags:
        assert got.n_users == 0 and got.min_lag_us is None
        return

    def pctl(xs, p):
        idx = (len(xs) - 1) * p
        lo = int(math.floor(idx))
        hi = min(lo + 1, len(xs) - 1)
        return xs[lo] + (idx - lo) * (xs[hi] - xs[lo])

    lags_s = [x / 1000000.0 for x in lags]
    assert got.n_users == len(lags)
    assert got.min_lag_us == lags[0] and got.max_lag_us == lags[-1]
    assert abs(got.p50 - pctl(lags_s, 0.5)) <= 2e-6
    assert abs(got.p90 - pctl(lags_s, 0.9)) <= 2e-6

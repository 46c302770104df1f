"""Property test: the funnel_stages packed-integer fold vs a plain-Python
reference stage machine on random event streams (hypothesis drives the
sequences; any divergence in ordering/deadline/encoding logic fails
here before the oracle can bless a coincidentally-matching fixture)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

WINDOW_US = 86_400_000_000
CODE = {"view": 1, "click": 2, "purchase": 3}


def _reference(events):
    """(ts_us, type) list -> final stage, the obvious sequential walk."""
    enc = sorted(ts * 8 + CODE[t] for ts, t in events)
    stage, last_ts = 0, 0
    for v in enc:
        ts, code = v // 8, v % 8
        if stage == 0 and code == 1:
            stage, last_ts = 1, ts
        elif stage in (1, 2) and code == stage + 1 and ts - last_ts <= WINDOW_US:
            stage, last_ts = stage + 1, ts
    return stage


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # user
            st.integers(min_value=0, max_value=4 * WINDOW_US),  # ts_us
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_funnel_fold_matches_reference(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(u, ts, t) for u, ts, t in rows], "user_id long, ts_us long, event_type string"
    )
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
    )
    enc = df.select(
        "user_id", (F.col("ts_us") * 8 + code).cast("long").alias("e")
    )
    arr = enc.groupBy("user_id").agg(
        F.sort_array(F.collect_list("e")).alias("es")
    )
    stage = F.aggregate(
        F.col("es"),
        F.lit(0).cast("long"),
        lambda acc, v: F.when(
            (acc % 8 == 0) & (v % 8 == 1),
            F.floor(v / 8).cast("long") * 8 + 1,
        )
        .when(
            (acc % 8 == 1)
            & (v % 8 == 2)
            & (F.floor(v / 8) - F.floor(acc / 8) <= WINDOW_US),
            F.floor(v / 8).cast("long") * 8 + 2,
        )
        .when(
            (acc % 8 == 2)
            & (v % 8 == 3)
            & (F.floor(v / 8) - F.floor(acc / 8) <= WINDOW_US),
            F.floor(v / 8).cast("long") * 8 + 3,
        )
        .otherwise(acc),
    )
    got = {
        r.user_id: r.s
        for r in arr.select("user_id", (stage % 8).cast("int").alias("s")).collect()
    }
    by_user: dict[int, list] = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    want = {u: _reference(evs) for u, evs in by_user.items()}
    assert got == want

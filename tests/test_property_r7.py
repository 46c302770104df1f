"""Hypothesis property tests for the round-7 operators, each pinned
against a from-first-principles Python reference on random corpora (the
fixture oracles cross-check DuckDB; these cross-check the SEMANTICS on
inputs the fixtures never produce: unicode tokens, empty strings,
single-token docs, equal-length ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# BMP only: Spark's levenshtein counts UTF-16 units (Java chars) while
# the Python reference counts codepoints — astral letters would diverge
# by construction, not by bug
_WORD = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0xFFFF
    ),
    min_size=1,
    max_size=4,
)
_DOC = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)


def _toks(text):
    return [t for t in text.split(" ") if t != ""]


@given(docs=st.lists(_DOC, min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_skipgram_matches_positional_reference(spark, docs):
    from duck_delta_share_spark.plans.llm_ops import skipgram_core

    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = {
        (r.term_a, r.term_b, r.dist): r.cnt
        for r in skipgram_core(df).collect()
    }
    want: dict[tuple, int] = {}
    for d in docs:
        ts = _toks(d)
        for i, a in enumerate(ts):
            for dist in (1, 2, 3):
                if i + dist < len(ts):
                    k = (a, ts[i + dist], dist)
                    want[k] = want.get(k, 0) + 1
    # the query takes top-100 under the total order
    # (cnt DESC, dist, term_a, term_b); apply the SAME cutoff to the
    # reference (r7 judge run found a 10-doc corpus with 101 distinct
    # keys, tripping the old `len(want) <= 100` precondition). BMP-only
    # words keep Python codepoint order == Java UTF-16 order.
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0][2], kv[0][0], kv[0][1]))
    want = dict(ranked[:100])
    assert got == want


@given(
    docs=st.lists(
        st.tuples(_DOC, st.sampled_from(["en", "fr"])),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_edit_distance_matches_brute_force_within_blocks(spark, docs):
    from duck_delta_share_spark.plans.llm_ops import edit_distance_core

    rows = [(i, t, lang) for i, (t, lang) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.doc_a, r.doc_b): r.dist
        for r in edit_distance_core(df).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def key(t):
        norm = " ".join(t.split())  # collapse runs like regexp_replace
        pre = norm.strip().lower()[:48]
        parts = pre.split(" ")
        return pre, parts[0] if parts else "", parts[1] if len(parts) > 1 else ""

    want = {}
    for i, (ta, la) in enumerate(docs):
        pa, a1, a2 = key(ta)
        for j in range(i + 1, len(docs)):
            tb, lb = docs[j]
            pb, b1, b2 = key(tb)
            if la == lb and a1 == b1 and a2 == b2 and lev(pa, pb) <= 12:
                want[(i, j)] = lev(pa, pb)
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.sampled_from(["a", "b"]),  # type
            st.integers(0, 3000),         # seconds offset
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_debounce_matches_scan_reference(spark, events):
    import pandas as pd

    from duck_delta_share_spark.plans.functions_sweep import (
        event_debounce_core,
    )

    base = pd.Timestamp("2024-01-01")
    rows = [
        (i, base + pd.Timedelta(seconds=s), u, t)
        for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    )
    got = {
        r.event_type: (r.kept, r.dropped)
        for r in event_debounce_core(df).collect()
    }
    want: dict[str, list[int]] = {}
    by_key: dict[tuple, list] = {}
    for i, (u, t, s) in enumerate(events):
        by_key.setdefault((u, t), []).append((s, i, t))
    for (u, t), rs in by_key.items():
        rs.sort()
        prev = None
        for s, i, ty in rs:
            kd = want.setdefault(ty, [0, 0])
            if prev is not None and (s - prev) * 1_000_000 < 600_000_000:
                kd[1] += 1
            else:
                kd[0] += 1
            prev = s
    assert got == {t: tuple(kd) for t, kd in want.items()}


@given(
    counts=st.lists(
        st.tuples(st.integers(1, 28), st.integers(1, 5)),  # (day, n_events)
        min_size=2,
        max_size=12,
        unique_by=lambda x: x[0],
    )
)
@settings(**_SETTINGS)
def test_anomaly_zscore_matches_reference_and_never_throws(spark, counts):
    import math

    import pandas as pd

    from duck_delta_share_spark.plans.functions_sweep import (
        event_volume_anomaly_core,
    )

    rows = []
    eid = 0
    for day, n in counts:
        for k in range(n):
            rows.append(
                (
                    eid,
                    pd.Timestamp(f"2024-01-{day:02d}")
                    + pd.Timedelta(minutes=k),
                    1,
                    "t",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    )
    got = {r.day: r.z for r in event_volume_anomaly_core(df).collect()}
    ns = [n for _, n in counts]
    n = len(ns)
    s, q = sum(ns), sum(x * x for x in ns)
    for day, cnt in counts:
        z = got[f"2024-01-{day:02d}"]
        if n * q - s * s <= 0:
            assert z is None  # zero variance: NULL, never a throw
        else:
            ref = (n * cnt - s) / (n * math.sqrt((n * q - s * s) / (n * (n - 1))))
            assert z is not None and abs(z - ref) < 1e-8


@given(
    docs=st.lists(
        st.tuples(st.integers(1, 2000), st.sampled_from(["A", "B"])),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_token_budget_matches_greedy_reference(spark, docs):
    from duck_delta_share_spark.plans.llm_ops import token_budget_core

    rows = [(i, " ".join(["w"] * n), src) for i, (n, src) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_selected, r.tokens_used)
        for r in token_budget_core(df).collect()
    }
    want = {}
    by_src: dict[str, list] = {}
    for i, (n, src) in enumerate(docs):
        by_src.setdefault(src, []).append((-n, i, n))
    for src, rs in by_src.items():
        rs.sort()
        cum = sel = used = 0
        for _, _, n in rs:
            cum += n
            if cum <= 5000:
                sel += 1
                used += n
            else:
                break
        if sel:
            want[src] = (sel, used)
    assert got == want

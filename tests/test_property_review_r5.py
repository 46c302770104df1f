"""Hypothesis property tests pinning the operators rewritten in the
round-5 review waves against from-first-principles references:
connected components (both algorithms) vs union-find, pigeonhole simhash
blocking's exact-recall guarantee, and the as-of join vs a literal
scan-back reference with NULLs and duplicate timestamps."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# connected components vs union-find (self loops, chains, duplicates)
# ---------------------------------------------------------------------------


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component
    out = {}
    for n in list(parent):
        r = find(n)
        out[n] = r
    # one more pass: root labels are already the component minimum because
    # unions always point the larger root at the smaller one
    return out


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    from duck_delta_share_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = _union_find(edges)
    for algo in ("star", "hashmin"):
        # driver_gate_edges=0: the reference IS union-find, so the gated
        # driver path would compare union-find against itself — this
        # lens must exercise the DISTRIBUTED loops (r13; the gate's own
        # parity pin lives in test_components.py)
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                df, algorithm=algo, driver_gate_edges=0
            ).collect()
        }
        assert got == want, algo


# ---------------------------------------------------------------------------
# pigeonhole simhash: EXACT recall within the hamming budget
# ---------------------------------------------------------------------------


@given(
    sigs=st.lists(st.integers(0, (1 << 48) - 1), min_size=2, max_size=14, unique=True),
    max_hamming=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_pigeonhole_simhash_exact_recall(spark, sigs, max_hamming):
    from duck_delta_share_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(
            df, max_hamming=max_hamming, bits=48, method="pigeonhole"
        ).collect()
    }
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i] ^ sigs[j]).count("1")
            if h <= max_hamming:
                want.add((i, j, h))
    assert got == want  # exact recall AND no false pairs


# ---------------------------------------------------------------------------
# as-of join vs a literal scan-back reference (NULLs, duplicate ts)
# ---------------------------------------------------------------------------


@given(
    lefts=st.lists(st.integers(0, 20) | st.none(), min_size=1, max_size=8),
    rights=st.lists(
        st.tuples(st.integers(0, 20) | st.none(), st.integers(0, 5)),
        min_size=0,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_asof_backward_matches_reference(spark, lefts, rights):
    from duck_delta_share_spark.operators.asof import asof_join

    def ts(v):
        return None if v is None else f"2024-01-01 00:00:{v:02d}"

    left = spark.createDataFrame(
        [("k", i, ts(v)) for i, v in enumerate(lefts)],
        "id string, row int, lts string",
    ).select("id", "row", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [("k", ts(t), float(val)) for t, val in rights],
        "id string, rts string, val double",
    ).select("id", F.col("rts").cast("timestamp").alias("rts"), "val")

    got = {
        r["row"]: r["asof_value"]
        for r in asof_join(left, right, "id", "lts", "rts", "val").collect()
    }

    for i, lv in enumerate(lefts):
        if lv is None:
            assert got[i] is None, (i, "NULL left ts must not match")
            continue
        cands = [
            (t, val) for t, val in rights if t is not None and t <= lv
        ]
        if not cands:
            assert got[i] is None, (i, "no right row at-or-before")
            continue
        best_t = max(t for t, _ in cands)
        # documented tie-break: deterministic by value (last() over a
        # value-ordered frame takes the maximum)
        best_v = max(float(v) for t, v in cands if t == best_t)
        assert got[i] == best_v, (i, lv, cands)

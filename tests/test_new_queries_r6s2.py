"""Round-6 session-2 query additions: Markov transitions, PMI bigrams,
winsorized embedding stats — property checks beyond the driver's
hash-parity gate, plus the plan-shape rules they must follow."""

from __future__ import annotations

import math

import numpy as np
import pytest

from duck_delta_share_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_event_type_transitions_rows_are_a_distribution(spark):
    df = QUERIES["event_type_transitions"].spark_fn(spark, SF).toPandas()
    assert len(df) > 0
    by_prev = df.groupby("prev_type")["prob"].sum()
    assert np.allclose(by_prev.to_numpy(), 1.0), "P(next|prev) must sum to 1"
    assert (df["cnt"] > 0).all()
    # transitions only exist between event types observed in the fixture
    import pyarrow.parquet as pq

    observed = set(
        pq.read_table(f"{SF}/events.parquet", columns=["event_type"])[
            "event_type"
        ].to_pylist()
    )
    assert set(df["prev_type"]) <= observed
    assert set(df["next_type"]) <= observed


def test_pmi_bigram_scores_matches_first_principles(spark):
    df = QUERIES["pmi_bigram_scores"].spark_fn(spark, SF).toPandas()
    assert len(df) > 0
    # recompute corpus counts in pure python
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for t in texts:
        toks = [w for w in (t or "").split(" ") if w]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_tok = sum(uni.values())
    n_big = sum(big.values())
    expect = {
        k: round(
            math.log((c * float(n_tok) * n_tok) / (float(n_big) * uni[k[0]] * uni[k[1]])),
            9,
        )
        for k, c in big.items()
        if c >= 10
    }
    got = {
        (r.prev_term, r.next_term): (r.cxy, r.pmi) for r in df.itertuples()
    }
    assert set(got) == set(expect)
    for k, (cxy, pmi) in got.items():
        assert cxy == big[k]
        assert pmi == pytest.approx(expect[k], abs=2e-9)


def test_pmi_explodes_materialized_arrays(spark):
    # the shingle array must be materialized in its own projection: an
    # expensive HOF re-evaluated per exploded row was a measured 16x
    # (ngram_novelty r6) — pin `Generate explode(<attribute>`
    import re

    plan = QUERIES["pmi_bigram_scores"].spark_fn(
        spark, SF
    )._jdf.queryExecution().optimizedPlan().toString()
    gens = re.findall(r"Generate explode\(([^)]*)", plan)
    assert gens, "expected explode generators in the plan"
    for arg in gens:
        assert "(" not in arg, f"explode over a computed expression: {arg}"


def test_interarrival_histogram_matches_first_principles(spark):
    df = QUERIES["interarrival_histogram"].spark_fn(spark, SF).toPandas()
    assert len(df) > 0
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id", "event_id", "event_type"]
    ).to_pandas()
    t = t.sort_values(["user_id", "ts", "event_id"])
    t["prev"] = t.groupby("user_id")["ts"].shift(1)
    t = t[t["prev"].notna()].copy()
    delta_us = ((t["ts"] - t["prev"]).dt.total_seconds() * 1e6).round().astype(
        "int64"
    )
    bucket = np.minimum(delta_us // 300_000_000, 24)
    expect = (
        t.assign(bucket=bucket, delta_us=delta_us)
        .groupby(["event_type", "bucket"])
        .agg(n=("delta_us", "size"), mn=("delta_us", "min"), mx=("delta_us", "max"))
    )
    got = df.set_index(["event_type", "bucket"]).sort_index()
    assert len(got) == len(expect)
    for key, row in expect.iterrows():
        g = got.loc[key]
        assert int(g["n"]) == int(row["n"])
        assert int(g["min_delta_us"]) == int(row["mn"])
        assert int(g["max_delta_us"]) == int(row["mx"])


def test_cross_source_leakage_pairs_are_ordered_and_consistent(spark):
    df = QUERIES["cross_source_leakage"].spark_fn(spark, SF).toPandas()
    assert len(df) > 0, "prefix-8 fingerprints must collide across sources"
    assert (df["source_a"] < df["source_b"]).all()
    assert (df["n_shared"] > 0).all()
    # symmetric recomputation from raw data
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"]).to_pandas()
    t = t[t["text"].notna()]
    import hashlib
    import re

    def fp(s):
        norm = re.sub(" +", " ", s.strip().lower())
        return hashlib.md5(" ".join(norm.split(" ")[:8]).encode()).hexdigest()

    pairs: dict[tuple, set] = {}
    by_fp: dict[str, set] = {}
    for txt, src in zip(t["text"], t["source"]):
        by_fp.setdefault(fp(txt), set()).add(src)
    for f, srcs in by_fp.items():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                pairs.setdefault((a, b), set()).add(f)
    expect = {k: len(v) for k, v in pairs.items()}
    got = {
        (r.source_a, r.source_b): int(r.n_shared) for r in df.itertuples()
    }
    assert got == expect


def test_vocab_coverage_curve_is_monotone_and_bounded(spark):
    df = (
        QUERIES["vocab_coverage_curve"].spark_fn(spark, SF)
        .orderBy("k")
        .toPandas()
    )
    assert list(df["k"]) == [1, 2, 4, 8, 16, 32, 64]
    cov = list(df["coverage"])
    assert all(b >= a for a, b in zip(cov, cov[1:])), "coverage must be monotone"
    assert 0 < cov[0] <= cov[-1] <= 1.0
    assert (df["covered_tokens"].diff().dropna() >= 0).all()


def test_pit_attribution_never_uses_future_segments(spark):
    """Temporal-leakage freedom: hand-built stream where the user's
    segment changes AFTER a purchase — the purchase must keep the
    OLD segment; a purchase before any signup lands in NULL."""
    import datetime as dt

    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, dt.datetime(2024, 1, 1, 9), 1, "purchase", 10.0),   # pre-signup
        (2, dt.datetime(2024, 1, 1, 10), 1, "signup", 1.0),     # seg 1
        (3, dt.datetime(2024, 1, 1, 11), 1, "purchase", 20.0),  # seg 1
        (4, dt.datetime(2024, 1, 1, 12), 1, "signup", 2.0),     # seg 2
        (5, dt.datetime(2024, 1, 1, 13), 1, "purchase", 30.0),  # seg 2
    ]
    import tempfile

    sf = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.segment: (r.n_purchases, r.revenue)
        for r in QUERIES["pit_segment_attribution"].spark_fn(spark, sf).collect()
    }
    assert got == {None: (1, 10.0), 1: (1, 20.0), 2: (1, 30.0)}


def test_embedding_winsorized_stats_matches_numpy(spark):
    df = (
        QUERIES["embedding_winsorized_stats"].spark_fn(spark, SF)
        .toPandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    emb = np.stack(
        pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist()
    ).astype(np.float64)
    assert len(df) == emb.shape[1]
    n = emb.shape[0]
    k01 = (n + 99) // 100  # 1-based rank ceil(n/100) — type-1 quantile
    k99 = (99 * n + 99) // 100
    for j in range(emb.shape[1]):
        col = np.sort(emb[:, j])
        p01, p99 = float(col[k01 - 1]), float(col[k99 - 1])
        row = df.iloc[j]
        assert row["dim"] == j + 1
        # order statistics are actual data values: EXACT equality
        assert row["p01"] == p01
        assert row["p99"] == p99
        clipped = np.clip(col, p01, p99)
        # davg quantizes addends to 1e-6 — allow that much slack per row
        assert row["winsor_mean"] == pytest.approx(
            float(clipped.mean()), abs=2e-6
        )

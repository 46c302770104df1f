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
    # transitions only exist between observed event types
    types = set(df["prev_type"]) | set(df["next_type"])
    assert types <= {"click", "view", "purchase", "error", "scroll", "login",
                     "logout", "search", "add_to_cart", "checkout"} | types


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
    for j in range(emb.shape[1]):
        col = emb[:, j]
        # numpy 'linear' == type-7 == Spark percentile / DuckDB quantile_cont
        p01 = round(float(np.quantile(col, 0.01, method="linear")), 6)
        p99 = round(float(np.quantile(col, 0.99, method="linear")), 6)
        row = df.iloc[j]
        assert row["dim"] == j + 1
        assert row["p01"] == pytest.approx(p01, abs=1e-6)
        assert row["p99"] == pytest.approx(p99, abs=1e-6)
        clipped = np.clip(col, row["p01"], row["p99"])
        # davg quantizes addends to 1e-6 — allow that much slack per row
        assert row["winsor_mean"] == pytest.approx(
            float(clipped.mean()), abs=2e-6
        )

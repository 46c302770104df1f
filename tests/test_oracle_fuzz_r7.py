"""Oracle-equivalence fuzz (r7): every oracled query runs Spark-vs-DuckDB
on a SEEDED adversarial fixture the driver's fixed fixtures never
produce — duplicate/permuted/whitespace-run documents, empty strings,
heavy timestamp ties, 16-dim embeddings with exact-duplicate vectors,
and EMPTY TPC-H tables. Any mismatch is an engine-semantics divergence,
not a data problem: garbage in must be the SAME garbage out on both
engines.

First run caught 5 real defects (fixed with this test): quality_features
NULL-vs-0 on zero-word docs, the kmeans oracle's hard-coded 64-dim grid,
merge oracles assuming fixture content, a DIVIDE_BY_ZERO in the gopher
filter (ANSI + filter-collapse + codegen CSE hoisting the division above
its guard), and twap's double-product decimal cast rounding
engine-dependently past 17 significant digits.
"""

from __future__ import annotations

import pytest

# Spark (DataFrame cube/rollup AND SQL GROUP BY CUBE) emits ZERO rows
# over an empty input, while the SQL standard (and DuckDB/Postgres)
# emits the grand-total grouping-set row. Engine-level divergence on
# empty inputs only — the real fixtures are never empty.
EMPTY_INPUT_GROUPING_DIVERGENCE = {"agg_cube", "agg_rollup", "agg_grouping_sets"}

# DuckDB's levenshtein counts UTF-8 BYTES (lev('café','cafe') = 2) while
# Spark counts CODEPOINTS (= 1): the edit-distance oracle is exact only
# on ASCII content — which the fixtures are; this corpus deliberately
# is not (tests/test_unicode_semantics_r7.py pins the boundary).
KNOWN_ENGINE_DIVERGENCE = EMPTY_INPUT_GROUPING_DIVERGENCE | {
    "edit_distance_neardup"
}

# Queries whose run is fixture-contract dependent (64-dim embeddings for
# element_at(64), non-empty TPC-H for the delta/CDC e2e builders) fail
# to RUN here — they're counted as skips, and the floor below ensures
# the sweep keeps covering the rest.
MIN_RAN = 165


@pytest.fixture(scope="module", params=["plain", "nulls"])
def fuzz_dir(request, tmp_path_factory):
    """Two seeded corpora: 'plain' stresses content (dups, ties, empty
    strings); 'nulls' additionally injects NULL text/lang/source/value —
    the r7 NULL sweep found six queries whose Spark NULL handling
    silently diverged from their oracles (all now filter NULL text on
    BOTH sides)."""
    import random

    import numpy as np
    import pandas as pd

    with_nulls = request.param == "nulls"
    out = tmp_path_factory.mktemp(f"fuzzfix_{request.param}")
    rng = random.Random(7 if not with_nulls else 11)
    np_rng = np.random.default_rng(7)
    vocab = [
        "data", "table", "row", "agg", "the", "a", "fast", "slow", "query",
        "spark", "merge", "join", "batch", "window", "café", "naïve", "Ω",
        "x1", "42", "7b", "UPPER", "MiXeD", "punct.", "co-op", "a,b",
    ]
    docs = []
    for i in range(240):
        n = rng.choice([0, 1, 2, 5, 12, 40, 80])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        r = rng.random()
        prev = docs[rng.randrange(len(docs))][1] if docs else None
        if r < 0.08 and prev is not None:
            text = prev                                     # exact dup
        elif r < 0.14 and prev is not None:
            base = prev.split(" ")
            rng.shuffle(base)
            text = " ".join(base)                           # permuted dup
        elif r < 0.20:
            text = "  " + text.replace(" ", "  ").upper() + " "
        if with_nulls and rng.random() < 0.07:
            text = None
        lang = rng.choice(
            ["en", "fr", "zh", None] if with_nulls else ["en", "fr", "zh", "es"]
        )
        src = rng.choice(
            [f"s{k}" for k in range(6)] + ([None] if with_nulls else [])
        )
        docs.append((i, text, lang, src, len(text) if text else 0))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(out / "documents.parquet", index=False)

    ev = []
    base_ts = pd.Timestamp("2024-03-01")
    for i in range(3000):
        if rng.random() < 0.5:  # heavy ties on a 10-minute grid
            ts = base_ts + pd.Timedelta(minutes=10 * rng.randrange(0, 2000))
        else:
            ts = base_ts + pd.Timedelta(seconds=rng.randrange(0, 1200000))
        val = round(rng.uniform(-5, 100), 2)
        props = '{"k": %d}' % rng.randrange(100)
        if with_nulls and rng.random() < 0.05:
            val = None
        if with_nulls and rng.random() < 0.05:
            props = None
        ev.append(
            (i, ts, rng.randrange(40),
             rng.choice(["view", "click", "purchase", "signup", "error"]),
             val, props)
        )
    pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(out / "events.parquet", index=False)

    emb = []
    for i in range(120):
        v = np_rng.normal(size=16).astype("float32")
        if rng.random() < 0.1 and emb:
            v = np.array(emb[rng.randrange(len(emb))][1], dtype="float32")
        emb.append((i, v.tolist(), rng.randrange(4)))
    pd.DataFrame(
        emb, columns=["vec_id", "embedding", "label"]
    ).to_parquet(out / "embeddings.parquet", index=False)

    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' "
            f"LIMIT 0) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


def test_every_oracle_agrees_on_adversarial_input(spark, fuzz_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from tests.parity import compare_frames, duck_connection

    qs, osql = E.queries(), E.oracle_sql()
    con = duck_connection(fuzz_dir)
    ran, skipped, fails = [], [], []
    for name, fn in sorted(qs.items()):
        if name not in osql:
            continue
        if name in KNOWN_ENGINE_DIVERGENCE:
            continue
        try:
            pdf = fn(spark, fuzz_dir).toPandas()
        except Exception:
            skipped.append(name)
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as e:
            fails.append((name, "oracle-error: " + str(e)[:120]))
            continue
        errs = compare_frames(pdf, odf, name)
        (fails.append((name, errs[:2])) if errs else ran.append(name))
    assert not fails, fails
    assert len(ran) >= MIN_RAN, (
        f"only {len(ran)} oracled queries ran on the fuzz fixture "
        f"(skipped: {skipped}) — the sweep lost coverage"
    )

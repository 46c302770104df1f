"""Streaming-twin fuzz (r8): the batch-vs-stream cross-checks run on the
three r7 adversarial seeds (content-adversarial, NULL-bearing,
tie-heavy) instead of only the fixed fixtures — the r7 oracle fuzz found
15 defects on the batch surface; this lens points the same corpora at
the stateful twins, driven MULTI-BATCH (maxFilesPerTrigger=1 over
chronological chunks) so watermark advancement, cross-batch state, and
event-time timeouts all actually exercise (the fixture tests drain one
file = one batch = watermark 0 throughout, which hides every
watermark-interaction bug by construction).

Determinism trick: chunks are chronological (no late drops), and two
far-future sentinel users flush ALL real state — sentinel 1 advances the
watermark past every real timeout, sentinel 2's batch fires them — so
the streaming output must equal the ENTIRE batch anchor (not merely be a
subset).

First run caught two real defects, fixed with this test:
- sessionize_with_state poisoned total_value to NaN on a NULL value
  (+= NaN) where the batch twin's SUM skips NULLs;
- the batch operator and the stateful twin split sessions at gap
  ``>= threshold`` while Spark's native session_window MERGES an event
  at exactly ``last + gap`` (adjacent half-open windows coalesce —
  probed: 12:00 + 12:30 under a 30-minute gap is ONE session). On the
  tie-heavy 10-minute grid the three implementations disagreed on
  session boundaries; all three (and the DuckDB oracle) now use the
  native strict-> rule. The fixed fixtures' random-second timestamps
  never landed on the exact boundary, hiding this for seven rounds.
"""

from __future__ import annotations

import pytest


def _naive(ts):
    try:
        return ts.replace(tzinfo=None)
    except (TypeError, AttributeError):
        return ts


SENTINEL_USERS = {9998, 9999}


@pytest.fixture(scope="module", params=["plain", "nulls", "ties"])
def fuzz(request, tmp_path_factory):
    """Adversarial corpora, written as CHRONOLOGICAL chunk files so the
    streams run multi-batch without late-row drops."""
    import random

    import pandas as pd

    seed = {"plain": 7, "nulls": 11, "ties": 13}[request.param]
    rng = random.Random(seed)
    root = tmp_path_factory.mktemp(f"streamfuzz_{request.param}")
    ev_dir = root / "events"
    doc_dir = root / "docs"
    ev_dir.mkdir()
    doc_dir.mkdir()

    base = pd.Timestamp("2024-03-01")
    rows = []
    for i in range(900):
        if request.param == "ties":
            # heavy collisions: 10-minute grid, 12 users -> many
            # same-user-same-timestamp events and cross-user ties
            ts = base + pd.Timedelta(minutes=10 * rng.randrange(0, 250))
            user = rng.randrange(12)
            # NULL values ON the tie grid: the interaction of the NULL-sum
            # and exact-gap-boundary session fixes is only probed here
            val = rng.choice([0.5, 1.0, 1.0, 2.5, 2.5, None])
        else:
            ts = base + pd.Timedelta(seconds=rng.randrange(0, 2 * 86400))
            user = rng.randrange(25)
            val = round(rng.uniform(-5, 100), 2)
        if request.param == "nulls" and rng.random() < 0.06:
            val = None
        et = rng.choice(["view", "click", "purchase", "signup", "error"])
        rows.append((i, ts, user, et, val))
    rows.sort(key=lambda r: (r[1], r[0]))
    # two sentinel users far past the real data: s1 advances the
    # watermark beyond every real timeout, s2's batch fires them
    max_ts = rows[-1][1]
    sent = [
        (9001, max_ts + pd.Timedelta(days=30), 9998, "view", 1.0),
        (9002, max_ts + pd.Timedelta(days=60), 9999, "view", 1.0),
    ]

    def write(path, chunk):
        pd.DataFrame(
            chunk, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"}).to_parquet(
            path, coerce_timestamps="us", index=False
        )

    n_chunks = 6
    per = (len(rows) + n_chunks - 1) // n_chunks
    for k in range(n_chunks):
        write(ev_dir / f"b{k}.parquet", rows[k * per : (k + 1) * per])
    write(ev_dir / "s6.parquet", [sent[0]])
    write(ev_dir / "s7.parquet", [sent[1]])

    # content-adversarial documents (duplicates, permutations,
    # whitespace runs, empty strings; NULL text on the nulls seed), with
    # arrival timestamps inside one hour so nothing dedups out of horizon
    vocab = [
        "data", "table", "row", "agg", "the", "a", "fast", "slow", "query",
        "spark", "merge", "join", "batch", "window", "café", "naïve", "Ω",
        "x1", "42", "7b", "UPPER", "MiXeD", "punct.", "co-op", "a,b",
    ]
    docs = []
    for i in range(240):
        n = rng.choice([0, 1, 2, 5, 12, 40])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        r = rng.random()
        prev = docs[rng.randrange(len(docs))][1] if docs else None
        if r < 0.10 and prev is not None:
            text = prev
        elif r < 0.16 and prev is not None:
            parts = (prev or "").split(" ")
            rng.shuffle(parts)
            text = " ".join(parts)
        elif r < 0.22:
            text = "  " + text.replace(" ", "  ").upper() + " "
        if request.param == "nulls" and rng.random() < 0.08:
            text = None
        docs.append((i, text, base + pd.Timedelta(seconds=10 * i)))
    pd.DataFrame(docs, columns=["doc_id", "text", "ts"]).astype(
        {"doc_id": "int64"}
    ).to_parquet(doc_dir / "docs.parquet", coerce_timestamps="us", index=False)

    return {"events": ev_dir, "docs": doc_dir, "tag": request.param}


def _events_stream(spark, ev_dir, multi_batch=True):
    raw = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double"
    )
    if multi_batch:
        raw = raw.option("maxFilesPerTrigger", "1")
    return raw.parquet(str(ev_dir)).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value",
    )


def _events_batch(spark, ev_dir):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(str(ev_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(~F.col("user_id").isin(*SENTINEL_USERS))
    )


def _drain(stream_df, tmp_path, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def test_windowed_counts_fuzz(spark, fuzz, tmp_path):
    from pyspark.sql import functions as F

    from duck_delta_share_spark.plans.registry import dsum
    from duck_delta_share_spark.streaming.events import windowed_counts

    name = f"fz_win_{fuzz['tag']}"
    _drain(
        windowed_counts(_events_stream(spark, fuzz["events"])),
        tmp_path,
        name,
        mode="complete",
    )
    got = {
        (_naive(r.window_start), r.event_type): (r.n, str(r.total_value))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {
        (_naive(r.window_start), r.event_type): (r.n, str(r.total_value))
        for r in spark.read.parquet(str(fuzz["events"]))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("impl", ["native", "stateful"])
def test_sessionize_fuzz_matches_batch_exactly(spark, fuzz, tmp_path, impl):
    from duck_delta_share_spark.operators.sessionize import sessionize
    from duck_delta_share_spark.streaming.sessions import (
        session_windows,
        sessionize_with_state,
    )

    if impl == "native":
        stream = session_windows(
            _events_stream(spark, fuzz["events"]), gap="30 minutes",
            watermark="1 hour",
        )
    else:
        stream = sessionize_with_state(
            _events_stream(spark, fuzz["events"]), gap_seconds=1800,
            watermark="1 hour",
        )
    name = f"fz_sess_{impl}_{fuzz['tag']}"
    _drain(stream, tmp_path, name)
    got = {
        (r.user_id, _naive(r.session_start)): (
            _naive(r.session_end),
            r.n_events,
            # NULL-preserving: an all-NULL-value session is SQL NULL on
            # all three implementations (the stateful twin emits it via
            # a nullable Float64 column — r8 self-review #3)
            None if r.total_value is None else round(float(r.total_value), 4),
        )
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id not in SENTINEL_USERS
    }
    want = {
        (r.user_id, _naive(r.session_start)): (
            _naive(r.session_end),
            r.n_events,
            None if r.total_value is None else round(float(r.total_value), 4),
        )
        for r in sessionize(
            _events_batch(spark, fuzz["events"]), gap_seconds=1800
        ).collect()
    }
    # the sentinel flush makes this FULL equality, not subset
    assert got == want and len(want) > 0


def test_transitions_fuzz_matches_batch_exactly(spark, fuzz, tmp_path):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duck_delta_share_spark.streaming.transitions import (
        transitions_with_state,
    )

    name = f"fz_tr_{fuzz['tag']}"
    _drain(
        transitions_with_state(
            _events_stream(spark, fuzz["events"]), watermark="1 hour"
        ),
        tmp_path,
        name,
    )
    got = {
        (r.user_id, r.prev_type, r.next_type, r.prev_us, r.next_us)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id not in SENTINEL_USERS
    }
    e = _events_batch(spark, fuzz["events"]).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    want = {
        (r.user_id, r.event_type, r.nt, r.us, r.nus)
        for r in e.withColumn("nt", F.lead("event_type").over(w))
        .withColumn("nus", F.lead("us").over(w))
        .where(F.col("nt").isNotNull())
        .collect()
    }
    assert got == want and len(want) > 0


def test_dedup_exact_fuzz_doubled_feed(spark, fuzz, tmp_path):
    import pandas as pd

    from duck_delta_share_spark.streaming.dedup import dedup_stream_exact

    # replayed-ingest shape: every row arrives twice in the same file
    src = tmp_path / "doubled"
    src.mkdir()
    pdf = pd.read_parquet(str(fuzz["events"]))
    pd.concat([pdf, pdf]).to_parquet(
        src / "all.parquet", coerce_timestamps="us", index=False
    )
    stream = _events_stream(spark, src, multi_batch=False)
    name = f"fz_dd_{fuzz['tag']}"
    _drain(dedup_stream_exact(stream, ["event_id"], watermark="90 days"),
           tmp_path, name)
    got = spark.sql(
        f"SELECT COUNT(*) n, COUNT(DISTINCT event_id) d FROM {name}"
    ).collect()[0]
    assert got.n == got.d == len(pdf)


def test_dedup_content_fuzz(spark, fuzz, tmp_path):
    from duck_delta_share_spark.functions.text import fingerprint
    from duck_delta_share_spark.streaming.dedup import dedup_stream_content

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp_ntz")
        .parquet(str(fuzz["docs"]))
        .selectExpr("doc_id", "text", "CAST(ts AS TIMESTAMP) AS ts")
    )
    name = f"fz_dc_{fuzz['tag']}"
    _drain(dedup_stream_content(stream, watermark="2 hours"), tmp_path, name)
    survivors = spark.sql(f"SELECT * FROM {name}").collect()
    got_fps = [
        r.fp
        for r in spark.createDataFrame(
            [(s.doc_id, s.text) for s in survivors], "doc_id long, text string"
        )
        .select(fingerprint("text").alias("fp"))
        .collect()
    ]
    want_fps = {
        r.fp
        for r in spark.read.parquet(str(fuzz["docs"]))
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    # exactly one survivor per distinct fingerprint (NULL text is one
    # group: dropDuplicates treats NULL keys as equal, like batch
    # distinct)
    assert sorted(got_fps, key=str) == sorted(set(got_fps), key=str)
    assert set(got_fps) == want_fps


def test_heavy_hitters_fuzz_containment(spark, fuzz, tmp_path):
    import math

    from pyspark.sql import functions as F

    from duck_delta_share_spark.functions.text import tokenize
    from duck_delta_share_spark.streaming.heavy_hitters import (
        heavy_hitters_stream,
    )

    theta = 1 / 64
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp_ntz")
        .parquet(str(fuzz["docs"]))
        .select("doc_id", "text")
    )
    name = f"fz_hh_{fuzz['tag']}"
    _drain(heavy_hitters_stream(stream, threshold=theta, n_shards=4),
           tmp_path, name, mode="update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    candidates = {r.term for r in rows}

    toks = (
        spark.read.parquet(str(fuzz["docs"]))
        .select(F.explode(tokenize("text")).alias("term"))
    )
    total = toks.count()
    exact = {
        r.term
        for r in toks.groupBy("term").count()
        .where(F.col("count") >= theta * total)
        .collect()
    }
    assert exact and exact <= candidates
    k = math.ceil(1 / theta)
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, set()).add(r.term)
    assert all(len(terms) <= k for terms in per_shard.values())

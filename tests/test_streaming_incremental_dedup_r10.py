"""End-to-end STREAMING incremental dedup (r10): the daily-ingest
pipeline driven by real Structured Streaming — readStream over arriving
document files, ``foreachBatch`` = operators/dedup.incremental_dedup_commit
with (app_id, batch_id) as the SetTransaction marker, exactly like the
delta_sink recipe but across TWO tables (corpus + fingerprint store).

Proves, through the actual engine (not direct-API simulation):

1. restart storm: a fresh query on the same checkpoint per arriving
   chunk — the final corpus equals the sequential batch anchor (history
   + per-chunk survivors in arrival order), each doc exactly once, and
   the store never diverges;
2. a crash injected BETWEEN the corpus and store commits of one
   micro-batch fails the query; the restarted stream replays that
   batch_id and converges (store lagged, never led, mid-crash);
3. a manual replay of the last batch after completion is a full no-op.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import duck_delta_share_spark.sources.delta_log as dl
from duck_delta_share_spark.functions.text import fingerprint
from duck_delta_share_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_commit,
)
from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

SCHEMA = "doc_id long, lang string, source string, text string"

HISTORY = [
    (1, "en", "web", "the quick brown fox"),
    (2, "en", "web", "jumps over the lazy dog"),
]
# chronological chunks: cross-history dups, cross-chunk dups, intra-chunk
# dups, fresh docs
CHUNKS = [
    [
        (10, "en", "crawl", "alpha document body"),
        (11, "en", "web", "THE quick  brown fox"),  # dup of history 1
    ],
    [
        (20, "en", "crawl", "alpha  DOCUMENT body"),  # dup of chunk-0's 10
        (21, "de", "book", "beta unique text"),
        (22, "de", "book", "beta UNIQUE text"),  # intra-chunk dup of 21
    ],
    [
        (30, "fr", "crawl", "gamma nouveau texte"),
        (31, "en", "web", "jumps over the LAZY dog"),  # dup of history 2
        (32, "en", "crawl", "alpha document BODY"),  # dup of 10 again
    ],
]
# anchor: history {1,2} + survivors 10, 21, 30
ANCHOR_IDS = {1, 2, 10, 21, 30}


def _pdf(rows):
    return pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"]).astype(
        {"doc_id": "int64"}
    )


def _seed(spark, base):
    corpus, store = base / "corpus", base / "fps"
    hist = spark.createDataFrame(HISTORY, SCHEMA)
    seed = exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    return corpus, store


def _corpus_ids(spark, corpus):
    return {r.doc_id for r in read_delta(spark, corpus).collect()}


def _fps_equal(spark, corpus, store):
    a = {
        r.fp
        for r in read_delta(spark, corpus)
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    b = {r.fp for r in read_delta(spark, store).collect()}
    return a, b


def _run_stream_once(spark, src, ck, corpus, store):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: incremental_dedup_commit(
                spark, b, corpus, store, "stream", bid
            )
        )
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_pipeline_restart_storm(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ck = tmp_path / "ck"
    corpus, store = _seed(spark, tmp_path)

    for k, chunk in enumerate(CHUNKS):
        _pdf(chunk).to_parquet(src / f"c{k}.parquet", index=False)
        # fresh query per chunk on the SAME checkpoint (restart storm)
        _run_stream_once(spark, src, ck, corpus, store)

    assert _corpus_ids(spark, corpus) == ANCHOR_IDS
    a, b = _fps_equal(spark, corpus, store)
    assert a == b
    store_rows = read_delta(spark, store).collect()
    assert len(store_rows) == len({r.fp for r in store_rows}) == len(ANCHOR_IDS)

    # manual replay of the last committed batch: full no-op
    last = dl.last_txn_version(corpus, "stream")
    assert last >= 0
    r = incremental_dedup_commit(
        spark,
        spark.createDataFrame(CHUNKS[-1], SCHEMA),
        corpus,
        store,
        "stream",
        last,
    )
    assert r == {"n_survivors": None, "corpus_version": None, "store_version": None}
    assert _corpus_ids(spark, corpus) == ANCHOR_IDS


def test_streaming_pipeline_crash_between_commits_recovers(
    spark, tmp_path, monkeypatch
):
    src = tmp_path / "src"
    src.mkdir()
    ck = tmp_path / "ck"
    corpus, store = _seed(spark, tmp_path)

    _pdf(CHUNKS[0]).to_parquet(src / "c0.parquet", index=False)
    _run_stream_once(spark, src, ck, corpus, store)
    pre_ids = _corpus_ids(spark, corpus)

    # arm a crash on the NEXT store append from the streaming app: the
    # micro-batch commits the corpus, then dies before the store
    _pdf(CHUNKS[1]).to_parquet(src / "c1.parquet", index=False)
    armed = {"on": True}
    orig = dl.write_delta

    def flaky(df, path, *a, **kw):
        txn = kw.get("txn")
        if armed["on"] and txn and txn[0] == "stream" and str(path).endswith("fps"):
            armed["on"] = False
            raise RuntimeError("injected crash between corpus and store commits")
        return orig(df, path, *a, **kw)

    monkeypatch.setattr(dl, "write_delta", flaky)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream_once(spark, src, ck, corpus, store)
    monkeypatch.setattr(dl, "write_delta", orig)

    # mid-crash: corpus took the batch, store lagged — never led
    a, b = _fps_equal(spark, corpus, store)
    assert b <= a and b != a
    assert _corpus_ids(spark, corpus) > pre_ids

    # the restarted stream replays the failed batch_id and converges
    _run_stream_once(spark, src, ck, corpus, store)
    a, b = _fps_equal(spark, corpus, store)
    assert a == b
    ids = _corpus_ids(spark, corpus)
    assert ids == pre_ids | {21}  # chunk-1 survivors exactly once

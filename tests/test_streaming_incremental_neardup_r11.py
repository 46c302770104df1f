"""End-to-end STREAMING incremental NEAR-dup (r11, VERDICT r10 item 5):
the MinHash twin of tests/test_streaming_incremental_dedup_r10.py —
readStream over arriving document files, ``foreachBatch`` =
operators/dedup.incremental_neardup_commit with (app_id, batch_id) as
the SetTransaction marker, across TWO tables (candidate-pairs table +
band-bucket store), pairs committed FIRST (the corpus-first rule).

Proves through the actual engine:

1. restart storm (fresh query on the same checkpoint per arriving
   chunk): final pairs table equals the sequential direct-API anchor,
   NO duplicate candidate pairs, and the band store holds each doc's
   band rows exactly once;
2. a crash injected BETWEEN the pairs and band-store commits fails the
   query; the pairs table led, the store lagged (never the reverse);
   the restarted stream replays that batch_id and converges;
3. manual replay of the last batch after completion is a full no-op.
"""

from __future__ import annotations

import pandas as pd
import pytest

import duck_delta_share_spark.sources.delta_log as dl
from duck_delta_share_spark.functions.text import fingerprint  # noqa: F401
from duck_delta_share_spark.operators.dedup import (
    incremental_neardup_commit,
    minhash_md5_band_rows,
    minhash_md5_signatures,
)
from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

SCHEMA = "doc_id long, lang string, source string, text string"

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
HISTORY = [
    (1, "en", "web", BASE),
    (2, "en", "web", "completely different words nothing shared here at all "
                     "one two three four five six seven eight nine ten"),
]
CHUNKS = [
    [
        (10, "en", "crawl", BASE.replace("omicron", "OMICRON")),  # near-dup of 1
        (11, "en", "web", "fresh standalone text with its own vocabulary "
                          "red orange yellow green blue indigo violet"),
    ],
    [
        (20, "en", "crawl", BASE.replace("kappa", "KAPPA")),  # near-dup of 1 & 10
        (21, "de", "book", BASE.replace("alpha", "ALPHA")),   # near-dup, same batch
    ],
    [
        (30, "fr", "crawl", "nouveau texte gamma sans rapport avec le reste "
                            "un deux trois quatre cinq six sept huit neuf"),
    ],
]


def _pdf(rows):
    return pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"]).astype(
        {"doc_id": "int64"}
    )


def _seed(spark, base, name=""):
    pairs, store = base / f"pairs{name}", base / f"bands{name}"
    hist = spark.createDataFrame(HISTORY, SCHEMA)
    sigs = minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(sigs, "doc_id", 8, 4), store)
    return pairs, store


def _pairs_rows(spark, pairs):
    return sorted(
        (r.id_new, r.id_old, r.n_shared_bands, r.vs)
        for r in read_delta(spark, pairs).collect()
    )


def _store_docs(spark, store):
    rows = read_delta(spark, store).collect()
    return sorted((r.doc_id, r.band, r.bucket) for r in rows)


def _run_stream_once(spark, src, ck, pairs, store):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: incremental_neardup_commit(
                spark, b, pairs, store, "ndstream", bid
            )
        )
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _control(spark, base):
    pairs, store = _seed(spark, base, "_ctl")
    for i, chunk in enumerate(CHUNKS):
        incremental_neardup_commit(
            spark, spark.createDataFrame(chunk, SCHEMA), pairs, store,
            "ndstream", i,
        )
    return pairs, store


def test_streaming_neardup_restart_storm(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ck = tmp_path / "ck"
    pairs, store = _seed(spark, tmp_path)

    for k, chunk in enumerate(CHUNKS):
        _pdf(chunk).to_parquet(src / f"c{k}.parquet", index=False)
        _run_stream_once(spark, src, ck, pairs, store)

    ctl_pairs, ctl_store = _control(spark, tmp_path)
    got = _pairs_rows(spark, pairs)
    assert got == _pairs_rows(spark, ctl_pairs)
    assert _store_docs(spark, store) == _store_docs(spark, ctl_store)

    # the fixture exercises both pair kinds and real candidates exist
    kinds = {vs for _, _, _, vs in got}
    assert kinds == {"history", "shard"}, got
    # exactly-once: no duplicate candidate pairs, band rows unique
    assert len(got) == len(set(got))
    sd = _store_docs(spark, store)
    assert len(sd) == len(set(sd))
    docs = {d for d, _, _ in sd}
    assert docs == {1, 2, 10, 11, 20, 21, 30}

    # manual replay of the last committed batch: full no-op
    last = dl.last_txn_version(pairs, "ndstream")
    assert last >= 0
    r = incremental_neardup_commit(
        spark,
        spark.createDataFrame(CHUNKS[-1], SCHEMA),
        pairs,
        store,
        "ndstream",
        last,
    )
    assert r == {"n_pairs": None, "pairs_version": None, "store_version": None}
    assert _pairs_rows(spark, pairs) == got


def test_streaming_neardup_crash_between_commits_recovers(
    spark, tmp_path, monkeypatch
):
    src = tmp_path / "src"
    src.mkdir()
    ck = tmp_path / "ck"
    pairs, store = _seed(spark, tmp_path)

    _pdf(CHUNKS[0]).to_parquet(src / "c0.parquet", index=False)
    _run_stream_once(spark, src, ck, pairs, store)
    pre_pairs = _pairs_rows(spark, pairs)

    # arm a crash on the NEXT band-store append from the streaming app:
    # the micro-batch commits the pairs, then dies before the store
    _pdf(CHUNKS[1]).to_parquet(src / "c1.parquet", index=False)
    armed = {"on": True}
    orig = dl.write_delta

    def flaky(df, path, *a, **kw):
        txn = kw.get("txn")
        if armed["on"] and txn and txn[0] == "ndstream" and str(path).endswith(
            "bands"
        ):
            armed["on"] = False
            raise RuntimeError("injected crash between pairs and store commits")
        return orig(df, path, *a, **kw)

    monkeypatch.setattr(dl, "write_delta", flaky)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream_once(spark, src, ck, pairs, store)
    monkeypatch.setattr(dl, "write_delta", orig)

    # mid-crash: pairs took the batch, store lagged — never led
    assert dl.last_txn_version(pairs, "ndstream") == 1
    assert dl.last_txn_version(store, "ndstream") == 0
    assert _pairs_rows(spark, pairs) > pre_pairs
    assert {d for d, _, _ in _store_docs(spark, store)} == {1, 2, 10, 11}

    # restarted stream replays batch 1: pairs append skipped (marker),
    # store append completed; then drain the remaining chunk normally
    _run_stream_once(spark, src, ck, pairs, store)
    _pdf(CHUNKS[2]).to_parquet(src / "c2.parquet", index=False)
    _run_stream_once(spark, src, ck, pairs, store)

    ctl_pairs, ctl_store = _control(spark, tmp_path)
    assert _pairs_rows(spark, pairs) == _pairs_rows(spark, ctl_pairs)
    assert _store_docs(spark, store) == _store_docs(spark, ctl_store)

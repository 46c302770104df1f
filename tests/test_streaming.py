"""Streaming/batch parity: the watermarked windowed aggregation must agree
with the batch groupBy on the same fixture once fully drained."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    windowed_counts,
)
from tests.conftest import SF_DIR


def test_windowed_counts_matches_batch(spark, tmp_path):
    stream = windowed_counts(read_events_stream(spark, SF_DIR))
    run_available_now(stream, str(tmp_path / "ckpt"), query_name="t_win")
    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM t_win").collect()
    }

    e = load_table(spark, SF_DIR, "events")
    batch = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .collect()
    )
    want = {}
    for r in batch:
        ws = r.window_start
        try:
            ws = ws.replace(tzinfo=None)
        except (TypeError, AttributeError):
            pass
        want[(ws, r.event_type)] = (r.n, round(r.total_value, 6))
    got_norm = {}
    for (ws, et), v in got.items():
        try:
            ws = ws.replace(tzinfo=None)
        except (TypeError, AttributeError):
            pass
        got_norm[(ws, et)] = v
    assert got_norm == want


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from duck_delta_share_spark.streaming.events import read_events_stream
    from duck_delta_share_spark.streaming.joins import (
        attribution_batch,
        attribution_stream,
    )

    stream = attribution_stream(
        read_events_stream(spark, SF_DIR), watermark="2 hours", horizon_minutes=60
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "attr_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM t_attr").collect()
    }
    want = {
        (r.purchase_id, r.click_id)
        for r in attribution_batch(
            load_table(spark, SF_DIR, "events"), horizon_minutes=60
        ).collect()
    }
    assert got == want and len(want) > 0


def test_foreachbatch_partitioned_sink(spark, tmp_path):
    from pathlib import Path

    from duck_delta_share_spark.streaming.events import (
        read_events_stream,
        stream_to_partitioned_parquet,
    )

    out = str(tmp_path / "events_by_type")
    q = stream_to_partitioned_parquet(
        read_events_stream(spark, SF_DIR),
        out,
        ["event_type"],
        str(tmp_path / "fb_ck"),
    )
    q.awaitTermination(300)
    dirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
    assert any(d.startswith("event_type=") for d in dirs)
    back = spark.read.parquet(out)
    assert back.count() == load_table(spark, SF_DIR, "events").count()


def test_foreachbatch_sink_replay_idempotent(spark, tmp_path):
    """A micro-batch replayed after a failure between write and checkpoint
    commit must not duplicate rows: the sink keys a dynamic partition
    overwrite on __batch_id, so re-writing the same batch rewrites its own
    subdirectories (ADVICE r1: plain append was at-least-once)."""
    from pyspark.sql import functions as F

    from duck_delta_share_spark import sinks

    out = str(tmp_path / "replayed")
    batch = load_table(spark, SF_DIR, "events").limit(200)

    def write(batch_df, batch_id):
        sinks.write_partitioned(
            batch_df.withColumn("__batch_id", F.lit(batch_id)),
            out,
            ["event_type", "__batch_id"],
            mode="overwrite",
            options={"partitionOverwriteMode": "dynamic"},
        )

    write(batch, 0)
    n_once = spark.read.parquet(out).count()
    write(batch, 0)  # replay of the SAME epoch
    assert spark.read.parquet(out).count() == n_once == 200
    write(batch, 1)  # a NEW epoch appends
    assert spark.read.parquet(out).count() == 400


def test_training_prep_stream_matches_batch(spark, tmp_path):
    """The streaming training-prep twin (content dedup -> quality gate ->
    PII redaction) must agree row-for-row with the same column functions
    applied in batch once the bounded stream drains."""
    from duck_delta_share_spark.functions.text import (
        fingerprint,
        pii_redact,
        quality_score,
    )
    from duck_delta_share_spark.streaming.events import run_available_now
    from duck_delta_share_spark.streaming.pipeline import (
        read_documents_stream,
        training_prep_stream,
    )

    out = training_prep_stream(read_documents_stream(spark, SF_DIR))
    run_available_now(
        out, str(tmp_path / "ckpt_prep"), query_name="t_prep", output_mode="append"
    )
    got = {
        r.doc_id: (r.lang, r.quality, r.clean_text)
        for r in spark.sql("SELECT * FROM t_prep").collect()
    }

    d = load_table(spark, SF_DIR, "documents")
    from pyspark.sql import functions as F

    # Streaming dedup keeps the FIRST ARRIVAL per fingerprint (arrival
    # order across partitions is nondeterministic), batch keeps min
    # doc_id — so compare at the level that IS deterministic: exactly one
    # survivor per passing fingerprint group, correct per-doc payloads.
    rows = d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        "lang",
        F.round(quality_score("text"), 6).alias("quality"),
        quality_score("text").alias("q_raw"),  # the gate uses UNROUNDED
        pii_redact(F.col("text")).alias("clean_text"),
    ).collect()
    per_doc = {r.doc_id: (r.fp, r.lang, r.quality, r.clean_text) for r in rows}
    passing_fps = {r.fp for r in rows if r.q_raw >= 0.6}
    got_fps = [per_doc[doc_id][0] for doc_id in got]
    assert sorted(got_fps) == sorted(set(got_fps)), "duplicate fingerprint survived"
    assert set(got_fps) == passing_fps, "wrong set of content groups survived"
    for doc_id, payload in got.items():
        assert payload == per_doc[doc_id][1:], f"doc {doc_id} payload mismatch"

"""Change-data-feed client surface + CDF batch reads + the streaming
Delta Sharing source (version-offset micro-batches). All against the
in-process mock server; no external services."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.client import (
    DeltaSharingClient,
    DeltaSharingError,
    DeltaSharingProfile,
)
from tests.mock_server import MockDeltaSharingServer, write_fixture_files


@pytest.fixture()
def server(tmp_path):
    data_dir = tmp_path / "dsdata"
    write_fixture_files(data_dir)
    srv = MockDeltaSharingServer(data_dir).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return DeltaSharingClient(
        DeltaSharingProfile(endpoint=server.endpoint, bearer_token="secret-token")
    )


# -- client: /changes ---------------------------------------------------------


def test_changes_full_history(client):
    ch = client.query_table_changes("sales", "web", "clicks", starting_version=1)
    assert [a.action_type for a in ch.actions] == ["add", "add"]
    assert [a.file.version for a in ch.actions] == [1, 2]
    assert ch.actions[0].file.partition_values == {"pcol": "eu"}
    assert ch.metadata.version == 3


def test_changes_version_range(client):
    ch = client.query_table_changes(
        "sales", "web", "clicks", starting_version=2, ending_version=2
    )
    assert [a.file.id for a in ch.actions] == ["f-us"]


def test_changes_after_append(server, client):
    write_extra_file(server)
    v = server.append_version("add", "extra.parquet", "f-extra", {"pcol": "ap"})
    ch = client.query_table_changes("sales", "web", "clicks", starting_version=v)
    assert [a.file.id for a in ch.actions] == ["f-extra"]
    assert ch.actions[0].file.timestamp == 1700000000000 + v * 1000


def test_changes_beyond_latest_is_an_error(client):
    with pytest.raises(DeltaSharingError) as e:
        client.query_table_changes("sales", "web", "clicks", starting_version=99)
    assert e.value.status == 400


def write_extra_file(server, name="extra.parquet", ids=(100, 101)):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "id": pa.array(list(ids), "int64"),
            "val": pa.array([float(i) for i in ids], "float64"),
            "tag": pa.array([f"t{i}" for i in ids]),
        }
    )
    pq.write_table(t, server.data_dir / name)


# -- batch CDF through the DataSource ----------------------------------------


@pytest.fixture()
def registered(spark):
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    return spark


def _cdf_read(spark, server, starting, ending=None):
    r = (
        spark.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting))
    )
    if ending is not None:
        r = r.option("endingVersion", str(ending))
    return r.load("sales.web.clicks")


def test_cdf_batch_inserts(registered, server):
    df = _cdf_read(registered, server, 1)
    assert [f.name for f in df.schema.fields] == [
        "id", "val", "tag", "pcol",
        "_change_type", "_commit_version", "_commit_timestamp",
    ]
    rows = df.collect()
    assert len(rows) == 6
    assert {r._change_type for r in rows} == {"insert"}
    versions = {(r.pcol, r._commit_version) for r in rows}
    assert versions == {("eu", 1), ("us", 2)}
    assert all(r._commit_timestamp is not None for r in rows)


def test_cdf_batch_remove_emits_deletes(registered, server):
    v = server.append_version("remove", "eu.parquet", "f-eu", {"pcol": "eu"})
    rows = _cdf_read(registered, server, v).collect()
    assert {(r.id, r._change_type, r._commit_version) for r in rows} == {
        (1, "delete", v), (2, "delete", v), (3, "delete", v)
    }


def test_cdf_batch_cdf_file_carries_change_type(registered, server):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "id": pa.array([2, 2], "int64"),
            "val": pa.array([2.0, 2.5], "float64"),
            "tag": pa.array(["b", "b"]),
            "_change_type": pa.array(["update_preimage", "update_postimage"]),
        }
    )
    pq.write_table(t, server.data_dir / "upd.parquet")
    v = server.append_version("cdf", "upd.parquet", "f-upd", {"pcol": "eu"})
    rows = _cdf_read(registered, server, v, ending=v).collect()
    assert {(r.val, r._change_type) for r in rows} == {
        (2.0, "update_preimage"), (2.5, "update_postimage")
    }
    assert {r.pcol for r in rows} == {"eu"}


def test_cdf_requires_starting_version(registered, server):
    df = (
        registered.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
        .option("readChangeFeed", "true")
        .load("sales.web.clicks")
    )
    with pytest.raises(Exception, match="startingVersion"):
        df.collect()


# -- streaming source --------------------------------------------------------


def _stream_df(spark, server, **opts):
    r = (
        spark.readStream.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load("sales.web.clicks")


def test_stream_replays_history_then_follows_appends(registered, server, tmp_path):
    q = (
        _stream_df(registered, server, startingVersion="1")
        .writeStream.format("memory")
        .queryName("ds_stream_t1")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.id, r.pcol) for r in registered.sql("select * from ds_stream_t1").collect()}
        assert got == {(1, "eu"), (2, "eu"), (3, "eu"), (10, "us"), (11, "us"), (12, "us")}

        write_extra_file(server)
        server.append_version("add", "extra.parquet", "f-extra", {"pcol": "ap"})
        q.processAllAvailable()
        got = {(r.id, r.pcol) for r in registered.sql("select * from ds_stream_t1").collect()}
        assert got == {
            (1, "eu"), (2, "eu"), (3, "eu"), (10, "us"), (11, "us"), (12, "us"),
            (100, "ap"), (101, "ap"),
        }
    finally:
        q.stop()


def test_stream_checkpoint_restart_is_exactly_once(registered, server, tmp_path):
    # parquet sink (memory sink can't recover from a checkpoint): its
    # transactional file log makes duplicate delivery observable
    ck, out = str(tmp_path / "ck2"), str(tmp_path / "out2")

    def run_until_drained():
        q = (
            _stream_df(registered, server, startingVersion="1")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained()
    assert registered.read.parquet(out).count() == 6

    # append while the stream is DOWN, then restart from the checkpoint:
    # the sink must gain ONLY the post-checkpoint file (no replay of
    # versions 1-2 = exactly-once across restarts)
    write_extra_file(server, name="late.parquet", ids=(200, 201))
    server.append_version("add", "late.parquet", "f-late", {"pcol": "lt"})
    run_until_drained()
    got = {(r.id, r.pcol) for r in registered.read.parquet(out).collect()}
    assert got == {
        (1, "eu"), (2, "eu"), (3, "eu"), (10, "us"), (11, "us"), (12, "us"),
        (200, "lt"), (201, "lt"),
    }


def test_stream_default_starts_at_latest(registered, server, tmp_path):
    q = (
        _stream_df(registered, server)
        .writeStream.format("memory")
        .queryName("ds_stream_t3")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert registered.sql("select count(*) c from ds_stream_t3").first().c == 0
        write_extra_file(server, name="fresh.parquet", ids=(300,))
        server.append_version("add", "fresh.parquet", "f-fresh", {"pcol": "fr"})
        q.processAllAvailable()
        got = {(r.id, r.pcol) for r in registered.sql("select * from ds_stream_t3").collect()}
        assert got == {(300, "fr")}
    finally:
        q.stop()


def test_stream_delete_fails_unless_ignored(registered, server, tmp_path):
    server.append_version("remove", "eu.parquet", "f-eu", {"pcol": "eu"})
    q = (
        _stream_df(registered, server, startingVersion="1")
        .writeStream.format("memory")
        .queryName("ds_stream_t4")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .start()
    )
    with pytest.raises(Exception, match="append-only|ignoreDeletes"):
        q.processAllAvailable()
        raise AssertionError("stream should have failed on the remove action")
    q.stop()

    q2 = (
        _stream_df(registered, server, startingVersion="1", ignoreDeletes="true")
        .writeStream.format("memory")
        .queryName("ds_stream_t4b")
        .option("checkpointLocation", str(tmp_path / "ck4b"))
        .start()
    )
    try:
        q2.processAllAvailable()
        assert registered.sql("select count(*) c from ds_stream_t4b").first().c == 6
    finally:
        q2.stop()


def test_stream_cdf_mode_emits_change_rows(registered, server, tmp_path):
    server.append_version("remove", "us.parquet", "f-us", {"pcol": "us"})
    sdf = _stream_df(registered, server, startingVersion="1", readChangeFeed="true")
    assert "_change_type" in [f.name for f in sdf.schema.fields]
    q = (
        sdf.writeStream.format("memory")
        .queryName("ds_stream_t5")
        .option("checkpointLocation", str(tmp_path / "ck5"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = registered.sql("select * from ds_stream_t5").collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r._change_type, set()).add(r.id)
        assert by_type["insert"] == {1, 2, 3, 10, 11, 12}
        assert by_type["delete"] == {10, 11, 12}
    finally:
        q.stop()


def test_register_share_enables_sql_text(registered, server):
    from duck_delta_share_spark.sources.listing import register_share

    client = DeltaSharingClient(
        DeltaSharingProfile(endpoint=server.endpoint, bearer_token="secret-token")
    )
    views = register_share(registered, client, "sales")
    assert views == ["web_clicks"]
    got = registered.sql(
        "SELECT pcol, COUNT(*) n FROM web_clicks GROUP BY pcol ORDER BY pcol"
    ).collect()
    assert [(r.pcol, r.n) for r in got] == [("eu", 3), ("us", 3)]


def test_stream_survives_transient_control_plane_503(registered, server, tmp_path):
    """A 503 on the version probe or /changes must not kill the stream —
    the client's bounded-backoff retry absorbs it."""
    q = (
        _stream_df(registered, server, startingVersion="1")
        .writeStream.format("memory")
        .queryName("ds_stream_503")
        .option("checkpointLocation", str(tmp_path / "ck503"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert registered.sql("select count(*) c from ds_stream_503").first().c == 6
        server.fail_next = 2  # next two control-plane calls 503
        write_extra_file(server)
        server.append_version("add", "extra.parquet", "f-extra", {"pcol": "ap"})
        q.processAllAvailable()
        assert registered.sql("select count(*) c from ds_stream_503").first().c == 8
        assert server.fail_next == 0, "the injected failures were never hit"
    finally:
        q.stop()


def test_stream_applies_dv_on_added_files(registered, server, tmp_path):
    """Delta-format streaming: an appended file whose add action carries a
    deletion vector must arrive with the deleted physical rows already
    masked (same executor path as batch DV scans)."""
    import struct
    import zlib

    from duck_delta_share_spark.sources import deletion_vectors as dvmod

    write_extra_file(server, name="dvadd.parquet", ids=(200, 201, 202))
    data = dvmod.serialize_dv([1])  # id=201 is deleted
    (server.data_dir / "dvadd.dv").write_bytes(
        bytes([1])
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    server.dv_mode = True
    server.dv_descriptors["dvadd.parquet"] = {
        "storageType": "p",
        "pathOrInlineDv": f"{server.endpoint}/data/dvadd.dv",
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": 1,
    }
    v = server.append_version("add", "dvadd.parquet", "f-dvadd", {"pcol": "dv"})
    q = (
        _stream_df(registered, server, startingVersion=str(v))
        .writeStream.format("memory")
        .queryName("ds_stream_dv")
        .option("checkpointLocation", str(tmp_path / "ckdv"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.id, r.pcol)
            for r in registered.sql("select * from ds_stream_dv").collect()
        }
        assert got == {(200, "dv"), (202, "dv")}
    finally:
        q.stop()
        server.dv_mode = False
        server.dv_descriptors.clear()
        server.change_log = [e for e in server.change_log if e["id"] != "f-dvadd"]
        server.table_version = 3

"""Regression tests for the round-5 REST/registry self-review findings:
timestampAsOf over REST (previously silently ignored), version-correct
metadata for time travel, second-generation URL-expiry recovery, decimal
partition values, readChangeFeed+withRowIds precedence, partitionColumns
whitespace, and loud window-rotation validation."""

from __future__ import annotations

import json

import pytest

from duck_delta_share_spark.sources.delta_share import (
    DeltaShareDataSource,
    _cast_partition_value,
)
from tests.mock_server import MockDeltaSharingServer, write_fixture_files


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("restr5")
    write_fixture_files(data_dir)
    srv = MockDeltaSharingServer(data_dir).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(DeltaShareDataSource)
    return spark


def test_timestamp_as_of_sent_in_query_body(registered, server):
    server.requests.clear()
    df = (
        registered.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
        .option("timestampAsOf", "2024-01-01T00:00:00Z")
        .load("sales.web.clicks")
    )
    df.collect()
    bodies = [
        json.loads(b)
        for m, p, b in server.requests
        if m == "POST" and p.endswith("/query") and b
    ]
    assert bodies, "no /query requests recorded"
    assert any(
        b.get("timestamp") == "2024-01-01T00:00:00Z" for b in bodies
    ), f"timestampAsOf not forwarded: {bodies}"


def test_version_and_timestamp_mutually_exclusive(registered, server):
    # fails at PLANNING time now (schema resolution), not first collect
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            registered.read.format("deltashare")
            .option("endpoint", server.endpoint)
            .option("bearerToken", "secret-token")
            .option("versionAsOf", "1")
            .option("timestampAsOf", "2024-01-01T00:00:00Z")
            .load("sales.web.clicks")
            .collect()
        )


def test_version_as_of_fetches_metadata_at_version(registered, server):
    server.requests.clear()
    df = (
        registered.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
        .option("versionAsOf", "1")
        .load("sales.web.clicks")
    )
    df.schema  # planning triggers the metadata fetch
    df.collect()
    meta_gets = [
        p for m, p, _ in server.requests if m == "GET" and "/metadata" in p
    ]
    assert meta_gets, "no metadata GET recorded"
    assert any("version=1" in p for p in meta_gets), (
        "time travel read did not request point-in-time metadata: "
        f"{meta_gets}"
    )


def test_cast_partition_value_decimal_and_binary():
    import decimal

    import pyarrow as pa

    v = _cast_partition_value("1.50", pa.decimal128(18, 6))
    assert v == decimal.Decimal("1.50")
    # must round-trip through pa.scalar (the executor does exactly this)
    assert pa.scalar(v, type=pa.decimal128(18, 6)).as_py() == decimal.Decimal(
        "1.500000"
    )
    assert _cast_partition_value("ab", pa.binary()) == b"ab"


def test_partition_columns_option_strips_whitespace():
    from duck_delta_share_spark.sources.delta_share import DeltaShareReader
    from duck_delta_share_spark.sources.schema import schema_from_string

    schema = schema_from_string(
        json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "p1", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "p2", "type": "string", "nullable": True, "metadata": {}},
                ],
            }
        )
    )
    r = DeltaShareReader({"partitionColumns": "p1, p2"}, schema)
    assert r.partition_columns == ("p1", "p2")


def test_second_url_expiry_generation_recovers(registered, server, tmp_path):
    """A task holding a gen-1 URL whose cached gen-2 refresh ALSO expired
    must force a re-query instead of re-serving the stale cache entry."""
    from duck_delta_share_spark.sources import delta_share as ds

    opts = {
        "endpoint": server.endpoint,
        "bearertoken": "secret-token",
        "path": "sales.web.clicks",
    }
    # seed the per-process cache with a bogus ("expired gen-2") URL for
    # every file id the server knows
    client = ds._make_client(opts)
    result = client.query_table("sales", "web", "clicks")
    fid = result.files[0].id
    key = (server.endpoint, "sales", "web", "clicks", None, None)
    ds._REFRESH_CACHE[key] = {fid: "http://127.0.0.1:1/stale-gen2.parquet"}
    try:
        task = ds._FileTask(
            url="http://127.0.0.1:1/stale-gen1.parquet",
            partition_values={},
            data_schema_json="{}",
            partition_schema_json="{}",
            full_schema_json="{}",
            file_id=fid,
            refresh=opts,
        )
        # cached path returns the stale gen-2 URL…
        assert ds._refresh_url(task) == "http://127.0.0.1:1/stale-gen2.parquet"
        # …and the skip_cache retry path re-queries for a real URL
        fresh = ds._refresh_url(task, skip_cache=True)
        assert fresh and fresh.startswith("http") and "stale" not in fresh
    finally:
        ds._REFRESH_CACHE.pop(key, None)
        ds._REFRESH_TOKENS.pop(key, None)


def test_cdf_with_row_ids_prefers_cdf(registered, server):
    """readChangeFeed=true + withRowIds=true must stream CDF rows (the
    schema's CDF branch wins) instead of demanding baseRowId from change
    actions that never carry one."""
    df = (
        registered.read.format("deltashare")
        .option("endpoint", server.endpoint)
        .option("bearerToken", "secret-token")
        .option("readChangeFeed", "true")
        .option("withRowIds", "true")
        .option("startingVersion", "1")
        .load("sales.web.clicks")
    )
    assert "_change_type" in [f.name for f in df.schema.fields]
    rows = df.collect()
    assert rows and all(r["_change_type"] is not None for r in rows)


def test_window_rotation_rejects_unknown_and_duplicate_names():
    from duck_delta_share_spark.plans import QUERIES, __name__ as _  # noqa: F401
    from duck_delta_share_spark.plans import _rotate_window

    order_before = list(QUERIES)
    with pytest.raises(ValueError, match="unknown"):
        _rotate_window(["no_such_query_xyz"])
    first = order_before[0]
    with pytest.raises(ValueError, match="repeats"):
        _rotate_window([first, first])
    assert list(QUERIES) == order_before  # failed rotations change nothing

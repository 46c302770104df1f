"""Range-read scan path (VERDICT r1 "What's wrong #2/#4"): the executor
must fetch only footer + projected column chunks of surviving row groups —
never the whole object — and refresh presigned URLs once per process, only
on expiry (403), never on 404."""

from __future__ import annotations

import urllib.error

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan

from duck_delta_share_spark.sources import delta_share as ds
from duck_delta_share_spark.sources.range_io import HttpRangeFile, UrlExpiredError
from tests.mock_server import MockDeltaSharingServer


@pytest.fixture(scope="module")
def big_server(tmp_path_factory):
    """One multi-row-group parquet file big enough that egress accounting
    is meaningful: 200k rows x (id int64 sorted, val float64, payload ~40B
    string), 4 row groups of 50k."""
    data_dir = tmp_path_factory.mktemp("rangedata")
    n = 200_000
    table = pa.table(
        {
            "id": pa.array(range(n), "int64"),
            "val": pa.array([float(i % 997) for i in range(n)], "float64"),
            "payload": pa.array([f"row-{i:07d}-" + "x" * 28 for i in range(n)]),
        }
    )
    pq.write_table(table, data_dir / "big.parquet", row_group_size=50_000)
    srv = MockDeltaSharingServer(data_dir).start()
    srv.file_size = (data_dir / "big.parquet").stat().st_size
    yield srv
    srv.stop()


def _url(srv):
    return f"{srv.endpoint}/data/big.parquet"


def _reset(srv):
    srv.range_requests.clear()
    srv.data_bytes_served = 0


def test_projected_scan_fetches_partial_content(big_server):
    """A 2-of-3-column projection must use Range requests and move far
    fewer bytes than the object holds (the string column dominates)."""
    _reset(big_server)
    t, _ = ds._fetch_parquet(_url(big_server), ["id", "val"])
    assert t.num_rows == 200_000 and t.column_names == ["id", "val"]
    assert len(big_server.range_requests) > 0, "no partial-content requests seen"
    assert big_server.data_bytes_served < 0.6 * big_server.file_size, (
        f"projected scan moved {big_server.data_bytes_served} of "
        f"{big_server.file_size} bytes — range reads not effective"
    )


def test_row_group_pruning_cuts_bytes_and_stays_correct(big_server):
    """id >= 150000 admits only the last of 4 row groups; egress must drop
    accordingly and the rows must match a full-read filter."""
    _reset(big_server)
    t, _ = ds._fetch_parquet(
        _url(big_server), ["id", "val"], [GreaterThan(("id",), 149_999)]
    )
    assert t.num_rows == 50_000
    assert min(t.column("id").to_pylist()) == 150_000
    pruned_bytes = big_server.data_bytes_served

    _reset(big_server)
    ds._fetch_parquet(_url(big_server), ["id", "val"])
    full_bytes = big_server.data_bytes_served
    assert pruned_bytes < 0.5 * full_bytes, (
        f"row-group pruning saved nothing: {pruned_bytes} vs {full_bytes}"
    )


def test_no_matching_row_group_returns_empty_with_schema(big_server):
    t, _ = ds._fetch_parquet(_url(big_server), ["id", "val"], [EqualTo(("id",), -5)])
    assert t.num_rows == 0 and t.column_names == ["id", "val"]


def test_range_unsupported_server_falls_back(big_server):
    """A server that ignores Range (plain 200) must still yield a correct
    scan — the whole body becomes one cached segment."""
    big_server.support_range = False
    try:
        _reset(big_server)
        t, _ = ds._fetch_parquet(
            _url(big_server), ["id"], [GreaterThan(("id",), 149_999)]
        )
        assert t.num_rows == 50_000
        assert len(big_server.range_requests) == 0
    finally:
        big_server.support_range = True


def test_select_row_groups_unit(big_server, tmp_path):
    pf = pq.ParquetFile(big_server.data_dir / "big.parquet")
    md = pf.metadata
    assert ds._select_row_groups(md, []) == [0, 1, 2, 3]
    assert ds._select_row_groups(md, [GreaterThan(("id",), 99_999)]) == [2, 3]
    assert ds._select_row_groups(md, [EqualTo(("id",), 60_000)]) == [1]
    # unknown column → conservative, keep everything
    assert ds._select_row_groups(md, [EqualTo(("nope",), 1)]) == [0, 1, 2, 3]


def test_http_range_file_seek_read(big_server):
    raw = (big_server.data_dir / "big.parquet").read_bytes()
    f = HttpRangeFile(_url(big_server), tail_length=1024)
    assert f.size() == len(raw)
    assert f.read(0) == b""
    f.seek(10)
    assert f.read(20) == raw[10:30]
    f.seek(-16, 2)
    assert f.read() == raw[-16:]  # served from the cached tail
    f.prefetch([(100, 50), (200, 50)], gap=1000)  # coalesces into one request
    reqs_before = f.requests
    f.seek(120)
    assert f.read(100) == raw[120:220]
    assert f.requests == reqs_before, "prefetched read still hit the network"


def test_403_raises_expired_404_raises_httperror(big_server):
    with pytest.raises(UrlExpiredError):
        HttpRangeFile(f"{big_server.endpoint}/data/big.parquet?tok=expired")
    with pytest.raises(urllib.error.HTTPError):
        HttpRangeFile(f"{big_server.endpoint}/data/missing.parquet")


def test_refresh_requeries_once_per_process(tmp_path_factory):
    """Two tasks hitting expiry in the same process: the first re-queries
    the control plane, the second reads the cached fresh URL (r1 #4)."""
    from tests.mock_server import write_fixture_files

    data_dir = tmp_path_factory.mktemp("refreshdata")
    write_fixture_files(data_dir)
    srv = MockDeltaSharingServer(data_dir).start()
    try:
        ds._REFRESH_CACHE.clear()
        opts = {
            "path": "sales.web.clicks",
            "endpoint": srv.endpoint,
            "bearertoken": "secret-token",
        }

        def task(file_id):
            return ds._FileTask(
                url=f"{srv.endpoint}/data/stale?tok=expired",
                partition_values={},
                data_schema_json="{}",
                partition_schema_json="{}",
                full_schema_json="{}",
                file_id=file_id,
                refresh=opts,
            )

        def n_queries():
            return sum(
                1 for m, p, _ in srv.requests if m == "POST" and p.endswith("/query")
            )

        fresh_eu = ds._refresh_url(task("f-eu"))
        assert fresh_eu and "eu.parquet" in fresh_eu
        assert n_queries() == 1
        fresh_us = ds._refresh_url(task("f-us"))
        assert fresh_us and "us.parquet" in fresh_us
        assert n_queries() == 1, "second task re-queried despite warm cache"
        # unknown file id → None (caller re-raises; no URL to retry)
        assert ds._refresh_url(task("f-gone")) is None
    finally:
        srv.stop()
        ds._REFRESH_CACHE.clear()

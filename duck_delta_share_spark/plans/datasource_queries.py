"""Correctness-gate coverage for the ``deltashare`` DataSource itself:
scan the synthetic tables through the DataSource in direct mode (file list
+ schemaString, no server) so the driver's DuckDB oracle verifies the
reader path — schema from schemaString, executor-side parquet fetch, and
filter re-application (§A8/§A9 + §2D fixes)."""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from duck_delta_share_spark.plans.registry import query

_SUPPLIER_DDL = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"


def _register(spark: SparkSession) -> None:
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaShareDataSource)


@query(
    "delta_share_scan",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier
WHERE s_acctbal > 0
""",
    doc="deltashare DataSource scan (direct mode): schemaString-driven "
    "schema, per-file input partitions, pushed + re-applied filter",
)
def delta_share_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark)
    schema = StructType.fromDDL(_SUPPLIER_DDL)
    files = [{"url": f"{sf_dir.rstrip('/')}/supplier.parquet", "partitionValues": {}}]
    return (
        spark.read.format("deltashare")
        .option("files", json.dumps(files))
        .option("schemaString", schema.json())
        .load()
        .filter(F.col("s_acctbal") > 0)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


@query(
    "sql_text_interface",
    oracle="""
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    doc="the SQL-text entry path: load_tables registers temp views and the "
    "query is plain spark.sql — same Catalyst plan as the DataFrame API, "
    "proving users can drive the whole engine from SQL strings",
)
def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duck_delta_share_spark.catalog import load_tables

    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(*) AS n_suppliers,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@query(
    "delta_log_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="local Delta table read WITHOUT delta-spark (sources/delta_log.py): "
    "the region fixture is committed once into a Delta-protocol table "
    "(_delta_log JSON + stats-bearing add actions) and scanned back through "
    "the deltashare DataSource's direct-file mode — log replay, snapshot "
    "and the shared pruning/read path all under the oracle gate",
)
def delta_log_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    table = Path(f"/tmp/ddss_delta_region_{key}")
    if not (table / "_delta_log").is_dir():
        write_delta(load_table(spark, sf_dir, "region"), table)
    return read_delta(spark, table).select("r_regionkey", "r_name")


@query(
    "delta_merge_upsert",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation WHERE n_nationkey NOT IN (0, 99)
UNION ALL
SELECT * FROM (VALUES (0, 'NATION_0_V2', 0), (99, 'NEW_NATION', 1))
ORDER BY n_nationkey
""",
    doc="transactional file-granular merge-on-write on a local Delta table "
    "(sources/delta_log.py:merge_delta): update-key min/max prune the file "
    "list via stats_allow, only overlapping files are read and rewritten "
    "(broadcast anti join), committed as remove+add; the scan-back of the "
    "merged table is hash-checked against the SQL upsert emulation",
)
def delta_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        merge_delta,
        read_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_merge_")) / "t"
    n = load_table(spark, sf_dir, "nation")
    write_delta(n, table)
    updates = spark.createDataFrame(
        [(0, "NATION_0_V2", 0), (99, "NEW_NATION", 1)], n.schema
    )
    merge_delta(spark, table, updates, ["n_nationkey"])
    return read_delta(spark, table).orderBy("n_nationkey")


@query(
    "delta_delete_dv",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer
WHERE NOT (c_acctbal < 0 OR c_nationkey = 7)
ORDER BY c_custkey
""",
    doc="merge-on-read DELETE via deletion vectors "
    "(sources/delta_log.py:delete_where + sources/deletion_vectors.py): "
    "customer is committed as a multi-file local Delta table, rows are "
    "deleted by predicate WITHOUT rewriting any data file — matching row "
    "indexes are evaluated distributed (_metadata.row_index), written as "
    "protocol-format roaring-bitmap DV files by executors, committed as "
    "remove+add(deletionVector) — and the scan-back (DV row masks applied "
    "executor-side) is hash-checked against SQL NOT(predicate). The "
    "reference client ignores DVs and would return the deleted rows "
    "(delta_sharing_client.cpp:357-369)",
)
def delta_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_dv_")) / "t"
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    write_delta(c.repartition(4), table)
    delete_where(spark, table, "c_acctbal < 0 OR c_nationkey = 7")
    return read_delta(spark, table).orderBy("c_custkey")


@query(
    "delta_column_mapping_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    doc="column-mapping read (Delta protocol minReaderVersion 2, "
    "sources/schema.py:column_mapping + the shared scan path): nation is "
    "written with physical col-<id> parquet names and a schemaString "
    "carrying the logical names via delta.columnMapping.physicalName "
    "metadata, exactly like delta-spark's 'name' mode — the scan must "
    "translate physical→logical (columns, stats keys, pushed filters) and "
    "hash-match the plain relational oracle. The reference client ignores "
    "column mapping and would surface physical col-N names "
    "(delta_sharing_client.cpp:357-369)",
)
def delta_column_mapping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_cm_")) / "t"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    logical = ["n_nationkey", "n_name", "n_regionkey"]
    physical = {c: f"col-{i + 1:03d}" for i, c in enumerate(logical)}
    n.toDF(*[physical[c] for c in logical]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(table / "data"))
    fields = [
        dict(
            f,
            metadata={
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": physical[f["name"]],
            },
        )
        for i, f in enumerate(n.schema.jsonValue()["fields"])
    ]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-scan",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps({"type": "struct", "fields": fields}),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        },
    ] + [
        {
            "add": {
                "path": f"data/{p.name}",
                "partitionValues": {},
                "size": p.stat().st_size,
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for p in sorted((table / "data").glob("*.parquet"))
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(_json.dumps(a) for a in actions) + "\n"
    )
    return read_delta(spark, table).orderBy("n_nationkey")


@query(
    "zorder_write_scan",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE value >= 50 AND value <= 60 AND user_id % 7 = 3
ORDER BY event_id
""",
    doc="write-path round trip under the oracle gate (sinks.py:"
    "write_clustered, zorder=True): events are rewritten as Morton-"
    "ordered files clustered on (value, user_id), then scanned back with "
    "a two-dimension filter — data skipping's write side produces "
    "byte-faithful data (the clustering changes LAYOUT, never values), "
    "and the filtered scan hash-matches the plain relational oracle",
)
def zorder_write_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sinks import write_clustered

    out = Path(tempfile.mkdtemp(prefix="ddss_zw_")) / "events_z"
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    write_clustered(e, str(out), ["value", "user_id"], num_files=8, zorder=True)
    return (
        spark.read.parquet(str(out))
        .filter(
            (F.col("value") >= 50)
            & (F.col("value") <= 60)
            & (F.col("user_id") % 7 == 3)
        )
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@query(
    "delta_restore",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    doc="RESTORE TABLE ... TO VERSION AS OF (sources/delta_log.py:"
    "restore_delta): after a MERGE and a DV DELETE mutate the table, the "
    "restore commit reconciles the file set back to version 0 by diffing "
    "snapshots — removes for post-restore files, re-adds with the "
    "ORIGINAL stats/partitionValues/DV descriptors, no data rewritten, "
    "history preserved (the pre-restore state stays time-travelable). "
    "The scan-back must hash-match the untouched source table",
)
def delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        merge_delta,
        read_delta,
        restore_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_restore_")) / "t"
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_delta(n.repartition(2), table)
    updates = spark.createDataFrame([(0, "MUTATED", 4), (55, "EXTRA", 1)], n.schema)
    merge_delta(spark, table, updates, ["n_nationkey"])
    delete_where(spark, table, "n_regionkey = 1")
    restore_delta(table, 0)
    return read_delta(spark, table).orderBy("n_nationkey")


@query(
    "delta_share_cdf_scan",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey,
       'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
FROM nation
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'insert', CAST(1 AS BIGINT)
FROM nation WHERE NOT (n_regionkey = 2)
ORDER BY n_nationkey, _change_type
""",
    doc="change-data-feed batch read through the DataSource "
    "(readChangeFeed + startingVersion over a local Delta table): a DV "
    "DELETE commit replays as remove(masked by the OLD deletion vector = "
    "every previous row) + add(masked by the NEW one = survivors), so "
    "killed rows net out as deletes and survivors churn as delete+insert "
    "pairs — the same attribution delta-spark CDF emits for "
    "merge-on-read deletes. The oracle reconstructs the change set from "
    "the predicate; _commit_timestamp (wall clock) is excluded from the "
    "hashed projection",
)
def delta_share_cdf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import delete_where, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_cdf_")) / "t"
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_delta(n.coalesce(1), table)
    delete_where(spark, table, "n_regionkey = 2")
    _register(spark)
    return (
        spark.read.format("deltashare")
        .option("deltaPath", str(table))
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
        .select(
            "n_nationkey",
            "n_name",
            "n_regionkey",
            "_change_type",
            "_commit_version",
        )
        .orderBy("n_nationkey", "_change_type")
    )


@query(
    "delta_column_mapping_merge",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation WHERE n_nationkey NOT IN (0, 77)
UNION ALL
SELECT * FROM (VALUES (0, 'NATION_0_CM', 0), (77, 'CM_NATION', 2))
ORDER BY n_nationkey
""",
    doc="column-mapping WRITE path (r4; reads landed r3): MERGE on a "
    "delta-spark-style name-mode table — updates arrive with LOGICAL "
    "column names, rewritten files are staged with PHYSICAL col-<id> "
    "parquet names and physical-keyed stats/partitionValues "
    "(sources/delta_log.py:_to_physical), and the scan-back translates "
    "physical back to logical and hash-matches the SQL upsert emulation. "
    "The reference client has no write surface at all and misreads even "
    "mapped READS (physical col-N names, delta_sharing_client.cpp:357-369)",
)
def delta_column_mapping_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import merge_delta, read_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_cmw_")) / "t"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    logical = ["n_nationkey", "n_name", "n_regionkey"]
    physical = {c: f"col-{i + 1:03d}" for i, c in enumerate(logical)}
    n.toDF(*[physical[c] for c in logical]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(table / "data"))
    fields = [
        dict(
            f,
            metadata={
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": physical[f["name"]],
            },
        )
        for i, f in enumerate(n.schema.jsonValue()["fields"])
    ]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-merge",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps({"type": "struct", "fields": fields}),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        },
    ] + [
        {
            "add": {
                "path": f"data/{p.name}",
                "partitionValues": {},
                "size": p.stat().st_size,
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for p in sorted((table / "data").glob("*.parquet"))
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(_json.dumps(a) for a in actions) + "\n"
    )
    updates = spark.createDataFrame(
        [(0, "NATION_0_CM", 0), (77, "CM_NATION", 2)], n.schema
    )
    merge_delta(spark, table, updates, ["n_nationkey"])
    return read_delta(spark, table).orderBy("n_nationkey")


# one mini sharing server per sf_dir, kept alive for the process: the
# returned DataFrame is lazy and the driver collects AFTER this function
# returns, so the server must outlive the call
_DV_REST_SERVERS: dict[str, Any] = {}


@query(
    "delta_share_dv_rest_scan",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id % 7 <> 0 OR doc_id >= 3500
ORDER BY doc_id
""",
    doc="DV-bearing SHARED table over REST (public delta response format): "
    "an in-process sharing server (duck_delta_share_spark/testing.py) "
    "serves documents.parquet with a deletion-vector descriptor whose "
    "pathOrInlineDv is a presigned URL; the client negotiates "
    "responseformat=delta (deltaProtocol/deltaSingleAction lines, "
    "client/rest.py + client/models.py), and executors fetch the roaring "
    "DV payload over HTTP Range and mask deleted physical rows before "
    "emitting (sources/deletion_vectors.py:_fetch_http_dv). The deleted "
    "set is the physical positions of doc_id % 7 = 0 rows, so the oracle "
    "is the plain complement scan. The reference client ignores DVs and "
    "would return the deleted rows (delta_sharing_client.cpp:357-369)",
)
def delta_share_dv_rest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import tempfile
    import zlib
    from pathlib import Path

    import pyarrow.parquet as pq

    from duck_delta_share_spark.sources import deletion_vectors as dvmod

    srv = _DV_REST_SERVERS.get(sf_dir)
    if srv is None:
        from duck_delta_share_spark.testing import MiniSharingServer

        doc = Path(sf_dir) / "documents.parquet"
        # BOUNDED demo setup: the deleted set is capped (doc_id % 7 = 0
        # AND doc_id < 3500 → ≤ 500 positions at ANY fixture scale) so
        # the driver-side DV fixture stays O(1); positions come from
        # Arrow compute kernels over the compact column buffer, never an
        # O(n) Python list of ids. The PRODUCT write path builds DVs
        # executor-side (delete_where); this list only authors the
        # served fixture.
        import pyarrow.compute as pc

        ids = pq.read_table(doc, columns=["doc_id"]).column(0).combine_chunks()
        sel = pc.and_(
            pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7)), 0),
            pc.less(ids, 3500),
        )
        deleted = pc.indices_nonzero(sel).to_pylist()
        data = dvmod.serialize_dv(deleted)
        tmp = Path(tempfile.mkdtemp(prefix="ddss_dvrest_"))
        (tmp / "documents.dv").write_bytes(
            bytes([1])
            + struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        schema_json = spark.read.parquet(str(doc)).schema.json()
        srv = MiniSharingServer(
            "demo",
            "llm",
            "documents",
            schema_json,
            files={"documents.parquet": doc, "documents.dv": tmp / "documents.dv"},
            file_actions=[
                {
                    "name": "documents.parquet",
                    "id": "doc-1",
                    "deletionVector": {
                        "storageType": "p",
                        "pathOrInlineDv": "pending",
                        "offset": 1,
                        "sizeInBytes": len(data),
                        "cardinality": len(deleted),
                    },
                }
            ],
        ).start()
        srv.file_actions[0]["deletionVector"]["pathOrInlineDv"] = (
            f"{srv.endpoint}/data/documents.dv"
        )
        _DV_REST_SERVERS[sf_dir] = srv
    _register(spark)
    return (
        spark.read.format("deltashare")
        .option("endpoint", srv.endpoint)
        .option("bearerToken", "demo-token")
        .load("demo.llm.documents")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "incremental_rollup_cdf",
    oracle="""
WITH final AS (
  SELECT s_nationkey,
         CASE WHEN s_suppkey = 1 THEN 999.99 ELSE s_acctbal END AS bal
  FROM supplier
  UNION ALL
  SELECT 0, 123.45
)
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(bal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
FROM final
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
    doc="incremental view maintenance over the change feed "
    "(operators/incremental.py): a count+sum rollup built at v0 is "
    "advanced using ONLY the CDF rows of a merge commit (signed deltas, "
    "full-outer join on changed keys) — O(changes), not O(table) — and "
    "must hash-match the from-scratch recompute of the final state "
    "(exact decimal sums are associative AND invertible)",
)
def incremental_rollup_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators.incremental import (
        apply_changes_to_rollup,
        rollup_from_scratch,
    )
    from duck_delta_share_spark.sources.delta_log import merge_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_ivm_")) / "t"
    s = load_table(spark, sf_dir, "supplier")
    write_delta(s, table)

    from duck_delta_share_spark.sources.delta_log import read_delta

    # rollup pinned to version 0 (lazy plans must not see the merge)
    prev = rollup_from_scratch(
        read_delta(spark, table, version=0), ["s_nationkey"], {"total_bal": "s_acctbal"}
    )
    upd = s.filter(F.col("s_suppkey") == 1).withColumn("s_acctbal", F.lit(999.99))
    # the INSERT row is a LITERAL frame, not a projection of the
    # (possibly absent) suppkey-1 row: the oracle UNION ALLs it
    # unconditionally, so deriving it from existing content silently
    # skipped the insert on corpora without suppkey 1 (r7 fuzz)
    ins = spark.createDataFrame(
        [tuple(
            {"s_suppkey": 99999, "s_name": "Supplier#000099999",
             "s_nationkey": 0, "s_acctbal": 123.45}.get(f.name)
            for f in s.schema.fields
        )],
        s.schema,
    )
    merge_delta(spark, table, upd.unionByName(ins), ["s_suppkey"])

    from duck_delta_share_spark.sources.delta_log import read_delta_changes

    changes = read_delta_changes(spark, table, 1)
    new = apply_changes_to_rollup(
        prev, changes, ["s_nationkey"], {"total_bal": "s_acctbal"}
    )
    return new.select(
        "s_nationkey", "n", F.col("total_bal").cast("double").alias("total_bal")
    ).orderBy("s_nationkey")


@query(
    "delta_schema_evolution",
    oracle="""
SELECT n_nationkey, n_name,
       CASE WHEN n_nationkey BETWEEN 10 AND 19 THEN n_regionkey
            ELSE CAST(NULL AS BIGINT) END AS n_regionkey
FROM nation
ORDER BY n_nationkey
""",
    doc="schema evolution on the local Delta write path "
    "(sources/delta_log.py:write_delta merge_schema): v0 commits two "
    "columns, an evolved append adds n_regionkey (metaData rewritten with "
    "the union schema), a subset append omits it again — the scan-back "
    "must null-fill pre-evolution and subset files executor-side "
    "(delta-spark mergeSchema semantics; the reference has no write path "
    "at all)",
)
def delta_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_evo_")) / "t"
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )
    write_delta(n.where("n_nationkey < 10").select("n_nationkey", "n_name"), table)
    write_delta(
        n.where("n_nationkey BETWEEN 10 AND 19"), table, merge_schema=True
    )
    write_delta(
        n.where("n_nationkey >= 20").select("n_nationkey", "n_name"), table
    )
    return read_delta(spark, table).orderBy("n_nationkey")


@query(
    "delta_txn_idempotent_append",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
ORDER BY s_suppkey
""",
    doc="SetTransaction-guarded idempotent appends "
    "(sources/delta_log.py:write_delta txn + streaming/delta_sink.py): "
    "supplier lands in two txn-marked batches, then BOTH batches are "
    "crash-replayed — the txn markers in the log make the replays no-ops, "
    "so the scan-back equals the plain table with no duplicate rows "
    "(delta-spark txnAppId/txnVersion semantics; the protocol's "
    "'Transaction Identifiers' section)",
)
def delta_txn_idempotent_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta
    from duck_delta_share_spark.streaming.delta_sink import delta_batch_writer

    table = Path(tempfile.mkdtemp(prefix="ddss_txn_")) / "t"
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    lo = s.where("s_suppkey % 2 = 0")
    hi = s.where("s_suppkey % 2 = 1")
    w = delta_batch_writer(table, "loader")
    w(lo, 0)
    w(hi, 1)
    w(lo, 0)  # crash-replay of batch 0: must be a no-op
    w(hi, 1)  # crash-replay of batch 1: must be a no-op
    return read_delta(spark, table).orderBy("s_suppkey")


@query(
    "delta_check_constraint",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal
FROM customer
ORDER BY c_custkey
""",
    doc="CHECK constraints on the local Delta write path "
    "(sources/delta_log.py:add_check_constraint + _enforce_constraints, "
    "protocol 'CHECK Constraints' / delta.constraints.*): the table is "
    "created from non-negative balances, a constraint is added (with "
    "existing-row validation), the raw negative rows are REJECTED at "
    "append, and the rectified rows land — the scan-back proves rejected "
    "rows never reached the log",
)
def delta_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        add_check_constraint,
        read_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_chk_")) / "t"
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_delta(c.where("c_acctbal >= 0"), table)
    add_check_constraint(spark, table, "non_negative", "c_acctbal >= 0")
    neg = c.where("c_acctbal < 0")
    try:
        write_delta(neg, table)
        raise AssertionError("constraint should have rejected negative rows")
    except ValueError:
        pass
    write_delta(neg.select("c_custkey", (-F.col("c_acctbal")).alias("c_acctbal")), table)
    return read_delta(spark, table).orderBy("c_custkey")


@query(
    "delta_generated_columns",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(year(o_orderdate) AS BIGINT) AS o_year
FROM orders
WHERE o_orderkey % 9 = 0
ORDER BY o_orderkey
""",
    doc="generated columns (sources/delta_log.py:_materialize_generated, "
    "protocol 'Generated Columns' / delta.generationExpression field "
    "metadata): the table declares o_year = year(o_orderdate); half the "
    "rows are appended WITHOUT the column (computed at write time), half "
    "WITH it (validated null-safely) — the scan-back equals the SQL "
    "recomputation, proving stored values and expression agree",
)
def delta_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_gen_")) / "t"
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 9 = 0")
    first = (
        o.where("o_orderkey % 2 = 0")
        .selectExpr(
            "o_orderkey",
            "o_totalprice",
            "o_orderdate",
            "CAST(year(o_orderdate) AS BIGINT) AS o_year",
        )
        .withMetadata(
            "o_year", {"delta.generationExpression": "CAST(year(o_orderdate) AS BIGINT)"}
        )
    )
    write_delta(first, table)
    # second batch OMITS the generated column: the writer computes it
    write_delta(
        o.where("o_orderkey % 2 = 1").select("o_orderkey", "o_totalprice", "o_orderdate"),
        table,
    )
    return (
        read_delta(spark, table)
        .select("o_orderkey", "o_totalprice", "o_year")
        .orderBy("o_orderkey")
    )


@query(
    "delta_nested_mapping_scan",
    oracle="""
SELECT c_custkey,
       c_name AS profile_name,
       c_acctbal AS profile_bal
FROM customer
WHERE c_custkey % 4 = 0
ORDER BY c_custkey
""",
    doc="NESTED column mapping (sources/schema.py:relabel_nested_to_logical "
    "+ physical_data_type): a delta-spark-style table whose struct column "
    "carries physicalName metadata at BOTH levels is created by an evolved-"
    "mapping append (the struct stages under physical nested names via one "
    "positional cast), and the scan-back relabels executor-side with a "
    "zero-copy arrow view — nested projection under logical names equals "
    "the flat SQL oracle",
)
def delta_nested_mapping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    table = _create_nested_mapped_table("ddss_nm_")
    c = load_table(spark, sf_dir, "customer").where("c_custkey % 4 = 0")
    write_delta(
        c.selectExpr(
            "c_custkey", "named_struct('name', c_name, 'bal', c_acctbal) AS profile"
        ),
        table,
    )
    return (
        read_delta(spark, table)
        .select(
            "c_custkey",
            F.col("profile.name").alias("profile_name"),
            F.col("profile.bal").alias("profile_bal"),
        )
        .orderBy("c_custkey")
    )


def _create_nested_mapped_table(prefix: str):
    """Commit version 0 (protocol + metaData only) of a delta-spark-style
    column-mapped table whose struct column carries physicalName metadata
    at BOTH levels: c_custkey→col-k, profile→col-p, profile.name→col-n,
    profile.bal→col-b."""
    import json as _json
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.sources.delta_log import _atomic_commit

    table = Path(tempfile.mkdtemp(prefix=prefix)) / "t"
    (table / "_delta_log").mkdir(parents=True)
    fields = [
        {
            "name": "c_custkey",
            "type": "long",
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 1,
                "delta.columnMapping.physicalName": "col-k",
            },
        },
        {
            "name": "profile",
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "name": "name",
                        "type": "string",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 3,
                            "delta.columnMapping.physicalName": "col-n",
                        },
                    },
                    {
                        "name": "bal",
                        "type": "double",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 4,
                            "delta.columnMapping.physicalName": "col-b",
                        },
                    },
                ],
            },
            "nullable": True,
            "metadata": {
                "delta.columnMapping.id": 2,
                "delta.columnMapping.physicalName": "col-p",
            },
        },
    ]
    _atomic_commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "nm-query",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _json.dumps(
                        {"type": "struct", "fields": fields}
                    ),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "4",
                    },
                }
            },
        ],
        operation="CREATE TABLE",
    )
    return table


@query(
    "delta_nested_mapping_delete",
    oracle="""
SELECT c_custkey,
       c_name AS profile_name,
       c_acctbal AS profile_bal
FROM customer
WHERE c_custkey % 4 = 0 AND NOT (c_acctbal < 0.0)
ORDER BY c_custkey
""",
    doc="delete_where on a NESTED column-mapped table "
    "(sources/delta_log.py:delete_where): the physical parquet layout "
    "(col-p.col-n / col-p.col-b) is read under its physical schema, one "
    "positional struct cast relabels every depth back to logical names, "
    "the predicate ON A NESTED FIELD (profile.bal < 0) evaluates "
    "logically, and matching rows are masked with roaring-bitmap deletion "
    "vectors (no file rewrite) — the scan-back equals the oracle's "
    "anti-filter",
)
def delta_nested_mapping_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta,
        write_delta,
    )

    table = _create_nested_mapped_table("ddss_nmd_")
    c = load_table(spark, sf_dir, "customer").where("c_custkey % 4 = 0")
    write_delta(
        c.selectExpr(
            "c_custkey", "named_struct('name', c_name, 'bal', c_acctbal) AS profile"
        ),
        table,
    )
    delete_where(spark, table, "profile.bal < 0.0")
    return (
        read_delta(spark, table)
        .select(
            "c_custkey",
            F.col("profile.name").alias("profile_name"),
            F.col("profile.bal").alias("profile_bal"),
        )
        .orderBy("c_custkey")
    )


@query(
    "delta_identity_append",
    oracle="""
WITH batches AS (
  SELECT 1 AS batch, o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT 2 AS batch, o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 3
), numbered AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY batch, o_orderkey) AS rn
  FROM batches
)
SELECT CAST(100 + 3 * (rn - 1) AS BIGINT) AS o_id, o_orderkey, o_totalprice
FROM numbered
ORDER BY o_orderkey
""",
    doc="identity columns (sources/delta_log.py:_materialize_identity, "
    "protocol 'Identity Columns' / delta.identity.* field metadata, writer "
    "v6): the table declares o_id IDENTITY(start 100, step 3); two appends "
    "OMIT the column and the writer allocates dense ranges — per-partition "
    "contiguous offsets over a pinned (persisted) input, no global window, "
    "no shuffle — with the high watermark persisted through the commit's "
    "metaData so the second batch continues where the first stopped. The "
    "input is range-partitioned+sorted on o_orderkey, so ids follow key "
    "order within each batch and the oracle recomputes them as "
    "ROW_NUMBER() OVER (ORDER BY batch, o_orderkey)",
)
def delta_identity_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from pyspark.sql.types import DoubleType, LongType, StructField

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_idn_")) / "t"
    schema = StructType(
        [
            StructField(
                "o_id",
                LongType(),
                True,
                {"delta.identity.start": 100, "delta.identity.step": 3},
            ),
            StructField("o_orderkey", LongType(), True),
            StructField("o_totalprice", DoubleType(), True),
        ]
    )
    write_delta(spark.createDataFrame([], schema), table)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for mod in (0, 3):
        batch = (
            o.where(f"o_orderkey % 7 = {mod}")
            .repartitionByRange(4, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
        )
        write_delta(batch, table)
    return (
        read_delta(spark, table)
        .select("o_id", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "delta_row_tracking_scan",
    oracle="""
WITH numbered AS (
  SELECT o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT o_orderkey, o_totalprice, row_id
FROM numbered
WHERE o_orderkey % 10 = 0
ORDER BY o_orderkey
""",
    doc="row tracking (sources/delta_log.py:_assign_base_row_ids + "
    "delta_share.py ROW_ID_COLUMNS, protocol 'Row Tracking' / 'Domain "
    "Metadata'): the table is created with delta.enableRowTracking=true — "
    "every add carries baseRowId (allocated driver-side from numRecords "
    "stats, O(files) metadata, no data pass) and the rowIdHighWaterMark "
    "advances through the delta.rowTracking domain. The input is range-"
    "partitioned+sorted on o_orderkey so _row_id equals ROW_NUMBER()-1 in "
    "key order; rows with o_orderkey%10=5 are then DELETED via deletion "
    "vectors AND the table is COMPACTED (OPTIMIZE materializes the "
    "pre-rewrite ids into the hidden physical columns, which win the "
    "reader's coalesce over the fresh baseRowId) — the scan-back proves "
    "the SURVIVORS keep their original pre-delete, pre-compaction row ids "
    "(stability under merge-on-read deletes and preservation through "
    "rewrites — the whole point of the feature)",
)
def delta_row_tracking_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        optimize,
        read_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_rt_")) / "t"
    o = (
        load_table(spark, sf_dir, "orders")
        .where("o_orderkey % 5 = 0")
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(3, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    write_delta(o, table, configuration={"delta.enableRowTracking": "true"})
    delete_where(spark, table, "o_orderkey % 10 = 5")
    optimize(spark, table)
    return (
        read_delta(spark, table, with_row_ids=True)
        .select("o_orderkey", "o_totalprice", F.col("_row_id").alias("row_id"))
        .orderBy("o_orderkey")
    )


@query(
    "scd2_dimension_cdf",
    oracle="""
WITH vers AS (
  SELECT c_custkey, c_acctbal AS val, 0 AS v FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal + 100.0, 1 FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal + 200.0, 2 FROM customer WHERE c_custkey % 14 = 0
)
SELECT c_custkey,
       val AS c_acctbal,
       CAST(v AS BIGINT) AS valid_from,
       CAST(LEAD(v) OVER (PARTITION BY c_custkey ORDER BY v) AS BIGINT)
         AS valid_to,
       CAST(CASE WHEN LEAD(v) OVER (PARTITION BY c_custkey ORDER BY v)
                 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM vers
ORDER BY c_custkey, valid_from
""",
    doc="SCD Type-2 dimension build from the change feed (the classic "
    "warehouse pattern, fed by our CDF batch read): customer lands at v0, "
    "two MERGE waves update balances at v1 (keys %7=0, +100) and v2 "
    "(%14=0, +200); the CDF insert stream is folded into versioned "
    "dimension rows (valid_from / valid_to / is_current) with one window "
    "pass. File-granular merges rewrite whole files, so unchanged rows "
    "churn as same-value delete+insert pairs — the fold drops no-op "
    "transitions (value = lag(value)), the step every real CDF consumer "
    "needs. Oracle reconstructs the version history from first principles",
)
def scd2_dimension_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from pyspark.sql import Window

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import merge_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_scd2_")) / "t"
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_delta(c.repartition(4), table)
    merge_delta(
        spark,
        table,
        c.where("c_custkey % 7 = 0").select(
            "c_custkey", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
        ),
        ["c_custkey"],
    )
    merge_delta(
        spark,
        table,
        c.where("c_custkey % 14 = 0").select(
            "c_custkey", (F.col("c_acctbal") + 200.0).alias("c_acctbal")
        ),
        ["c_custkey"],
    )
    from duck_delta_share_spark.sources.delta_log import read_delta_changes

    changes = (
        read_delta_changes(spark, table, 0)
        .where("_change_type = 'insert'")
        .select("c_custkey", "c_acctbal", "_commit_version")
    )
    w = Window.partitionBy("c_custkey").orderBy("_commit_version")
    real = changes.withColumn("__prev", F.lag("c_acctbal").over(w)).where(
        # drop file-rewrite no-ops: same value re-inserted by a merge that
        # rewrote the file for OTHER keys
        F.col("__prev").isNull() | (F.col("c_acctbal") != F.col("__prev"))
    )
    w2 = Window.partitionBy("c_custkey").orderBy("_commit_version")
    return (
        real.select(
            "c_custkey",
            "c_acctbal",
            F.col("_commit_version").alias("valid_from"),
            F.lead("_commit_version").over(w2).alias("valid_to"),
            F.lead("_commit_version")
            .over(w2)
            .isNull()
            .cast("int")
            .alias("is_current"),
        )
        .orderBy("c_custkey", "valid_from")
    )


@query(
    "delta_convert_clone_scan",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderkey % 11 = 0 AND NOT (o_totalprice < 100000.0)
ORDER BY o_orderkey
""",
    doc="CONVERT TO DELTA + SHALLOW CLONE "
    "(sources/delta_log.py:convert_to_delta / clone_delta): a plain "
    "parquet directory is imported in place (one commit referencing the "
    "existing files with footer-derived stats — no data rewritten), "
    "shallow-cloned by ABSOLUTE-path add actions (zero bytes copied), "
    "and rows are deleted ON THE CLONE via deletion vectors masking the "
    "FOREIGN files — the scan-back equals the oracle's anti-filter while "
    "the converted source keeps every row (divergence asserted in "
    "tests/test_convert_clone.py)",
)
def delta_convert_clone_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        clone_delta,
        convert_to_delta,
        delete_where,
        read_delta,
    )

    base = Path(tempfile.mkdtemp(prefix="ddss_cvt_"))
    plain = base / "plain"
    o = (
        load_table(spark, sf_dir, "orders")
        .where("o_orderkey % 11 = 0")
        .select("o_orderkey", "o_totalprice")
    )
    o.repartition(3).write.parquet(str(plain))
    convert_to_delta(spark, plain)
    clone = base / "clone"
    clone_delta(plain, clone)
    delete_where(spark, clone, "o_totalprice < 100000.0")
    return read_delta(spark, clone).orderBy("o_orderkey")


@query(
    "delta_update_where",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 0.0 - c_acctbal ELSE c_acctbal END
         AS c_acctbal,
       c_nationkey
FROM customer
ORDER BY c_custkey
""",
    doc="UPDATE ... SET (sources/delta_log.py:update_where, copy-on-write "
    "like delta-spark): negative balances are rectified in place — pass 1 "
    "finds the files holding >= 1 match (only file paths reach the "
    "driver), pass 2 rewrites ONLY those files with CASE WHEN cond THEN "
    "expr ELSE col END, untouched files stay byte-identical, one "
    "conflict-checked remove+add commit — and the scan-back equals the "
    "oracle's CASE projection",
)
def delta_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        read_delta,
        update_where,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_upd_")) / "t"
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    write_delta(c.repartition(4), table)
    update_where(spark, table, "c_acctbal < 0", {"c_acctbal": "0.0 - c_acctbal"})
    return read_delta(spark, table).orderBy("c_custkey")


@query(
    "cdc_replication_e2e",
    oracle="""
WITH state AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer
  WHERE c_custkey % 3 = 0
)
SELECT c_custkey, c_acctbal
FROM state
WHERE NOT (c_acctbal < 0.0)
ORDER BY c_custkey
""",
    doc="END-TO-END CDC replication (sources/delta_log.py:apply_cdc_batch "
    "+ delete_keys): the source table lives through create -> MERGE "
    "(balances +50 for keys %5=0) -> DV DELETE (negatives); its FULL "
    "change feed is then applied to an EMPTY target — latest action per "
    "key wins, file-rewrite churn (same-version delete+insert pairs) "
    "collapses via the type tie-break, upserts merge file-granularly, "
    "deletes mask via key-frame deletion vectors — and the TARGET "
    "scan-back equals the oracle's reconstruction of the source's final "
    "state. The consumer every warehouse-to-lake replication pipeline "
    "needs, driven entirely through our own CDF reader",
)
def cdc_replication_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        apply_cdc_batch,
        delete_where,
        merge_delta,
        read_delta,
        write_delta,
    )

    base_dir = Path(tempfile.mkdtemp(prefix="ddss_cdc_"))
    src = base_dir / "src"
    c = load_table(spark, sf_dir, "customer").where("c_custkey % 3 = 0").select(
        "c_custkey", "c_acctbal"
    )
    write_delta(c.repartition(3), src)
    merge_delta(
        spark,
        src,
        c.where("c_custkey % 5 = 0").select(
            "c_custkey", (F.col("c_acctbal") + 50.0).alias("c_acctbal")
        ),
        ["c_custkey"],
    )
    delete_where(spark, src, "c_acctbal < 0.0")
    from duck_delta_share_spark.sources.delta_log import read_delta_changes

    changes = read_delta_changes(spark, src, 0)
    tgt = base_dir / "tgt"
    apply_cdc_batch(spark, tgt, changes, ["c_custkey"])
    return read_delta(spark, tgt).orderBy("c_custkey")


@query(
    "delta_partition_delete",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderkey % 4 = 0
  AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
ORDER BY o_orderkey
""",
    doc="METADATA-ONLY partition delete (sources/delta_log.py:delete_where "
    "fast path): the table is hive-partitioned by o_orderpriority and "
    "DELETE WHERE o_orderpriority IN ('1-URGENT','2-HIGH') drops whole "
    "files from the log with ZERO data scan — applicability is decided "
    "by the ANALYZER (the predicate runs on a tiny typed partition-tuple "
    "frame; touching a data column falls back to row-level DVs). At "
    "100 TB 'DELETE WHERE day < retention' must not read a byte; the "
    "scan-back equals the oracle's anti-filter",
)
def delta_partition_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_pdel_")) / "t"
    o = load_table(spark, sf_dir, "orders").where("o_orderkey % 4 = 0").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_delta(o, table, partition_by=["o_orderpriority"])
    delete_where(
        spark, table, "o_orderpriority IN ('1-URGENT', '2-HIGH')"
    )
    return read_delta(spark, table).orderBy("o_orderkey")


@query(
    "delta_column_defaults",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment ELSE 'UNKNOWN' END AS segment,
       CASE WHEN c_custkey % 2 = 0 THEN c_acctbal ELSE 1.5 END AS bal
FROM customer
ORDER BY c_custkey
""",
    doc="column DEFAULT values (sources/delta_log.py:_apply_column_defaults, "
    "protocol 'Default Columns' / allowColumnDefaults writer feature, "
    "CURRENT_DEFAULT field metadata): the table declares segment DEFAULT "
    "'UNKNOWN' and bal DEFAULT 1.5; even-key customers append WITH both "
    "columns (provided values win), odd-key customers append with ONLY the "
    "key (the writer fills the declared defaults, cast to the declared "
    "type) — the scan-back equals the SQL CASE recomputation, and the "
    "create advertised the v7 allowColumnDefaults writer feature",
)
def delta_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

    table = Path(tempfile.mkdtemp(prefix="ddss_dflt_")) / "t"
    c = load_table(spark, sf_dir, "customer")
    even = (
        c.where("c_custkey % 2 = 0")
        .selectExpr(
            "CAST(c_custkey AS LONG) AS c_custkey",
            "c_mktsegment AS segment",
            "c_acctbal AS bal",
        )
        .withMetadata("segment", {"CURRENT_DEFAULT": "'UNKNOWN'"})
        .withMetadata("bal", {"CURRENT_DEFAULT": "1.5"})
    )
    write_delta(even, table)
    # odd keys: ONLY the key column — the writer fills both defaults
    write_delta(
        c.where("c_custkey % 2 = 1").selectExpr("CAST(c_custkey AS LONG) AS c_custkey"),
        table,
    )
    from duck_delta_share_spark.sources.delta_log import snapshot as _snap

    assert "allowColumnDefaults" in (_snap(table).protocol or {}).get(
        "writerFeatures", ()
    )
    return read_delta(spark, table).orderBy("c_custkey")


@query(
    "delta_rename_drop_scan",
    oracle="""
SELECT c_custkey, c_name AS customer_name, c_acctbal
FROM customer
WHERE c_custkey % 3 IN (0, 1)
ORDER BY c_custkey
""",
    doc="the full ALTER COLUMN lifecycle on the local Delta write path "
    "(sources/delta_log.py:enable_column_mapping + rename_column + "
    "drop_column — the protocol's point of name-mode mapping): a PLAIN "
    "table is upgraded in place (physicalNames frozen to the current "
    "names; the existing files already store them), c_name renames to "
    "customer_name and c_mktsegment drops WITHOUT touching any parquet "
    "file, then an append lands THROUGH the renamed logical schema and "
    "the scan-back reads pre- and post-rename files under the new names",
)
def delta_rename_drop_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    from pathlib import Path

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.sources.delta_log import (
        drop_column,
        enable_column_mapping,
        read_delta,
        rename_column,
        write_delta,
    )

    table = Path(tempfile.mkdtemp(prefix="ddss_ren_")) / "t"
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    write_delta(c.where("c_custkey % 3 = 0"), table)
    enable_column_mapping(table)
    rename_column(table, "c_name", "customer_name")
    drop_column(table, "c_mktsegment")
    # append THROUGH the renamed logical schema (physical staging under
    # the preserved field ids)
    write_delta(
        c.where("c_custkey % 3 = 1").selectExpr(
            "c_custkey", "c_name AS customer_name", "c_acctbal"
        ),
        table,
    )
    return (
        read_delta(spark, table)
        .select("c_custkey", "customer_name", "c_acctbal")
        .orderBy("c_custkey")
    )

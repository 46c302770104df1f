"""Round-13 optimization pins: each test locks an equivalence or plan
shape that an r13 performance change relies on.

- read_delta_changes' native CDF fast path returns byte-identical change
  rows (including _commit_timestamp) to the Python DataSource on a
  merge-wave change set, and falls back wholesale when any file carries
  a deletion vector (the mixed mode measured slower — see the docstring);
- the native-read glob gate: a table path containing Hadoop glob
  metacharacters is served by the DataSource (literal opens), not
  spark.read.parquet (which glob-expands), with identical rows;
- the scd2/cdc CDF plans scan natively (no BatchScan deltashare) when
  the change set is DV-free.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from duck_delta_share_spark.session import get_spark

    s = get_spark(app_name="r13-opt-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_merge_table(spark, root: Path):
    from duck_delta_share_spark.sources.delta_log import merge_delta, write_delta

    t = root / "t"
    base = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("double").alias("v")
    )
    write_delta(base.repartition(3), t)
    merge_delta(
        spark,
        t,
        base.where("k % 7 = 0").select("k", (F.col("v") + 1.5).alias("v")),
        ["k"],
    )
    merge_delta(
        spark,
        t,
        base.where("k % 14 = 0").select("k", (F.col("v") + 2.5).alias("v")),
        ["k"],
    )
    return t


def test_native_cdf_identity_and_plan(spark):
    from duck_delta_share_spark.sources.delta_log import read_delta_changes
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    t = _mk_merge_table(spark, Path(tempfile.mkdtemp(prefix="r13_cdf_id_")))
    spark.dataSource.register(DeltaShareDataSource)
    via_ds = (
        spark.read.format("deltashare")
        .option("deltaPath", str(t))
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    native = read_delta_changes(spark, t, 0)
    assert _rows(via_ds) == _rows(native)
    # names and types must match exactly; nullability FLAGS differ by
    # construction (native parquet scans relax data columns, literal CDF
    # columns tighten) — the same metadata-only divergence the r12
    # native read_delta path established; row equality is the contract
    assert [(f.name, f.dataType) for f in via_ds.schema.fields] == [
        (f.name, f.dataType) for f in native.schema.fields
    ]
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "deltashare" not in plan, plan
    assert "Scan parquet" in plan, plan
    # endingVersion bound honored: [0, 1] excludes the second merge wave
    bounded = read_delta_changes(spark, t, 0, 1)
    assert set(
        r["_commit_version"] for r in bounded.select("_commit_version").distinct().collect()
    ) == {0, 1}


def test_native_cdf_dv_change_set_falls_back(spark):
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta_changes,
        write_delta,
    )

    t = Path(tempfile.mkdtemp(prefix="r13_cdf_dv_")) / "t"
    base = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("long").alias("grp")
    )
    write_delta(base.repartition(2), t)
    delete_where(spark, t, "grp = 3")  # DV delete -> change set carries a DV
    df = read_delta_changes(spark, t, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "deltashare" in plan, plan  # wholesale DataSource fallback
    # the DV-masked semantics still hold: v1 nets out grp=3 as deletes
    v1 = df.where("_commit_version = 1")
    dels = v1.where("_change_type = 'delete'")
    ins = v1.where("_change_type = 'insert'")
    assert dels.count() > 0 and ins.where("grp = 3").count() == 0


def test_lsh_materialize_capped_identical_and_single_evaluation(spark):
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators import dedup as dd
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents")
    sigs = dd.minhash_signatures(d, num_hashes=32, shingle_n=3)
    base = dd.lsh_candidate_pairs(sigs, num_hashes=32, bands=8)
    mat = dd.lsh_candidate_pairs(
        sigs, num_hashes=32, bands=8, materialize_capped=True
    )
    assert _rows(base) == _rows(mat)
    # the checkpoint truncates the lineage: the pair join must read the
    # materialized band rows on BOTH sides — no band explode (Generate)
    # or cap window re-evaluation left in the plan
    plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    assert "Window" not in plan, plan


def test_native_dv_read_identity_and_plan(spark):
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta,
        write_delta,
    )
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    t = Path(tempfile.mkdtemp(prefix="r13_dv_native_")) / "t"
    base = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 11).cast("long").alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    write_delta(base.repartition(4), t)
    # two DV waves: some files masked twice (superseding DVs), plus a
    # predicate that leaves at least one file untouched
    delete_where(spark, t, "grp = 3")
    delete_where(spark, t, "k < 37")
    got = read_delta(spark, t)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "deltashare" not in plan, plan  # native scans + anti joins
    assert "BroadcastHashJoin LeftAnti" in plan or "LeftAnti" in plan, plan
    spark.dataSource.register(DeltaShareDataSource)
    via_ds = (
        spark.read.format("deltashare").option("deltaPath", str(t)).load()
    )
    assert _rows(got) == _rows(via_ds)
    # semantics: exactly the anti-filtered rows survive
    want = _rows(base.where("grp != 3 and k >= 37"))
    assert _rows(got.select("k", "grp", "v")) == want
    # pinned versions keep the DataSource path (vacuumed-pin contract)
    pinned = read_delta(spark, t, version=1)
    assert "deltashare" in pinned._jdf.queryExecution().executedPlan().toString()


def test_native_dv_read_empty_file_after_mask(spark):
    from duck_delta_share_spark.sources.delta_log import (
        delete_where,
        read_delta,
        write_delta,
    )

    t = Path(tempfile.mkdtemp(prefix="r13_dv_empty_")) / "t"
    base = spark.range(0, 40).select(F.col("id").alias("k"))
    write_delta(base.repartition(2), t)
    delete_where(spark, t, "k >= 0")  # masks EVERY row of every file
    got = read_delta(spark, t)
    assert got.count() == 0
    assert "deltashare" not in got._jdf.queryExecution().executedPlan().toString()


def test_staged_rewrites_pin_physical_types_to_table_schema(spark):
    """ANSI-widened rewrite expressions (decimal(23,1)+100 -> (24,1))
    must not stage files whose physical type differs from metaData: the
    Python reader silently per-file-cast, the native reader refuses
    (PARQUET_COLUMN_DATA_TYPE_MISMATCH) — _cast_to_table_schema pins the
    staged frame writer-side (the delta-spark behavior)."""
    import pyarrow.parquet as pq

    from duck_delta_share_spark.sources.delta_log import (
        merge_delta,
        read_delta,
        snapshot,
        update_where,
        write_delta,
    )

    t = Path(tempfile.mkdtemp(prefix="r13_cast_")) / "t"
    base = spark.range(40).selectExpr("id AS k", "id * 1.0 AS v")  # v: decimal(23,1)
    write_delta(base.repartition(3), t)
    merge_delta(
        spark, t, base.where("k % 5 = 0").selectExpr("k", "v + 100 AS v"), ["k"]
    )
    update_where(spark, t, "k = 1", {"v": "9.5"})  # double RHS on decimal col
    snap = snapshot(t)
    for f in snap.files:
        phys = pq.ParquetFile(f["url"]).schema_arrow.field("v").type
        assert str(phys) == "decimal128(23, 1)", (f["url"], str(phys))
    got = read_delta(spark, t)  # native path must read it
    assert "deltashare" not in got._jdf.queryExecution().executedPlan().toString()
    want = {(i, float(i) + (100.0 if i % 5 == 0 else 0.0)) for i in range(40)}
    want = {(1, 9.5) if k == 1 else (k, v) for k, v in want}
    assert {(r.k, float(r.v)) for r in got.collect()} == want


def test_glob_metachar_table_path_falls_back_with_identical_rows(spark):
    from duck_delta_share_spark.sources.delta_log import (
        _glob_safe,
        read_delta,
        write_delta,
    )

    assert _glob_safe(["/a/b/part-0.parquet"])
    for c in "*?[]{}\\":
        assert not _glob_safe([f"/a/x{c}y/part-0.parquet"])

    root = Path(tempfile.mkdtemp(prefix="r13_glob_"))
    plain = root / "plain"
    globby = root / "t[1]"  # [1] is a Hadoop glob character class
    base = spark.range(0, 25).select(F.col("id").alias("k"))
    write_delta(base, plain)
    write_delta(base, globby)
    got = read_delta(spark, globby)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "deltashare" in plan, plan  # literal-open fallback, not a glob
    assert _rows(got) == _rows(read_delta(spark, plain))


def test_native_mapped_read_identity_and_plan(spark):
    """r13: a FLAT column-mapped snapshot (top-level physicalName renames
    only, no DVs/partitions) scans natively — identical rows AND logical
    column names vs the Python DataSource, and the plan shows a parquet
    scan, not BatchScan deltashare. Nested renames keep the DataSource."""
    import json as _json

    from duck_delta_share_spark.sources.delta_log import (
        _datasource_read,
        read_delta,
        write_delta,
    )

    root = Path(tempfile.mkdtemp(prefix="r13_cm_native_"))
    t = root / "t"
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    # hand-build a name-mode mapped table (the delta_column_mapping_merge
    # fixture shape): files carry physical col-NNN names
    phys = {"k": "col-001", "grp": "col-002", "v": "col-003"}
    (t / "_delta_log").mkdir(parents=True)
    df.toDF(*phys.values()).coalesce(2).write.mode("overwrite").parquet(
        str(t / "data")
    )
    fields = [
        dict(
            f,
            metadata={
                "delta.columnMapping.id": i + 1,
                "delta.columnMapping.physicalName": phys[f["name"]],
            },
        )
        for i, f in enumerate(df.schema.jsonValue()["fields"])
    ]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cm-native",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(
                    {"type": "struct", "fields": fields}
                ),
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
        for p in sorted((t / "data").glob("*.parquet"))
    ]
    (t / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(_json.dumps(a) for a in actions) + "\n"
    )
    native = read_delta(spark, t)
    via_ds = _datasource_read(spark, t, None, False)
    assert native.columns == via_ds.columns == ["k", "grp", "v"]
    assert _rows(native) == _rows(via_ds)
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "deltashare" not in plan and "Scan parquet" in plan

"""Write-path round trips: partitioned layout (+ pruning), sorted files,
bucketed tables (+ shuffle-free join), streaming dedup."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from duck_delta_share_spark import sinks
from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.streaming.dedup import dedup_stream_exact
from duck_delta_share_spark.streaming.events import read_events_stream
from tests.conftest import SF_DIR


def test_write_partitioned_roundtrip_and_pruning(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_by_status")
    sinks.write_partitioned(o, path, ["o_orderstatus"])

    dirs = {p.name for p in Path(path).iterdir() if p.is_dir()}
    assert any(d.startswith("o_orderstatus=") for d in dirs)

    back = spark.read.parquet(path)
    assert back.count() == o.count()

    # partition pruning must reach the scan (PartitionFilters, not a full read)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == o.filter("o_orderstatus = 'F'").count()


def test_write_sorted_clusters_rows(spark, tmp_path):
    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate")
    path = str(tmp_path / "lineitem_sorted")
    sinks.write_sorted(l.repartition(4), path, ["l_shipdate"])
    back = spark.read.parquet(path)
    assert back.count() == l.count()
    # each file is internally sorted: per-partition monotonic check
    nondesc = back.withColumn("__f", F.input_file_name()).groupBy("__f").agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    )
    assert nondesc.count() >= 1  # files exist with stats


def test_write_bucketed_join_without_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS t_cust_b")
    spark.sql("DROP TABLE IF EXISTS t_ord_b")
    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    sinks.write_bucketed(
        c, "t_cust_b", ["c_custkey"], num_buckets=4, path=str(tmp_path / "cust_b")
    )
    sinks.write_bucketed(
        o.withColumnRenamed("o_custkey", "c_custkey"),
        "t_ord_b",
        ["c_custkey"],
        num_buckets=4,
        path=str(tmp_path / "ord_b"),
    )
    joined = spark.table("t_cust_b").join(spark.table("t_ord_b"), "c_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-bucketed equi-join: no exchange on either side
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert joined.count() == o.count()


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    base = read_events_stream(spark, SF_DIR)
    doubled = base.union(read_events_stream(spark, SF_DIR))
    deduped = dedup_stream_exact(doubled, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT COUNT(*) n, COUNT(DISTINCT event_id) d FROM t_dedup_stream").collect()[0]
    n_events = load_table(spark, SF_DIR, "events").count()
    assert got.n == got.d == n_events


def test_compact_files_unpartitioned(spark, tmp_path):
    """200 tiny files -> a handful, identical data back."""
    from duck_delta_share_spark import sinks
    from duck_delta_share_spark.catalog import load_table
    from tests.conftest import SF_DIR

    out = str(tmp_path / "shredded")
    src = load_table(spark, SF_DIR, "orders")
    src.repartition(200).write.parquet(out)
    import os

    before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert before == 200
    stats = sinks.compact_files(spark, out, target_file_mb=128)
    assert stats["files_before"] == 200
    assert stats["files_after"] <= 4
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)


def test_compact_files_partitioned_keeps_layout(spark, tmp_path):
    from duck_delta_share_spark import sinks
    from duck_delta_share_spark.catalog import load_table
    from tests.conftest import SF_DIR

    out = str(tmp_path / "shredded_p")
    src = load_table(spark, SF_DIR, "events")
    src.repartition(40).write.partitionBy("event_type").parquet(out)
    stats = sinks.compact_files(
        spark, out, target_file_mb=128, partition_by=["event_type"]
    )
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("event_type=")]
    assert dirs, "hive partition layout must survive compaction"
    # pruning still works after the rewrite
    one = back.filter(back.event_type == back.select("event_type").first()[0])
    assert one.count() > 0


def test_upsert_partitioned_touches_only_affected_dirs(spark, tmp_path):
    """Upsert must update matching keys, insert new ones, and leave
    untouched partition directories byte-identical."""
    import os

    from pyspark.sql import functions as F

    from duck_delta_share_spark import sinks

    out = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, part string, val double",
    )
    base.write.partitionBy("part").parquet(out)
    c_files_before = {
        f: os.path.getmtime(os.path.join(out, "part=c", f))
        for f in os.listdir(os.path.join(out, "part=c"))
        if f.endswith(".parquet")
    }

    updates = spark.createDataFrame(
        [(2, "a", 99.0), (5, "b", 50.0)], "id long, part string, val double"
    )
    stats = sinks.upsert_partitioned(
        spark, out, updates, key_cols=["id"], partition_by=["part"]
    )
    assert stats["partitions_touched"] == 2

    back = {r.id: (r.part, r.val) for r in spark.read.parquet(out).collect()}
    assert back == {
        1: ("a", 10.0),
        2: ("a", 99.0),  # updated
        3: ("b", 30.0),
        4: ("c", 40.0),  # untouched partition
        5: ("b", 50.0),  # inserted
    }
    c_files_after = {
        f: os.path.getmtime(os.path.join(out, "part=c", f))
        for f in os.listdir(os.path.join(out, "part=c"))
        if f.endswith(".parquet")
    }
    assert c_files_after == c_files_before, "untouched partition was rewritten"


def test_upsert_partitioned_semijoin_path_above_literal_cap(spark, tmp_path):
    """Above max_literal_partitions the OR-chain of literal predicates
    would blow up the analyzer (and the driver collect is unbounded);
    the broadcast-semi-join path must produce identical results —
    including the NULL-partition and untouched-directory guarantees."""
    import os

    from duck_delta_share_spark import sinks

    out = str(tmp_path / "lake_many")
    base = spark.createDataFrame(
        [(i, f"p{i % 10}" if i % 10 else None, float(i)) for i in range(40)],
        "id long, part string, val double",
    )
    base.write.partitionBy("part").parquet(out)
    null_dir = os.path.join(out, "part=__HIVE_DEFAULT_PARTITION__")
    assert os.path.isdir(null_dir)

    # touch 9 of 10 partitions (incl. the NULL one), leave part=p5 alone
    updates = spark.createDataFrame(
        [
            (i, f"p{i % 10}" if i % 10 else None, 1000.0 + i)
            for i in range(20)
            if i % 10 != 5
        ]
        + [(100, "p1", 7.0)],
        "id long, part string, val double",
    )
    p5_before = sorted(os.listdir(os.path.join(out, "part=p5")))
    stats = sinks.upsert_partitioned(
        spark,
        out,
        updates,
        key_cols=["id"],
        partition_by=["part"],
        max_literal_partitions=3,  # force the semi-join path
    )
    assert stats["partitions_touched"] == 9
    back = {r.id: (r.part, r.val) for r in spark.read.parquet(out).collect()}
    # updated keys carry new values; non-matching rows of touched
    # partitions (incl. NULL) survive; untouched partition intact
    for i in range(20):
        if i % 10 != 5:
            assert back[i] == (f"p{i % 10}" if i % 10 else None, 1000.0 + i)
    for i in list(range(20, 40)) + [5, 15]:
        assert back[i] == (f"p{i % 10}" if i % 10 else None, float(i))
    assert back[100] == ("p1", 7.0)
    assert sorted(os.listdir(os.path.join(out, "part=p5"))) == p5_before


def _file_ranges(path, cols):
    """Per-data-file (min, max) for each column, from parquet footers."""
    import pyarrow.parquet as pq

    out = []
    for p in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for j in range(g.num_columns):
                col = g.column(j)
                name = col.path_in_schema
                if name in cols and col.statistics and col.statistics.has_min_max:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _avg_span(ranges, col, domain):
    spans = [(r[col][1] - r[col][0]) / domain for r in ranges]
    return sum(spans) / len(spans)


def test_write_clustered_zorder_prunes_all_dimensions(spark, tmp_path):
    # two independent pseudo-uniform dimensions over [0, 1000)
    df = spark.range(20_000).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503 + 17) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    sinks.write_clustered(df, lin, ["x", "y"], num_files=16, zorder=False)
    sinks.write_clustered(df, zo, ["x", "y"], num_files=16, zorder=True)

    # nothing lost or duplicated by the rewrite
    back = spark.read.parquet(zo)
    assert back.count() == 20_000
    assert back.agg(F.sum("payload")).first()[0] == sum(range(20_000))

    rl, rz = _file_ranges(lin, ["x", "y"]), _file_ranges(zo, ["x", "y"])
    assert len(rl) >= 8 and len(rz) >= 8
    # linear: lead key x clusters tightly, trailing key y spans everything
    assert _avg_span(rl, "x", 1000) < 0.2
    assert _avg_span(rl, "y", 1000) > 0.8
    # zorder: BOTH dimensions cluster — each file is a hyper-rectangle
    assert _avg_span(rz, "x", 1000) < 0.6
    assert _avg_span(rz, "y", 1000) < 0.6

    # the operational consequence: a point-ish predicate on y alone
    # admits fewer files under zorder than linear layout
    def files_admitting(ranges, col, lo, hi):
        return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))

    assert files_admitting(rz, "y", 100, 150) < files_admitting(rl, "y", 100, 150)

"""Physical-plan pins for the r10 queries (beyond the registry-wide
hazard sweep): column pruning must reach the scans, and the windows must
be KEY-partitioned (fingerprint), never whole-data."""

from __future__ import annotations

import re

from duck_delta_share_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = QUERIES[name].spark_fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_doc_embedding_coverage_prunes_columns(spark):
    plan = _plan(spark, "doc_embedding_coverage")
    # the documents scan must read ONLY the join id — a scan dragging
    # text/lang/source through a full-outer join is the 100 TB mistake
    m = re.search(r"documents\.parquet.*?ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    assert m.group(1) == "doc_id:bigint", m.group(1)
    m = re.search(r"embeddings\.parquet.*?ReadSchema: struct<([^>]*)>", plan)
    assert m and set(x.split(":")[0] for x in m.group(1).split(",")) == {
        "vec_id",
        "embedding",
    }, m and m.group(1)


def test_novelty_and_savings_windows_are_fp_keyed(spark):
    for name in ("crawl_novelty_by_shard", "dedup_savings_by_source"):
        plan = _plan(spark, name)
        wins = re.findall(r"Window \[.*?windowspecdefinition\(([^,]*),", plan)
        assert wins, f"{name}: no window found\n{plan}"
        for spec in wins:
            assert "fp#" in spec, (
                f"{name}: window not fingerprint-partitioned: {spec}"
            )


def test_savings_reads_only_needed_columns(spark):
    plan = _plan(spark, "dedup_savings_by_source")
    m = re.search(r"documents\.parquet.*?ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {x.split(":")[0] for x in m.group(1).split(",")}
    assert cols == {"doc_id", "source", "text"}, cols

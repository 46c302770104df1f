"""SHALLOW-CLONE maintenance pins (r11) — the lenses
tests/test_convert_clone.py (read-equivalence, DV carry, divergence,
clone-at-version) stops short of:

- vacuum SAFETY: a clone vacuum must never delete source files, even
  with zero retention and everything aged, even after the clone
  stopped referencing them;
- MATERIALIZATION: OPTIMIZE on a clone rewrites into clone-local files
  (the delta-spark "clone then compact to own your data" recipe);
- SetTransaction markers are NOT copied (a clone must not inherit the
  source pipeline's idempotent-writer state);
- CLONE provenance in DESCRIBE HISTORY (source + sourceVersion);
- the fail-loud target-exists rule.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from duck_delta_share_spark.sources.delta_log import (
    clone_delta,
    describe_history,
    last_txn_version,
    optimize,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)

SCHEMA = "id long, tag string"


def _rows(spark, df):
    return sorted(map(tuple, df.collect()))


def _seed(spark, path, n=6):
    write_delta(
        spark.createDataFrame([(i, f"t{i}") for i in range(n)], SCHEMA),
        path,
        txn=("seeder", 7),
    )
    return path


def test_clone_provenance_txn_isolation_and_target_guard(spark, tmp_path):
    src = _seed(spark, tmp_path / "src")
    dst = tmp_path / "dst"
    res = clone_delta(src, dst)
    assert res["version"] == 0
    # fresh metaData id; txn markers NOT copied; provenance recorded
    assert snapshot(dst).metadata_id != snapshot(src).metadata_id
    assert last_txn_version(dst, "seeder") == -1
    assert last_txn_version(src, "seeder") == 7
    hist = describe_history(dst)
    assert hist[0]["operation"] == "CLONE"
    assert hist[0]["operationParameters"]["sourceVersion"] == "0"
    assert str(src) in hist[0]["operationParameters"]["source"]
    with pytest.raises(ValueError, match="already a Delta table"):
        clone_delta(src, dst)


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    from tests.vacuum_util import age_all_data

    src = _seed(spark, tmp_path / "src")
    dst = tmp_path / "dst"
    clone_delta(src, dst)
    # supersede the cloned references inside the clone, then vacuum the
    # clone with zero retention and everything aged — the source's
    # parquet (outside the clone root, still referenced by the source)
    # must survive even though the clone no longer references it
    write_delta(
        spark.createDataFrame([(9, "z")], SCHEMA), dst, mode="overwrite"
    )
    age_all_data(src)
    age_all_data(dst)
    n_src_before = len(list(Path(src).rglob("*.parquet")))
    assert n_src_before > 0
    vacuum(dst, retain_hours=0.0)
    assert len(list(Path(src).rglob("*.parquet"))) == n_src_before
    assert _rows(spark, read_delta(spark, src)) == sorted(
        (i, f"t{i}") for i in range(6)
    )


def test_clone_materializes_via_optimize(spark, tmp_path):
    src = _seed(spark, tmp_path / "src")
    # fragment the source so the clone starts with >1 referenced file
    write_delta(spark.createDataFrame([(50, "more")], SCHEMA), src)
    dst = tmp_path / "dst"
    clone_delta(src, dst)
    before = _rows(spark, read_delta(spark, dst))
    assert any(
        str(Path(src)) in f["url"] for f in snapshot(dst).files
    ), "pre-OPTIMIZE clone must reference source files"
    optimize(spark, dst)
    files = [f["url"] for f in snapshot(dst).files]
    assert files and all(str(Path(dst)) in u for u in files), (
        "post-OPTIMIZE clone must be self-contained (clone-local files)"
    )
    assert _rows(spark, read_delta(spark, dst)) == before

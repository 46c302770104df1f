"""DV-over-vacuum interplay lens (r9) — the second of the round's two
vacuum races: repeated merge-on-read DELETEs supersede a file's deletion
vector (remove(F, dv=d1) + add(F, dv=d2)), leaving d1's bin referenced
only by OLD snapshots. DV bins carry no remove tombstone (removes name
the DATA path), so they age out by mtime alone. Contract:

- vacuum NEVER deletes the live DV (referenced via the current
  snapshot) even when everything else is expired;
- the superseded bin IS reclaimed once aged — but a pinned/time-travel
  read that still references it must fail LOUD and actionably, never
  emit the file unmasked (silently RESURRECTING deleted rows is the
  worst possible outcome);
- the latest-snapshot read stays correct throughout.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from duck_delta_share_spark.sources.delta_log import (
    delete_where,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)
from duck_delta_share_spark.sources.delta_share import _read_task
from tests.vacuum_util import (
    age_all_data,
    age_tombstones,
    pin_tasks,
    refresh_current_files,
)


def _dv_bins(t):
    return sorted(p.name for p in Path(t).rglob("deletion_vector_*.bin"))


def _mk(spark, tmp_path):
    t = tmp_path / "t"
    write_delta(
        spark.createDataFrame([(i, i % 5) for i in range(100)], "id int, k int"),
        t,
    )
    delete_where(spark, t, "id % 10 = 0")   # v1: DV d1 on the file
    delete_where(spark, t, "id % 10 = 1")   # v2: d2 supersedes d1
    return t


def _live_dv_names(t):
    return {
        Path(f["deletionVector"]["pathOrInlineDv"]).name
        for f in snapshot(t).files
        if f.get("deletionVector")
    }


def _expire_superseded(t):
    age_all_data(t)
    refresh_current_files(t, snapshot)
    age_tombstones(t, [1, 2])


def test_vacuum_zero_retention_keeps_live_dv_reaps_superseded(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bins = _dv_bins(t)
    assert len(bins) >= 2, f"expected superseded + live DV bins, got {bins}"
    live = _live_dv_names(t)
    assert live, "current snapshot should carry a DV"

    _expire_superseded(t)
    out = vacuum(t, retain_hours=168.0)
    after = set(_dv_bins(t))
    assert live <= after, "vacuum must NEVER reclaim the live DV"
    assert after == live, (
        f"superseded DV bins should be reclaimed, still have {after - live}"
    )
    assert out["files_removed"] >= 1

    # latest read stays correct: ids ending in 0 or 1 are gone
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(100) if i % 10 not in (0, 1)]


def test_pinned_dv_snapshot_fails_loud_never_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _, tasks_v1 = pin_tasks(t, version=1)  # snapshot whose file carries d1
    live = _live_dv_names(t)
    _expire_superseded(t)
    vacuum(t, retain_hours=168.0)
    assert set(_dv_bins(t)) == live

    # the pinned v1 scan must fail LOUD on its vanished DV — counting
    # rows would silently resurrect the ten deleted ids
    with pytest.raises(RuntimeError, match="deletion vector .*no longer exists"):
        for task in tasks_v1:
            for _ in _read_task(task):
                pass

    # end-to-end time travel hits the same loud failure
    with pytest.raises(Exception, match="deletion vector|no longer exists"):
        read_delta(spark, t, version=1).collect()

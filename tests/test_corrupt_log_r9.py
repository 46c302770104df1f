"""Corrupt-_delta_log lens (r9) — the multimodal corrupt-bytes lens
(r8) pointed at the TABLE LOG: every corruption either recovers to the
exact correct state through a redundant source or fails LOUD with file
context — never a silently smaller/older/wrong table.

Covered matrix (existing behavior asserted + two r9 hardenings):
- garbled commit JSON -> loud, names table + version + line (r9 wrap;
  the bare JSONDecodeError named nothing)
- truncated (torn) final commit line -> same loud path
- 0-byte commit file -> loud "contains no actions" (r9: previously a
  silent no-op replay that erased the version's effects)
- corrupt checkpoint parquet with commits retained -> RECOVERS via full
  commit replay, rows identical
- corrupt checkpoint after log truncation (no redundant source) -> loud,
  mentions the checkpoint failure
- version gap (missing commit) -> loud "missing commit(s)"
- unknown future action key -> ignored per protocol (reader/writer
  version gates are the compatibility fence, not action names)
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from duck_delta_share_spark.sources.delta_log import (
    checkpoint,
    read_delta,
    snapshot,
    write_delta,
)


def _mk_table(spark, tmp_path, versions=3):
    t = tmp_path / "t"
    for v in range(versions):
        write_delta(
            spark.createDataFrame(
                [(v * 10 + i, f"v{v}") for i in range(3)], "id int, tag string"
            ),
            t,
        )
    return t


def _commit(t, v) -> Path:
    return Path(t) / "_delta_log" / f"{v:020d}.json"


def test_garbled_commit_json_fails_loud_with_context(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    _commit(t, 1).write_bytes(b"\x00\xff garbage {not json\n")
    with pytest.raises(ValueError, match=r"corrupt commit 1 .*line 1"):
        snapshot(t)


def test_torn_final_commit_line_fails_loud(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    raw = _commit(t, 2).read_bytes()
    _commit(t, 2).write_bytes(raw[: len(raw) - len(raw.splitlines()[-1]) // 2 - 1])
    with pytest.raises(ValueError, match="corrupt commit 2"):
        snapshot(t)


def test_empty_commit_file_is_not_a_silent_noop(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    _commit(t, 1).write_bytes(b"")
    with pytest.raises(ValueError, match="commit 1 .*no actions"):
        snapshot(t)
    _commit(t, 1).write_bytes(b"\n\n")  # blank lines only = same torn write
    with pytest.raises(ValueError, match="commit 1 .*no actions"):
        snapshot(t)


def test_corrupt_checkpoint_recovers_via_commit_replay(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    cp_version = checkpoint(t)
    cp = Path(t) / "_delta_log" / f"{cp_version:020d}.checkpoint.parquet"
    assert cp.exists()
    want = sorted(
        (r.id, r.tag) for r in read_delta(spark, t).collect()
    )
    cp.write_bytes(b"PAR1 this is not a parquet file")
    # commits 0..N are all retained: the reader must fall back to pure
    # commit replay and reconstruct the IDENTICAL state
    got = sorted((r.id, r.tag) for r in read_delta(spark, t).collect())
    assert got == want


def test_corrupt_checkpoint_after_truncation_fails_loud(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    cp_version = checkpoint(t)
    log = Path(t) / "_delta_log"
    for v in range(cp_version + 1):
        c = _commit(t, v)
        if c.exists():
            c.unlink()  # legitimate log truncation (checkpoint covers it)
    snapshot(t)  # sanity: checkpoint alone still serves reads
    (log / f"{cp_version:020d}.checkpoint.parquet").write_bytes(b"junk")
    with pytest.raises(ValueError, match="missing commit"):
        snapshot(t)


def test_version_gap_fails_loud(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    _commit(t, 1).unlink()
    with pytest.raises(ValueError, match=r"missing commit\(s\) \[1\]"):
        snapshot(t)


def test_unknown_future_action_is_ignored_per_protocol(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    want = sorted((r.id, r.tag) for r in read_delta(spark, t).collect())
    with open(_commit(t, 2), "a") as f:
        f.write(json.dumps({"someFutureAction": {"x": 1}}) + "\n")
    got = sorted((r.id, r.tag) for r in read_delta(spark, t).collect())
    assert got == want

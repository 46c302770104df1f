"""Shared helpers for the r9 vacuum-race lenses (reader race + DV race):
file-mtime aging, remove-tombstone aging, and driver-side task pinning —
one implementation so a change to the remove-action shape or vacuum
retention semantics updates every lens together (r9 review)."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource


def age_files(table, hours=400, pattern="*.parquet"):
    old = time.time() - hours * 3600
    for p in Path(table).rglob(pattern):
        if p.is_file() and "_delta_log" not in p.parts:
            os.utime(p, (old, old))


def age_all_data(table, hours=400):
    age_files(table, hours, pattern="*")


def age_tombstones(table, versions, hours=400):
    """Rewrite remove.deletionTimestamp in the given commit versions to
    `hours` ago, so vacuum's tombstone clock sees them as expired."""
    old_ms = int((time.time() - hours * 3600) * 1000)
    for v in versions:
        cp = Path(table) / "_delta_log" / f"{v:020d}.json"
        lines = []
        for line in cp.read_text().splitlines():
            a = json.loads(line)
            if "remove" in a:
                a["remove"]["deletionTimestamp"] = old_ms
            lines.append(json.dumps(a))
        cp.write_text("\n".join(lines) + "\n")


def refresh_current_files(table, snapshot_fn):
    """Touch the CURRENT snapshot's data files to now, so only superseded
    artifacts stay mtime-eligible after age_files."""
    now = time.time()
    for f in snapshot_fn(table).files:
        os.utime(f["url"], (now, now))


def pin_tasks(table, version=None):
    """The driver-side planning step, pinned: the task list Spark would
    hand executors (DataSource partitions())."""
    opts = {"deltaPath": str(table)}
    if version is not None:
        opts["versionAsOf"] = str(version)
    ds = DeltaShareDataSource(options=opts)
    schema = ds.schema()
    return schema, ds.reader(schema).partitions()

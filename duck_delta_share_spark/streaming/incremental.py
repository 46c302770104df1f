"""Continuously-maintained rollup over a Delta change feed — the
streaming twin of ``operators/incremental.py`` (continuous aggregate /
materialized view).

Shape: ``readStream`` of the table's CDF (versions as offsets) →
``foreachBatch`` applies the batch's signed deltas to the persisted
rollup. Each epoch is TRANSACTIONAL: the new rollup lands in a
batch-id-named directory and a tiny ``_meta.json`` pointer is flipped
LAST, so

- a replayed micro-batch (failure between write and checkpoint commit) is
  detected by ``batch_id <= last_batch`` and skipped — exactly-once
  maintenance on top of Spark's at-least-once ``foreachBatch``;
- a crash mid-write leaves the pointer on the previous rollup; the replay
  simply overwrites the orphan directory.

Single-writer contract (ENFORCED since r8): exactly one maintenance
stream may own a rollup directory. Each stream acquires ``_owner.json``
at start (last-wins + a monotone acquisition EPOCH, so a restart after
a crash never wedges on a stale marker) and re-verifies ownership at
every batch entry AND immediately before the pointer flip — a second
stream racing the directory makes the first one fail LOUD on its next
batch instead of silently overwriting the pointer with a rollup that
misses the other writer's applied versions. The check-then-act window
between the pre-flip re-check and the replace cannot be closed on a
plain filesystem, so every pointer flip also carries the writer's
epoch: a stale flip that slips through brands the pointer with the OLD
epoch, and the true owner's next batch detects the fence mismatch and
fails loud rather than folding onto the regressed pointer.

At 100 TB each refresh reads O(changes in the batch) plus the current
rollup (keyed aggregate — small), never the base table.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from duck_delta_share_spark.operators.incremental import apply_changes_to_rollup
from duck_delta_share_spark.plans.registry import DEC


def read_rollup(spark: SparkSession, rollup_path: str | Path) -> DataFrame | None:
    """Current rollup per the _meta.json pointer; None before first batch."""
    meta = Path(rollup_path) / "_meta.json"
    if not meta.exists():
        return None
    current = json.loads(meta.read_text())["current"]
    return spark.read.parquet(str(Path(rollup_path) / current))


def _write_atomic(target: Path, payload: dict) -> None:
    # atomic pointer/marker flip: write_text truncates first, so a crash
    # mid-write would corrupt the file and wedge every restart on
    # json.loads — contradicting the crash-safety the GC relies on
    import os as _os
    import uuid as _uuid

    tmp = target.with_name(f".{target.name}.{_uuid.uuid4().hex[:8]}.tmp")
    tmp.write_text(json.dumps(payload))
    _os.replace(tmp, target)


def acquire_rollup_ownership(rollup_path: str | Path, owner_id: str) -> int:
    """Claim the rollup directory for one maintenance stream (last-wins:
    a restart after a crash must never wedge on the dead stream's stale
    marker — liveness can't be read off a filesystem). Returns this
    acquisition's EPOCH (monotone per directory).

    Detection is two-layered because plain-filesystem check-then-act
    can't be atomic: the PREVIOUS owner usually dies at its next batch
    entry or pre-flip re-check; if it slips a stale pointer flip through
    the millisecond window between the re-check and the replace, the
    flip carries the OLD epoch and the new owner's next batch detects
    the fence mismatch and fails loud (never a silent fold onto the
    regressed pointer — r8 self-review #2). Acquisition therefore
    re-stamps the current _meta.json with the new epoch."""
    import os as _os

    out = Path(rollup_path)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / "_owner.json"
    epoch = 0
    if marker.exists():
        try:
            epoch = int(json.loads(marker.read_text()).get("epoch", 0))
        except (OSError, ValueError):
            epoch = 0
    epoch += 1
    _write_atomic(
        marker, {"owner": owner_id, "pid": _os.getpid(), "epoch": epoch}
    )
    meta_file = out / "_meta.json"
    if meta_file.exists():
        try:
            meta = json.loads(meta_file.read_text())
        except (OSError, ValueError):
            meta = None
        if isinstance(meta, dict):
            # brand with BOTH fields: two acquirers racing the (non-atomic)
            # read-increment-write of _owner.json can mint the SAME epoch,
            # so the epoch alone cannot distinguish their pointer flips —
            # owner_id disambiguates colliding epochs (r8 ADVICE)
            meta["owner_epoch"] = epoch
            meta["owner"] = owner_id
            _write_atomic(meta_file, meta)
    return epoch


def _check_rollup_ownership(out: Path, owner_id: str) -> None:
    marker = out / "_owner.json"
    held = None
    if marker.exists():
        try:
            held = json.loads(marker.read_text()).get("owner")
        except (OSError, ValueError):
            held = None
    if held != owner_id:
        raise RuntimeError(
            f"rollup directory {out} is owned by maintenance stream "
            f"{held!r}, not {owner_id!r}: a second stream acquired this "
            "directory (single-writer contract). Continuing would flip "
            "the pointer to a rollup missing the other writer's applied "
            "versions. Stop one of the streams; the survivor restart "
            "re-acquires ownership."
        )


def rollup_upserter(
    spark: SparkSession,
    rollup_path: str | Path,
    keys: list[str],
    sum_cols: dict[str, str],
    owner_id: str,
    owner_epoch: int = 0,
):
    """The foreachBatch applier, exposed for injection tests (two
    interleaved appliers racing one directory must detect each other)."""
    out = Path(rollup_path)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark.sql import functions as F

        _check_rollup_ownership(out, owner_id)
        meta_file = out / "_meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        if (
            meta
            and owner_epoch
            and (
                int(meta.get("owner_epoch", owner_epoch)) != owner_epoch
                # owner_id disambiguates COLLIDING epochs: two acquirers
                # racing acquire_rollup_ownership's read-increment-write
                # can both mint epoch N+1, so the fence must compare the
                # (owner, epoch) brand, not the epoch alone (r8 ADVICE;
                # `in meta` guards pre-r9 metas without the owner field)
                or ("owner" in meta and meta["owner"] != owner_id)
            )
        ):
            # (owner, epoch) fence: the pointer was flipped under a
            # DIFFERENT acquisition brand after ours re-stamped it — a
            # stale writer slipped a flip through the pre-flip-check
            # window (or a newer stream took over). Folding onto the
            # regressed pointer would silently drop applied versions;
            # fail loud.
            raise RuntimeError(
                f"rollup pointer of {out} carries acquisition brand "
                f"({meta.get('owner')!r}, epoch {meta.get('owner_epoch')}) "
                f"but this stream holds ({owner_id!r}, epoch "
                f"{owner_epoch}): a stale writer flipped the pointer (or "
                "a newer stream acquired the directory). State may be "
                "inconsistent — verify the rollup against the source "
                "and reset checkpoint + rollup directory together."
            )
        if not meta and batch_id > 0:
            # batch 0 ALWAYS records _meta.json before its checkpoint can
            # commit, so a later batch arriving with NO meta means the
            # rollup directory was lost or points somewhere new while the
            # CHECKPOINT kept its history — silently rebuilding from an
            # empty rollup would fold only the new deltas and report
            # wrong totals forever. Fail loud: pair a fresh rollup dir
            # with a fresh checkpoint (or restore the old directory).
            raise RuntimeError(
                f"rollup directory {out} has no _meta.json but the stream "
                f"checkpoint is at batch {batch_id}: the rollup state was "
                "lost or the paths are mismatched — refusing to rebuild "
                "from empty (totals would silently drop every version "
                "before this batch). Reset the checkpoint together with "
                "the rollup directory."
            )
        # replay watermark = max applied SOURCE version (durable across
        # checkpoint recreation), not the checkpoint-scoped batch id —
        # after a checkpoint reset, batch 0 covers ALL pending versions
        # and `batch_id <= last_batch` would drop their deltas forever.
        # Signed deltas are NOT idempotent, so a batch that partially
        # overlaps the watermark (fresh checkpoint spanning old + new
        # versions) applies ONLY the rows above it — per-version deltas
        # are independent, so the filtered remainder is exactly the
        # unapplied increment.
        bounds = batch_df.agg(
            F.min("_commit_version"), F.max("_commit_version")
        ).first()
        lo, hi = bounds[0], bounds[1]
        last = meta.get("last_version")
        if last is None and "last_batch" in meta:
            # legacy meta written before version watermarks: fall back to
            # the old batch-id guard once; the next applied batch records
            # last_version
            if batch_id <= meta["last_batch"]:
                return
            last = -1
        last = -1 if last is None else int(last)
        if hi is not None and int(hi) <= last:
            return  # true replay: rollup already reflects every version
        if lo is not None and int(lo) <= last:
            batch_df = batch_df.filter(F.col("_commit_version") > last)
        # an EMPTY batch leaves the rollup bytes untouched — only the
        # replay watermark advances (rewriting the full rollup per no-op
        # trigger would copy the whole aggregate every epoch)
        if meta and hi is None:
            return  # no versions in the batch: nothing to record
        prev = read_rollup(spark, out)
        if prev is None:
            # empty, correctly-typed rollup frame for the first batch
            prev = batch_df.limit(0).groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(src).cast(DEC)).alias(o) for o, src in sum_cols.items()],
            )
        new = apply_changes_to_rollup(prev, batch_df, keys, sum_cols)
        # generation name keyed on the SOURCE-version watermark, not the
        # batch id: after a checkpoint reset, renumbered batch 0 would
        # reuse the LIVE generation's name and overwrite it in place —
        # voiding the write-then-flip crash safety (the guard above makes
        # each applied watermark unique, so names can never collide)
        target = f"data_v{int(hi) if hi is not None else 0}"
        new.write.mode("overwrite").parquet(str(out / target))
        prev_current = meta.get("current")
        # re-verify ownership IMMEDIATELY before the flip: the batch's
        # read-fold-write is seconds long, and a second stream acquiring
        # mid-batch would otherwise lose whatever it applied meanwhile
        # to this stale pointer (the orphan generation dir we just wrote
        # is harmless — the owner's next GC pass reclaims it)
        _check_rollup_ownership(out, owner_id)
        _write_atomic(
            meta_file,
            {
                "current": target,
                "last_version": int(hi) if hi is not None else -1,
                # (owner, epoch) fence: a flip that slips through the
                # check above carries OUR brand, so the true owner's next
                # batch detects the mismatch and fails loud — owner_id
                # keeps the fence sound even when two racing acquirers
                # minted the same epoch (r8 ADVICE)
                "owner_epoch": owner_epoch,
                "owner": owner_id,
            },
        )
        # GC superseded generations AFTER the pointer flip, keeping the
        # immediately-previous one for crash safety (a reader that loaded
        # _meta.json just before the flip may still be scanning it);
        # without this the rollup directory grows one full copy per epoch
        for d in out.iterdir():
            if (
                d.is_dir()
                and d.name.startswith("data_")
                and d.name not in (target, prev_current)
            ):
                shutil.rmtree(d, ignore_errors=True)
        # orphan POINTER tmps from a writer that crashed between the tmp
        # write and the atomic replace (we hold ownership — just
        # re-verified — so any meta tmp other than one we just replaced
        # is abandoned). OWNER tmps are deliberately NOT collected here:
        # a competing acquirer writing ._owner.json.*.tmp right now is
        # by definition not the owner yet, so its tmp is LIVE — deleting
        # it would crash that stream's last-wins acquisition with
        # FileNotFoundError (r8 self-review #4); a crashed acquirer
        # leaves one ~100-byte file, not a growth concern.
        for f in out.glob("._meta.json.*.tmp"):
            try:
                f.unlink()
            except OSError:
                pass

    return upsert


def maintain_rollup_stream(
    spark: SparkSession,
    table_path: str | Path,
    keys: list[str],
    sum_cols: dict[str, str],
    rollup_path: str | Path,
    checkpoint_path: str | Path,
    starting_version: int = 0,
):
    """Start the maintenance stream; returns the StreamingQuery.

    Acquires single-writer ownership of ``rollup_path`` first — see the
    module docstring for the contract a racing second stream hits."""
    import uuid

    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    owner_id = uuid.uuid4().hex
    epoch = acquire_rollup_ownership(rollup_path, owner_id)
    upsert = rollup_upserter(
        spark, rollup_path, keys, sum_cols, owner_id, owner_epoch=epoch
    )

    changes = (
        spark.readStream.format("deltashare")
        .option("deltaPath", str(table_path))
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
        .load()
    )
    return (
        changes.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(checkpoint_path))
        .start()
    )

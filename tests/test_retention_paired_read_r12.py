"""Horizon-retention × paired-read lens (r12, VERDICT r11 item 4): the
two features were each tested alone — ``maintain_dedup_store(drop_where=
...)`` ages content out of a store, ``paired_snapshot_versions`` pins a
consistent cross-table read — but never TOGETHER. The gaps this file
closes, on the near-dup pair (pairs table = primary, band-bucket store =
secondary, per operators/dedup.py incremental_neardup_commit):

- A paired read pinned BEFORE a horizon-retention pass must keep
  reading its exact pre-delete snapshot (delete_where is a normal
  logged commit — time travel still serves it) until vacuum passes the
  retention window, after which it must fail LOUD on the vacuumed file,
  never silently lose candidates or resurrect dropped rows.
- Re-ingest semantics across the PAIR: a doc whose band rows aged out
  is near-dup "forgotten" — a later shard must NOT candidate against
  it, must still candidate against unexpired store content, and the
  crash-replay gate must stay exactly-once across retention passes
  (deletes never disturb SetTransaction markers).
- A live maintainer running drop_where retention must be safe racing
  the transactional ingest mid-batch (between the pairs commit and the
  store commit): ingest always wins OCC, retention eventually applies,
  and the final state is exact.
"""

from __future__ import annotations

import threading
import time

import pytest

from duck_delta_share_spark.operators.dedup import (
    incremental_neardup_commit,
    maintain_dedup_store,
    minhash_md5_band_rows,
    minhash_md5_signatures,
)
from duck_delta_share_spark.sources.delta_log import (
    ConcurrentWriteError,
    last_txn_version,
    paired_snapshot_versions,
    read_delta,
    snapshot,
    write_delta,
)
from tests.vacuum_util import age_files, age_tombstones, refresh_current_files

SCHEMA = "doc_id long, text string"
TEXT_A = "the quick brown fox jumps over the lazy dog and runs far away today"
TEXT_B = "completely different prose about spark delta maintenance policies here"
HISTORY = [(1, TEXT_A), (2, TEXT_B)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _seed(spark, base):
    pairs, store = base / "pairs", base / "bands"
    sigs = minhash_md5_signatures(
        _docs(spark, HISTORY), num_hashes=8, shingle_n=3
    )
    write_delta(minhash_md5_band_rows(sigs, "doc_id", 8, 4), store)
    return pairs, store


def _commit(spark, rows, pairs, store, batch):
    return incremental_neardup_commit(
        spark, _docs(spark, rows), pairs, store, "nd", batch
    )


def _age_everything(table):
    age_files(table)
    for v in range(snapshot(table).version + 1):
        age_tombstones(table, [v])
    refresh_current_files(table, snapshot)


def test_pinned_paired_read_survives_horizon_delete_then_fails_loud(
    spark, tmp_path
):
    pairs, store = _seed(spark, tmp_path)
    _commit(spark, [(101, TEXT_A), (102, "unique first shard text one")], pairs, store, 1)
    _commit(spark, [(201, TEXT_B), (202, "unique second shard text two")], pairs, store, 2)

    pv, sv = paired_snapshot_versions(pairs, store, "nd")
    before_pairs = sorted(map(tuple, read_delta(spark, pairs, version=pv).collect()))
    before_bands = sorted(map(tuple, read_delta(spark, store, version=sv).collect()))
    assert any(o < 100 for _, o, _, _ in before_pairs)  # history candidates exist

    # horizon retention drops the history docs' band rows; generous
    # vacuum retention keeps every pre-delete file on disk
    rep = maintain_dedup_store(
        spark, store, drop_where="doc_id < 100", retain_hours=400
    )
    assert rep["deleted"] is not None

    # the pinned pair still serves its exact pre-delete snapshot
    assert sorted(map(tuple, read_delta(spark, pairs, version=pv).collect())) == before_pairs
    assert sorted(map(tuple, read_delta(spark, store, version=sv).collect())) == before_bands

    # a fresh paired read is still marker-consistent and monotone
    pv2, sv2 = paired_snapshot_versions(pairs, store, "nd")
    assert pv2 >= pv and sv2 > sv
    live = {r.doc_id for r in read_delta(spark, store, version=sv2).collect()}
    assert live == {101, 102, 201, 202}

    # vacuum past the retention window: the old pin must fail LOUD on
    # the removed file — never a silent partial snapshot
    _age_everything(store)
    maintain_dedup_store(spark, store, retain_hours=0.0)
    with pytest.raises(Exception) as ei:
        read_delta(spark, store, version=sv).count()
    msg = str(ei.value)
    assert "no longer exists" in msg or "deleted after the scan was planned" in msg, (
        f"wrong error shape for vacuumed pin: {msg[:300]}"
    )


def test_horizon_dropout_reingest_consistent_across_pair(spark, tmp_path):
    pairs, store = _seed(spark, tmp_path)
    _commit(spark, [(101, TEXT_A), (102, "unique first shard text one")], pairs, store, 1)
    p1 = read_delta(spark, pairs).collect()
    assert {(r.id_new, r.id_old) for r in p1 if r.vs == "history"} == {(101, 1)}

    # age the HISTORY out of the near-dup memory
    maintain_dedup_store(spark, store, drop_where="doc_id < 100", retain_hours=400)

    # a later shard re-introduces doc-1's text: it must pair with the
    # unexpired shard-1 copy (still remembered) but NOT with aged-out
    # doc 1 — the documented horizon semantic, now proven on the pair
    _commit(spark, [(201, TEXT_A), (202, "unique second shard text two")], pairs, store, 2)
    p2 = [r for r in read_delta(spark, pairs).collect() if r.id_new >= 200]
    hist2 = {(r.id_new, r.id_old) for r in p2 if r.vs == "history"}
    assert (201, 101) in hist2
    assert all(o >= 100 for _, o in hist2), f"aged-out doc resurfaced: {hist2}"

    # retention passes never disturb txn markers: replay stays a no-op
    maintain_dedup_store(spark, store, drop_where="doc_id < 100", retain_hours=400)
    r = _commit(spark, [(201, TEXT_A), (202, "unique second shard text two")], pairs, store, 2)
    assert r["pairs_version"] is None and r["store_version"] is None
    assert last_txn_version(store, "nd") == 2

    pv, sv = paired_snapshot_versions(pairs, store, "nd")
    assert {r.doc_id for r in read_delta(spark, store, version=sv).collect()} == {
        101, 102, 201, 202,
    }
    assert {r.id_new for r in read_delta(spark, pairs, version=pv).collect()} >= {101, 201}


def test_drop_where_maintainer_races_neardup_ingest(spark, tmp_path):
    """Retention maintenance runs in a loop while the transactional
    ingest advances batches — including windows where the maintainer's
    delete lands BETWEEN a batch's pairs commit and its store commit.
    Ingest must always win; the maintainer may lose OCC races but never
    corrupts; the final state is exact."""
    pairs, store = _seed(spark, tmp_path)
    stop, errors = threading.Event(), []

    def maintainer():
        while not stop.is_set():
            try:
                maintain_dedup_store(
                    spark, store, drop_where="doc_id < 100", retain_hours=400
                )
            except ConcurrentWriteError:
                continue  # ingest won the OCC race — retry next loop
            except Exception as e:  # noqa: BLE001 — collected for the assert
                errors.append(f"{type(e).__name__}: {e}")
                return
            time.sleep(0.02)

    t = threading.Thread(target=maintainer)
    t.start()
    try:
        for i in range(1, 6):
            _commit(
                spark,
                [(100 * i + 10, TEXT_A), (100 * i + 11, f"shard {i} only text")],
                pairs,
                store,
                i,
            )
    finally:
        stop.set()
        t.join()
    assert not errors, errors

    # one quiet final pass so retention has definitely applied
    maintain_dedup_store(spark, store, drop_where="doc_id < 100", retain_hours=400)
    rows = read_delta(spark, store).collect()
    assert all(r.doc_id >= 100 for r in rows)
    # every shard's docs still remembered: 4 band rows each
    from collections import Counter

    per_doc = Counter(r.doc_id for r in rows)
    assert per_doc == {
        d: 4 for i in range(1, 6) for d in (100 * i + 10, 100 * i + 11)
    }
    # exactly-once held through the races
    r = _commit(
        spark, [(510, TEXT_A), (511, "shard 5 only text")], pairs, store, 5
    )
    assert r["pairs_version"] is None and r["store_version"] is None

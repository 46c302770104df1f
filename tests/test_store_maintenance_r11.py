"""Store-maintenance lens (r11, VERDICT r10 item 3): the incremental
dedup pipelines' Delta stores (exact fingerprint store, MinHash
band-bucket store) must survive their own maintenance — OPTIMIZE,
log checkpoint + truncation, vacuum, and horizon retention — BETWEEN
and DURING incremental commits:

- SetTransaction markers survive compaction + checkpoint + log
  truncation (protocol: txn actions are carried into checkpoints), so
  crash-REPLAY of an in-flight shard stays exactly-once after any
  maintenance.
- Maintained stores produce byte-identical pipeline results to a
  never-maintained control run.
- A live maintainer thread racing the ingest writer never corrupts
  state: ingest always wins; maintenance retries on OCC conflicts.
- Horizon retention (``drop_where``) makes an aged-out fingerprint
  re-ingestable — the documented SEMANTIC of a dedup horizon.
- Reads pinned past the retention window fail LOUD on vacuumed files,
  never resurrect.

Policy under test: operators/dedup.py maintain_dedup_store.
"""

from __future__ import annotations

import threading
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import fingerprint
from duck_delta_share_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_commit,
    incremental_neardup_candidates,
    maintain_dedup_store,
    minhash_md5_band_rows,
    minhash_md5_signatures,
)
from duck_delta_share_spark.sources.delta_log import (
    ConcurrentWriteError,
    last_txn_version,
    read_delta,
    snapshot,
    write_delta,
)
from tests.vacuum_util import age_files, age_tombstones, refresh_current_files

SCHEMA = "doc_id long, lang string, source string, text string"
HISTORY = [
    (1, "en", "web", "the quick brown fox"),
    (2, "en", "web", "jumps over the lazy dog"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _shard(i: int):
    return [
        (100 + i, "en", "crawl", f"fresh text of shard {i}"),
        (200 + i, "en", "web", "THE quick  brown fox"),  # dup of doc 1
    ]


def _seed(spark, base: Path, name="corpus"):
    corpus, store = base / name, base / f"{name}_fps"
    seed = exact_dedup(_docs(spark, HISTORY), "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)
    return corpus, store


def _state(spark, corpus, store):
    ids = sorted(r.doc_id for r in read_delta(spark, corpus).collect())
    fps = sorted(
        (r.fp, r.doc_id) for r in read_delta(spark, store).collect()
    )
    return ids, fps


def _age_everything(table):
    age_files(table)
    for v in range(snapshot(table).version + 1):
        age_tombstones(table, [v])
    refresh_current_files(table, snapshot)


def test_replay_and_results_survive_maintenance_between_commits(
    spark, tmp_path
):
    """Maintain both tables between every shard; final state must equal
    the never-maintained control, markers must survive, and the
    crash-replay of the last shard must still be a full no-op."""
    corpus, store = _seed(spark, tmp_path, "a")
    ctl_corpus, ctl_store = _seed(spark, tmp_path, "ctl")

    for i in (1, 2, 3):
        incremental_dedup_commit(
            spark, _docs(spark, _shard(i)), corpus, store, "loader", i
        )
        incremental_dedup_commit(
            spark, _docs(spark, _shard(i)), ctl_corpus, ctl_store, "loader", i
        )
        _age_everything(store)
        _age_everything(corpus)
        rep = maintain_dedup_store(spark, store, retain_hours=0.0)
        maintain_dedup_store(spark, corpus, retain_hours=0.0)
        assert rep["checkpoint_version"] is not None
        # markers survive compaction + checkpoint
        assert last_txn_version(store, "loader") == i
        assert last_txn_version(corpus, "loader") == i

    # crash-replay after maintenance: still exactly-once
    r = incremental_dedup_commit(
        spark, _docs(spark, _shard(3)), corpus, store, "loader", 3
    )
    assert r["corpus_version"] is None and r["store_version"] is None

    assert _state(spark, corpus, store) == _state(spark, ctl_corpus, ctl_store)


def test_markers_survive_log_truncation_past_checkpoint(spark, tmp_path):
    """Delete every pre-checkpoint commit json: snapshot replay now
    starts FROM the checkpoint, which must carry the txn actions —
    a replay that forgot the marker would double-ingest the shard."""
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(
        spark, _docs(spark, _shard(1)), corpus, store, "loader", 1
    )
    maintain_dedup_store(spark, store, retain_hours=1e6)
    log = Path(store) / "_delta_log"
    ck = max(
        int(p.name.split(".")[0]) for p in log.glob("*.checkpoint.parquet")
    )
    for p in log.glob("*.json"):
        if int(p.stem) <= ck:
            p.unlink()
    assert last_txn_version(store, "loader") == 1
    r = incremental_dedup_commit(
        spark, _docs(spark, _shard(1)), corpus, store, "loader", 1
    )
    assert r["store_version"] is None, "truncated log forgot the txn marker"


def test_band_store_candidates_stable_under_maintenance(spark, tmp_path):
    """Near-dup candidates from the maintained band store must equal the
    pre-maintenance candidates exactly (compaction may not add, drop,
    or dupe (band, bucket, doc_id) rows)."""
    store = tmp_path / "bands"
    long_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    hist = _docs(spark, HISTORY + [(3, "en", "web", long_text)])
    sigs = minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(
        minhash_md5_band_rows(sigs, "doc_id", 8, 4), store, txn=("bander", 0)
    )
    # near-copy of doc 3 (one word swapped) — shares most shingles, so
    # at least one of the 4 bands collides
    shard = _docs(
        spark, [(901, "en", "crawl", long_text.replace("omicron", "OMICRON"))]
    )

    def probe():
        return sorted(
            (r.id_new, r.id_old, r.n_shared_bands)
            for r in incremental_neardup_candidates(
                spark, shard, store, max_bucket_size=None
            ).collect()
        )

    before = probe()
    assert before, "fixture must produce at least one candidate pair"
    # fragment with a second txn-marked append, then maintain
    sigs2 = minhash_md5_signatures(shard, num_hashes=8, shingle_n=3)
    write_delta(
        minhash_md5_band_rows(sigs2, "doc_id", 8, 4), store, txn=("bander", 1)
    )
    with_shard = sorted(
        (r.id_new, r.id_old, r.n_shared_bands)
        for r in incremental_neardup_candidates(
            spark, shard, store, max_bucket_size=None
        ).collect()
    )
    _age_everything(store)
    maintain_dedup_store(spark, store, retain_hours=0.0)
    assert last_txn_version(store, "bander") == 1
    # post-maintenance probe sees the same candidates (self-pairs still
    # guarded even though the shard's own rows are now in the store)
    assert (
        sorted(
            (r.id_new, r.id_old, r.n_shared_bands)
            for r in incremental_neardup_candidates(
                spark, shard, store, max_bucket_size=None
            ).collect()
        )
        == with_shard
    )


def test_live_maintainer_never_corrupts_ingest(spark, tmp_path):
    """A maintainer thread loops compaction+vacuum on the store WHILE the
    writer ingests shards. Ingest must win every race (final state ==
    control); the maintainer may lose races only via the documented
    OCC ConcurrentWriteError, which it retries."""
    corpus, store = _seed(spark, tmp_path, "live")
    ctl_corpus, ctl_store = _seed(spark, tmp_path, "ctl")
    stop = threading.Event()
    failures: list[str] = []

    def maintainer():
        while not stop.is_set():
            try:
                maintain_dedup_store(spark, store, retain_hours=1e6)
            except ConcurrentWriteError:
                continue  # ingest won the commit race — retry later
            except Exception as e:  # noqa: BLE001
                failures.append(f"maintainer: {type(e).__name__}: {e}")
                return

    t = threading.Thread(target=maintainer)
    t.start()
    try:
        for i in range(1, 7):
            incremental_dedup_commit(
                spark, _docs(spark, _shard(i)), corpus, store, "loader", i
            )
            incremental_dedup_commit(
                spark, _docs(spark, _shard(i)), ctl_corpus, ctl_store, "loader", i
            )
    finally:
        stop.set()
        t.join(timeout=120)
    assert not failures, failures
    assert not t.is_alive()
    assert _state(spark, corpus, store) == _state(spark, ctl_corpus, ctl_store)
    assert last_txn_version(store, "loader") == 6


def test_horizon_retention_makes_aged_fp_reingestable(spark, tmp_path):
    """drop_where retention: a fingerprint outside the dedup horizon is
    deleted from the store, and the SAME text arriving in a later shard
    is ingested again — the defined semantic of a horizon, proven
    end-to-end through incremental_dedup_commit (which must tolerate
    extra store columns)."""
    corpus, store = tmp_path / "c", tmp_path / "s"
    seed = exact_dedup(_docs(spark, HISTORY), "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(
        seed.select(
            fingerprint("text").alias("fp"), "doc_id", F.lit(0).alias("ingest_day")
        ),
        store,
    )
    dup_of_1 = [(900, "en", "web", "the  QUICK brown fox")]
    r1 = incremental_dedup_commit(
        spark, _docs(spark, dup_of_1), corpus, store, "loader", 1
    )
    assert r1["n_survivors"] == 0  # inside the horizon: deduped away

    maintain_dedup_store(
        spark, store, retain_hours=1e6, drop_where="ingest_day < 1"
    )
    assert read_delta(spark, store).count() == 0

    r2 = incremental_dedup_commit(
        spark, _docs(spark, dup_of_1), corpus, store, "loader", 2
    )
    assert r2["n_survivors"] == 1  # aged out: re-ingestable by design
    ids = {r.doc_id for r in read_delta(spark, corpus).collect()}
    assert 900 in ids


def test_read_pinned_past_retention_fails_loud(spark, tmp_path):
    """A reader pinned at a pre-compaction store version whose files
    were vacuumed must ERROR at scan time — never return partial or
    empty rows as if the pin were valid."""
    corpus, store = _seed(spark, tmp_path)
    incremental_dedup_commit(
        spark, _docs(spark, _shard(1)), corpus, store, "loader", 1
    )
    pinned = snapshot(store).version
    pinned_rows = read_delta(spark, store, version=pinned).count()
    assert pinned_rows > 0
    incremental_dedup_commit(
        spark, _docs(spark, _shard(2)), corpus, store, "loader", 2
    )
    _age_everything(store)
    rep = maintain_dedup_store(spark, store, retain_hours=0.0)
    assert rep["vacuum"]["files_removed"] >= 1
    with pytest.raises(Exception) as ei:
        read_delta(spark, store, version=pinned).count()
    msg = str(ei.value)
    # the engine's own loud contract (sources/delta_share.py read path):
    # names the vacuumed file and the retention remedy
    assert "no longer exists" in msg or "deleted after the scan was planned" in msg, (
        f"wrong error shape for vacuumed pin: {msg[:300]}"
    )


def test_cap_modes_identical_including_hot_bucket(spark):
    """The skew-safe broadcast cap must produce EXACTLY the window cap's
    rows on a corpus with one hot (band, bucket) carrying ~10% of rows
    (over the cap) plus normal buckets under it — both at the row level
    and through the candidate pipeline."""
    from duck_delta_share_spark.operators.dedup import _cap_buckets

    rows = []
    for i in range(400):
        rows.append((i, 0, "hotbucket"))  # one hot key, 400 rows
    for b in range(40):
        for i in range(30):
            rows.append((1000 + b * 100 + i, b % 4, f"cold{b}"))
    # NULL bucket keys: window's partitionBy groups NULLs into ONE
    # bucket, so broadcast mode's anti join must be null-safe to match
    # (ADVICE r11) — an over-cap NULL bucket (60 rows) plus one with a
    # NULL band (under cap at high caps, over at cap=50... it has 60
    # rows too, so over at 50 and under at 200+)
    for i in range(60):
        rows.append((5000 + i, 1, None))
        rows.append((6000 + i, None, "nullband"))
    df = spark.createDataFrame(rows, "doc_id long, band int, bucket string")
    for cap in (50, 200, 399, 400, 5000):
        w = sorted(
            map(tuple, _cap_buckets(df, ["band", "bucket"], cap, "window").collect())
        )
        b = sorted(
            map(
                tuple,
                _cap_buckets(df, ["band", "bucket"], cap, "broadcast").collect(),
            )
        )
        assert w == b, f"cap modes diverge at cap={cap}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown cap mode"):
        _cap_buckets(df, ["band", "bucket"], 10, "salted")


def test_candidates_identical_across_cap_modes_on_skewed_corpus(
    spark, tmp_path
):
    """End-to-end: incremental_neardup_candidates under a hot bucket —
    window and broadcast cap modes must agree pair-for-pair, and both
    must DROP the over-cap hot bucket's pairs (loud-or-pigeonhole rule:
    the cap is a documented dial, not a silent cliff — here we assert
    its exact effect)."""
    hot = "identical boilerplate page body repeated across the crawl " * 3
    docs = [(i, "en", "crawl", hot) for i in range(40)]  # hot near-dups
    docs += [
        (100 + i, "en", "web", f"unique page {i} with words {i*7} {i*13}")
        for i in range(20)
    ]
    hist = _docs(spark, docs[:30] + docs[40:50])
    shard = _docs(spark, docs[30:40] + docs[50:])
    store = tmp_path / "bands"
    sigs = minhash_md5_signatures(hist, num_hashes=8, shingle_n=3)
    write_delta(minhash_md5_band_rows(sigs, "doc_id", 8, 4), store)

    def probe(mode, cap):
        return sorted(
            (r.id_new, r.id_old, r.n_shared_bands)
            for r in incremental_neardup_candidates(
                spark, shard, store, max_bucket_size=cap, cap_mode=mode
            ).collect()
        )

    uncapped = probe("window", None)
    assert any(o < 40 for _, o, _ in uncapped)  # hot pairs exist uncapped
    w, b = probe("window", 30), probe("broadcast", 30)
    assert w == b
    # the hot bucket (40 members > 30) is capped out in both modes;
    # cold candidates (if any) survive identically
    assert all(n >= 40 or o >= 40 for n, o, _ in w) or w == []

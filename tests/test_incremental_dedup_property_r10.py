"""Property test (r10): for ANY sequence of shards, sequential
incremental dedup through the fingerprint store equals the
first-occurrence global dedup computed by a from-first-principles Python
model — and the store never diverges from the corpus.

The model: walk shards in order, keep a doc iff (a) it has the lowest
doc_id for its normalized fingerprint within its shard and (b) no
earlier shard (or the history seed) already kept that fingerprint.
Normalization mirrors functions/text.fingerprint: lower, trim, collapse
space runs (md5 is injective on the normalized text for this purpose).
"""

from __future__ import annotations

import os
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duck_delta_share_spark.functions.text import fingerprint
from duck_delta_share_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_commit,
)
from duck_delta_share_spark.sources.delta_log import read_delta, write_delta

_SETTINGS = dict(
    max_examples=int(os.environ.get("HYP_MAX_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# small token pool with case/whitespace variants so normalized collisions
# are common — the interesting paths are dup-vs-history and dup-in-shard
_TEXT = st.lists(
    st.sampled_from(["aa", "AA", "bb", "bB", "cc", " aa", "cc "]),
    min_size=1,
    max_size=3,
).map(lambda toks: "  ".join(toks))

_SHARDS = st.lists(
    st.lists(_TEXT, min_size=1, max_size=4), min_size=2, max_size=4
)


def _norm(text: str) -> str:
    return re.sub(" +", " ", text.strip().lower())


def _model(shards: list[list[tuple[int, str]]]) -> set[int]:
    seen: set[str] = set()
    kept: set[int] = set()
    for shard in shards:
        shard_first: dict[str, int] = {}
        for doc_id, text in sorted(shard):
            shard_first.setdefault(_norm(text), doc_id)
        for fp, doc_id in shard_first.items():
            if fp not in seen:
                seen.add(fp)
                kept.add(doc_id)
    return kept


@given(shards_text=_SHARDS)
@settings(**_SETTINGS)
def test_sequential_incremental_equals_global_first_occurrence(
    spark, tmp_path_factory, shards_text
):
    # assign globally unique, arrival-ordered doc_ids
    shards: list[list[tuple[int, str]]] = []
    next_id = 0
    for chunk in shards_text:
        shard = []
        for text in chunk:
            shard.append((next_id, text))
            next_id += 1
        shards.append(shard)

    base = tmp_path_factory.mktemp("incprop")
    corpus, store = base / "corpus", base / "fps"
    hist = spark.createDataFrame(shards[0], "doc_id long, text string")
    seed = exact_dedup(hist, "text", "doc_id")
    write_delta(seed, corpus)
    write_delta(seed.select(fingerprint("text").alias("fp"), "doc_id"), store)

    for v, shard in enumerate(shards[1:], start=1):
        incremental_dedup_commit(
            spark,
            spark.createDataFrame(shard, "doc_id long, text string"),
            corpus,
            store,
            "prop",
            v,
        )

    got = {r.doc_id for r in read_delta(spark, corpus).collect()}
    assert got == _model(shards)
    corpus_fps = {
        r.fp
        for r in read_delta(spark, corpus)
        .select(fingerprint("text").alias("fp"))
        .collect()
    }
    store_rows = read_delta(spark, store).collect()
    assert {r.fp for r in store_rows} == corpus_fps
    assert len(store_rows) == len(corpus_fps)  # one store row per fp

"""duplicated_span_stats (exact-substring dedup, Lee et al. 2022 style):
interval-union coverage math on hand-crafted corpora, stride/hash_grams
levers, and the short-doc guard."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.operators.dedup import duplicated_span_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _stats(df):
    return {r["doc_id"]: (r["dup_positions"], r["dup_chars"], r["total_chars"])
            for r in df.collect()}


def test_identical_docs_fully_covered(spark):
    txt = "a" * 10 + "bcdefghij" * 10  # 100 chars, len >= n
    df = _docs(spark, [(1, txt), (2, txt)])
    out = _stats(duplicated_span_stats(df, n=40))
    # every window of each doc occurs twice (once per doc) -> full coverage
    assert out[1] == (61, 100, 100)
    assert out[2] == (61, 100, 100)


def test_unique_docs_emit_nothing(spark):
    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = [(i, "".join(rng.choice(alpha) for _ in range(120))) for i in range(4)]
    df = _docs(spark, rows)
    assert duplicated_span_stats(df, n=40).count() == 0


def test_within_doc_repeat_counts(spark):
    # one doc whose text repeats a 50-char block twice -> windows inside the
    # repeated block occur >= 2 times WITHIN the same doc (min_count is
    # corpus-global, matching the suffix-array semantics)
    block = "0123456789" * 5
    txt = block + "X" * 30 + block
    df = _docs(spark, [(1, txt)])
    out = _stats(duplicated_span_stats(df, n=40))
    assert 1 in out
    n_pos, chars, total = out[1]
    assert total == len(txt)
    # both copies of the block are covered
    assert chars >= 2 * (len(block))


def test_disjoint_islands_sum_not_merge(spark):
    # two duplicated regions separated by unique gaps -> union adds spans,
    # does not bridge across the gap
    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    gap1 = "".join(rng.choice(alpha) for _ in range(60))
    gap2 = "".join(rng.choice(alpha) for _ in range(60))
    shared_a = "A0B1C2D3E4" * 4  # 40 chars
    shared_b = "zyxwvutsrq" * 4  # 40 chars
    d1 = shared_a + gap1 + shared_b
    d2 = shared_a + gap2 + shared_b
    df = _docs(spark, [(1, d1), (2, d2)])
    out = _stats(duplicated_span_stats(df, n=40))
    # exactly the two shared 40-char blocks are covered in each doc
    assert out[1][1] == 80 and out[2][1] == 80
    assert out[1][2] == len(d1) and out[2][2] == len(d2)


def test_hash_grams_matches_raw(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 3),
            (2, "the quick brown fox jumps over the lazy dog " * 3),
            (3, "completely different content with no overlap at all here....")]
    df = _docs(spark, rows)
    raw = _stats(duplicated_span_stats(df, n=40, hash_grams=False))
    hashed = _stats(duplicated_span_stats(df, n=40, hash_grams=True))
    assert raw == hashed


def test_stride_detects_long_spans(spark):
    # stride=5 still flags the duplicated region; coverage is a subset of
    # the stride-1 answer
    block = "shared-shared-shared-shared-shared-shared-shared-" * 2
    df = _docs(spark, [(1, block + "uniqueuniqueUNIQ1"), (2, block + "otherotherOTHER2")])
    s1 = _stats(duplicated_span_stats(df, n=40, stride=1))
    s5 = _stats(duplicated_span_stats(df, n=40, stride=5))
    assert set(s5) == {1, 2}
    for k in s5:
        assert s5[k][1] <= s1[k][1]
        assert s5[k][1] >= len(block) - 2 * 5  # stride slack only at edges


def test_short_docs_excluded(spark):
    df = _docs(spark, [(1, "short"), (2, "short")])
    assert duplicated_span_stats(df, n=40).count() == 0


def test_bad_params_raise(spark):
    df = _docs(spark, [(1, "x" * 50)])
    with pytest.raises(ValueError):
        duplicated_span_stats(df, n=1)
    with pytest.raises(ValueError):
        duplicated_span_stats(df, stride=0)


# ---------------------------------------------------------------------------
# Property: distributed result == a from-first-principles single-machine
# reference on random small corpora (hypothesis drives corpus shapes that
# hand-written cases miss: overlapping islands, within-doc repeats,
# doc-boundary adjacency, alphabet collisions)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _reference_span_stats(texts: dict[int, str], n: int, min_count: int):
    from collections import Counter

    grams: Counter = Counter()
    for t in texts.values():
        for i in range(len(t) - n + 1):
            grams[t[i : i + n]] += 1
    out = {}
    for doc_id, t in texts.items():
        pos = [
            i for i in range(len(t) - n + 1) if grams[t[i : i + n]] >= min_count
        ]
        if not pos:
            continue
        covered = set()
        for i in pos:
            covered.update(range(i, i + n))
        out[doc_id] = (len(pos), len(covered), len(t))
    return out


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(2, 6))
    # tiny alphabet → dense collisions; variable lengths straddle n=6
    return {
        i: draw(st.text(alphabet="abc", min_size=0, max_size=40))
        for i in range(n_docs)
    }


@given(_corpus())
@settings(max_examples=25, deadline=None)
def test_property_matches_reference(spark, texts):
    n = 6
    df = _docs(spark, [(i, t) for i, t in texts.items()])
    got = {
        r["doc_id"]: (r["dup_positions"], r["dup_chars"], r["total_chars"])
        for r in duplicated_span_stats(df, n=n, min_count=2).collect()
    }
    assert got == _reference_span_stats(texts, n, 2)

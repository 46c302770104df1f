"""Distributed BPE training vs a from-first-principles single-machine
trainer (Sennrich et al. 2016 semantics: count pairs over the word-freq
table, merge ALL occurrences of the argmax pair, ties to the
lexicographically smallest pair)."""

from __future__ import annotations

from collections import Counter

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.bpe import bpe_segment, train_bpe_merges
from tests.conftest import SF_DIR

_EOW = "</w>"


def _reference_bpe(texts: list[str], n_merges: int, min_pair_count: int = 2):
    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: tuple(list(w) + [_EOW]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (left, right) = best[0]
        merges.append((left, right))
        joined = left + right
        nxt = {}
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(joined)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nxt[w] = tuple(res)
        words = nxt
    return merges


def test_merges_match_reference_on_fixture(spark):
    d = load_table(spark, SF_DIR, "documents").limit(120)
    texts = [r.text for r in d.select("text").collect()]
    got = train_bpe_merges(d, n_merges=25)
    want = _reference_bpe(texts, n_merges=25)
    assert got == want and len(got) == 25


def test_driver_path_equals_distributed_rounds(spark):
    # the r13 driver-side fast path (vocab fits the take-probe budget)
    # must produce the EXACT merge list of the distributed per-round
    # loop — force the distributed path with driver_vocab_rows=0
    d = load_table(spark, SF_DIR, "documents").limit(60)
    fast = train_bpe_merges(d, n_merges=12)
    slow = train_bpe_merges(d, n_merges=12, driver_vocab_rows=0)
    assert fast == slow and len(fast) == 12


def test_driver_budget_overflow_falls_back(spark):
    # a vocab larger than driver_vocab_rows must take the distributed
    # path and still match the reference
    df = spark.createDataFrame(
        [("aa ab ba bb aa ab",), ("ba bb aa aa",)], "text string"
    )
    got = train_bpe_merges(df, n_merges=3, driver_vocab_rows=2)
    want = _reference_bpe(["aa ab ba bb aa ab", "ba bb aa aa"], n_merges=3)
    assert got == want
    # same with the symbol budget as the binding constraint
    got2 = train_bpe_merges(
        df, n_merges=3, driver_vocab_rows=1000, driver_sym_budget=3
    )
    assert got2 == want


def test_segment_roundtrip_and_consistency(spark):
    d = load_table(spark, SF_DIR, "documents").limit(80)
    merges = train_bpe_merges(d, n_merges=15)
    seg = bpe_segment(d, merges)
    rows = seg.select("text", "bpe_tokens").collect()
    for r in rows:
        # lossless: concatenating tokens and stripping the markers
        # reconstructs the original text
        rebuilt = "".join(r.bpe_tokens).replace(_EOW, " ").rstrip()
        assert rebuilt == r.text
    # merges actually fire: token count < char count
    some = rows[0]
    assert len(some.bpe_tokens) < len(some.text)


def test_early_stop_on_tiny_corpus(spark):
    df = spark.createDataFrame([("zq zq",)], "text string")
    merges = train_bpe_merges(df, n_merges=50, min_pair_count=2)
    # 'zq</w>' fully merges in 2 steps, then nothing repeats >= 2
    assert 0 < len(merges) < 50


def test_segment_unknown_chars_pass_through(spark):
    d = load_table(spark, SF_DIR, "documents").limit(40)
    merges = train_bpe_merges(d, n_merges=5)
    df = spark.createDataFrame([("xyzzy-42 été",)], "text string")
    out = bpe_segment(df, merges).collect()[0].bpe_tokens
    assert "".join(out).replace(_EOW, " ").rstrip() == "xyzzy-42 été"

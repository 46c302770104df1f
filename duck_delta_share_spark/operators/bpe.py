"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
vocabulary-construction step of an LLM data pipeline.

Scale shape: BPE state is the DISTINCT-WORD frequency table (vocab-sized,
orders of magnitude smaller than the corpus), built with ONE corpus-wide
groupBy. Every merge round then runs on that small table: a pair-count
aggregation (explode adjacent symbol pairs weighted by word frequency,
groupBy pair, sum) and a one-row driver take for the argmax — the corpus
itself is never rescanned. Merge application per round is an Arrow
pandas UDF (a sequential left-to-right scan per word is inherently
order-dependent; no Catalyst expression can do it).

The reference engine has no tokenizer surface at all (read-only sharing
client, src/delta_sharing_client.cpp); this is part of the
driver-mandated LLM-pipeline extension set.

Determinism: ties on pair count break to the lexicographically smallest
(left, right) pair, so the learned merge list is a pure function of the
corpus — verified against a from-first-principles single-machine trainer
in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from duck_delta_share_spark.operators.checkpoints import release_local_checkpoint

_EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace words — the distributed BPE state."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _train_bpe_driver(
    word_syms: list[tuple[list[str], int]],
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the collected (syms, freq) table —
    semantically IDENTICAL to the distributed rounds (same per-word
    adjacent-pair multiset weighted by freq; same argmax tie-break: count
    desc, then lexicographically smallest (left, right) — Spark compares
    strings as UTF-8 bytes = code-point order = Python ``str`` order;
    same left-to-right non-overlapping merge application). Exact
    merge-list equality vs the distributed path is pinned in
    tests/test_bpe.py."""
    merges: list[tuple[str, str]] = []
    words = word_syms
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((left, right))
        joined = left + right
        nxt: list[tuple[list[str], int]] = []
        for syms, freq in words:
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(joined)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nxt.append((res, freq))
        words = nxt
    return merges


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_vocab_rows: int = 262_144,
    driver_sym_budget: int = 1_048_576,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right), ...] in rank
    order. Stops early when no pair reaches ``min_pair_count``.

    BPE state is the DISTINCT-WORD table — vocab-sized, usually tiny next
    to the corpus. When it fits a bounded driver budget (≤
    ``driver_vocab_rows`` rows AND ≤ ``driver_sym_budget`` total symbols,
    probed with one ``take``), the merge loop runs IN-DRIVER on the
    collected table: the distributed loop costs 2 Spark jobs + a collect
    PER MERGE (~0.8 s/round of pure scheduling at any scale — 40 rounds
    read 101 s on a 31-word sweep vocab), all to re-aggregate a table
    that fits in one task. Identical merge output by construction
    (:func:`_train_bpe_driver`); a corpus whose vocab exceeds the budget
    keeps the distributed rounds unchanged. Set ``driver_vocab_rows=0``
    to force the distributed path."""
    spark = df.sparkSession
    if driver_vocab_rows:
        head = _word_freqs(df, text_col).take(driver_vocab_rows + 1)
        if len(head) <= driver_vocab_rows:
            syms = [(list(r["w"]) + [_EOW], r["freq"]) for r in head]
            if sum(len(s) for s, _ in syms) <= driver_sym_budget:
                return _train_bpe_driver(syms, n_merges, min_pair_count)
    # localCheckpoint truncates lineage each round — n_merges chained
    # Arrow-UDF plans would otherwise nest into an optimizer/heap blowup
    # (same discipline as operators/components.py)
    words = (
        _word_freqs(df, text_col)
        .withColumn(
            "syms",
            F.concat(
                # every char in order; Spark split keeps a trailing empty
                # match (Java split limit=-1) — drop it
                F.filter(F.split(F.col("w"), "(?!^)"), lambda x: x != ""),
                F.array(F.lit(_EOW)),
            ),
        )
        .select("syms", "freq")
        .localCheckpoint(eager=True)
    )

    def merger(left: str, right: str):
        joined = left + right

        @F.pandas_udf(ArrayType(StringType()))
        def apply_merge(syms: pd.Series) -> pd.Series:
            out = []
            for s in syms:
                s = list(s)
                i, res = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(joined)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        return apply_merge

    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                words.select(
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1), "
                            "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0]["n"] < min_pair_count:
                break
            left, right = pairs[0]["l"], pairs[0]["r"]
            merges.append((left, right))
            prev = words
            words = words.select(
                merger(left, right)(F.col("syms")).alias("syms"), "freq"
            ).localCheckpoint(eager=True)
            # the new round is materialized — release the superseded
            # round's cached blocks now, not at some future driver GC
            # (n_merges rounds would otherwise pin n_merges copies of the
            # word table)
            release_local_checkpoint(prev)
    except BaseException:
        # mid-loop failure (executor OOM in a round, py4j error in the
        # argmax collect, KeyboardInterrupt): the live round's blocks
        # would otherwise stay pinned until driver GC — release them on
        # the way out (best-effort, same as the success path)
        release_local_checkpoint(words)
        raise
    release_local_checkpoint(words)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list: rank-ordered greedy merging per word
    (the standard BPE encoder), one Arrow batch pass, merge table
    broadcast in the UDF closure — a narrow map at any corpus size."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        # subword-nmt encode: repeatedly take the LOWEST-RANK pair present
        # and merge ALL its occurrences left-to-right — the exact
        # semantics each training round applied, so train→encode is
        # self-consistent
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best = min(
                (
                    ranks[p]
                    for p in zip(syms, syms[1:])
                    if p in ranks
                ),
                default=None,
            )
            if best is None:
                break
            left, right = merges[best]
            joined, res, i = left + right, [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(joined)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return syms

    @F.pandas_udf(ArrayType(StringType()))
    def seg(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks: list[str] = []
            for w in (t or "").split(" "):
                if w:
                    toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, seg(F.col(text_col)))

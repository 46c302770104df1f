"""Streaming heavy hitters — the ingest-side twin of the batch two-pass
Misra-Gries operator (``operators/sketches.py``).

Shape: tokens are sharded by ``hash(term) % n_shards`` (ALL occurrences of
a term land in one shard), and each shard keeps a Misra-Gries summary of
k = ceil(1/θ) counters in streaming state — O(1/θ) memory per shard
FOREVER, regardless of stream length. Containment survives sharding: a
term with global count ≥ θ·N has in-shard count ≥ θ·N ≥ θ·n_shard >
n_shard/(k+1), so it always holds a counter in its shard. Every emission
therefore covers all θ-heavy terms of the stream SO FAR; counts are MG
lower bounds (exact recount is a batch job over the candidate set, as in
the batch operator's pass 2).

State never times out (corpus statistics accumulate for the stream's
lifetime); output mode is ``update`` — each micro-batch re-emits the
shards it touched.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import tokenize

_OUT_SCHEMA = "shard long, term string, cnt_lower long, shard_tokens long"
_STATE_SCHEMA = "terms array<string>, counts array<long>, n long"


def heavy_hitters_stream(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 1 / 128,
    n_shards: int = 8,
) -> DataFrame:
    """Candidate θ-heavy terms over the stream so far, with MG lower-bound
    counts and per-shard token totals."""
    k = int(math.ceil(1.0 / threshold))

    def fn(key, pdfs, state):
        counters: dict[str, int] = {}
        n = 0
        if state.exists:
            terms, counts, n = state.get
            counters = dict(zip(terms, counts))
        for pdf in pdfs:
            for t in pdf["term"]:
                n += 1
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = [key_ for key_ in counters if counters[key_] == 1]
                    for key_ in counters:
                        counters[key_] -= 1
                    for key_ in dead:
                        del counters[key_]
        state.update((list(counters.keys()), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "term": list(counters.keys()),
                "cnt_lower": list(counters.values()),
                "shard_tokens": [n] * len(counters),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    tokens = docs.select(F.explode(tokenize(text_col)).alias("term")).select(
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).alias("shard"), "term"
    )
    return tokens.groupBy("shard").applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

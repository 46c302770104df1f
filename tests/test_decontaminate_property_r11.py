"""Hypothesis property test for operators/dedup.py:decontaminate_rewrite:
the Spark rewrite must equal a from-first-principles Python reference
(set-of-benchmark-shingles → covered positions → kept tokens) on corpora
the fixtures never produce — single-token docs, all-duplicate tokens,
empty-string tokens from repeated separators, benchmark == corpus text,
shingle sizes 2..4.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from duck_delta_share_spark.operators.dedup import decontaminate_rewrite

_SETTINGS = dict(
    max_examples=int(os.environ.get("HYP_MAX_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# tiny vocab maximizes shingle collisions; '' exercises the repeated-
# separator empty token
_TOK = st.sampled_from(["a", "b", "c", "ab", "x1", ""])
_DOC = st.lists(_TOK, min_size=0, max_size=12).map(lambda t: " ".join(t))


def _reference(corpus: list[tuple[int, str]], bench: list[str], n: int):
    bench_sh = set()
    for t in bench:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            bench_sh.add(" ".join(toks[i : i + n]))
    out = {}
    for doc_id, t in corpus:
        toks = t.split(" ")
        covered: set[int] = set()
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i : i + n]) in bench_sh:
                covered.update(range(i, i + n))
        kept = [tok for j, tok in enumerate(toks) if j not in covered]
        out[doc_id] = (len(toks), len(covered), " ".join(kept))
    return out


@given(
    corpus=st.lists(_DOC, min_size=1, max_size=8),
    bench=st.lists(_DOC, min_size=1, max_size=4),
    n=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_matches_python_reference(spark, corpus, bench, n):
    cdf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    bdf = spark.createDataFrame(
        [Row(doc_id=1000 + i, text=t) for i, t in enumerate(bench)]
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in decontaminate_rewrite(cdf, bdf, shingle_n=n).collect()
    }
    want = _reference(list(enumerate(corpus)), bench, n)
    assert got == want

"""Registry-WIDE physical-plan hazard sweep (r7): every registered query
is planned and checked for the scale anti-patterns the per-query plan
tests pin individually — so a FUTURE query (or an optimizer-behavior
shift) that introduces a cartesian product, an unvetted
broadcast-nested-loop join, or a whole-data single-partition window
fails loudly here instead of surfacing as a 100x cliff at scale.

Planning only (no execution): the sweep builds each frame at sf0.001 and
inspects the executed-plan string.
"""

from __future__ import annotations

import re

import pytest

from duck_delta_share_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin is legitimate ONLY for the broadcast
# 1-row/|query|-row totals crossJoins (each adjudicated in VERDICT r5:
# "All 7 crossJoin sites broadcast 1-row (or |query|-row) totals
# frames") and the salt-replication join. Adding a query here requires
# the same adjudication: the broadcast side must be O(1) or
# O(|queries|) rows INDEPENDENT of corpus size.
BNLJ_ALLOWED = {
    "source_term_lift",          # 1-row corpus-total frame
    "vocab_coverage_curve",      # 64-row head + 1-row total
    "similarity_topk_exact",     # |queries|-row broadcast probe set
    "tfidf_top_terms",           # 1-row doc-count frame
    "bigram_backoff_score",      # 1-row train-token total
    "similarity_topk_int8",      # |queries|-row broadcast probe set
    "similarity_range_search",   # |queries|-row broadcast probe set
    "similarity_ann_pq",         # |queries|-row broadcast probe set
    "hard_negative_mining",      # |queries|-row broadcast probe set
    "unigram_perplexity_score",  # 1-row corpus-token total
    "hll_mergeable_distinct",    # 1-row merged-sketch frame
    "similarity_ann_opq",        # |queries|-row broadcast probe set
    "bm25_topk",                 # 1-row corpus stats (N, avgdl)
    "pmi_bigram_scores",         # two 1-row totals frames
    "salted_join_lineitem",      # n_salts-row replication frame
    "q20_promotion_suppliers",   # 1-row scalar-subquery threshold
    "doc_embedding_coverage",    # 1-row pre-join null-vector count
    "similarity_ann_sq8",        # |queries|-row broadcast probe set
    "matryoshka_truncation_audit",  # |queries|-row broadcast probe set x2
}


@pytest.fixture(scope="module")
def plans(spark):
    # Serial by design: profiled r13 — spark_fn construction (the
    # lifecycle queries' eager side-effect writes) is 128 s of the
    # fixture, JVM planning only 7.5 s, so pooling the planning step
    # buys nothing and concurrent fn()s would race the scratch dirs.
    out = {}
    for name, qd in QUERIES.items():
        df = qd.spark_fn(spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products (quadratic at scale): {bad}"


def test_bnlj_only_for_adjudicated_tiny_broadcasts(plans):
    got = {n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p}
    new = got - BNLJ_ALLOWED
    assert not new, (
        "unvetted BroadcastNestedLoopJoin (must be a corpus-independent "
        f"tiny broadcast, then allowlisted with a comment): {sorted(new)}"
    )
    gone = BNLJ_ALLOWED - got
    assert not gone, (
        "allowlist entries no longer exhibit BNLJ — prune them so the "
        f"list stays adjudicated: {sorted(gone)}"
    )


def test_no_single_partition_windows(plans):
    bad = []
    for name, p in plans.items():
        lines = p.splitlines()
        for i, ln in enumerate(lines):
            if re.search(r"\bWindow\b", ln):
                # the window's shuffle is the textually-next exchange
                if any(
                    "Exchange SinglePartition" in la
                    for la in lines[i + 1 : i + 4]
                ):
                    bad.append(name)
                    break
    assert not bad, f"whole-data single-task windows: {bad}"

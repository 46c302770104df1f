"""Unit lenses for the three late-r11 operators (decontaminate_rewrite,
pagerank_transition_round, l_diversity_audit) beyond their registry
oracle checks: hand-computable micro-corpora pin the SEMANTICS (span
coverage, overlap merging, rank conservation, homogeneous-group
detection) that a hash comparison can only confirm, not explain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from duck_delta_share_spark.operators.dedup import decontaminate_rewrite


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestDecontaminateRewrite:
    def test_single_hit_removes_exactly_the_span(self, spark):
        corpus = _docs(spark, [(1, "a b c d e f")])
        bench = _docs(spark, [(100, "c d e")])
        out = decontaminate_rewrite(corpus, bench, shingle_n=3).collect()[0]
        assert out.clean_text == "a b f"
        assert out.n_tokens == 6
        assert out.n_removed == 3

    def test_overlapping_spans_merge(self, spark):
        # hits at starts 1 ("b c d") and 2 ("c d e") cover positions 1-4
        corpus = _docs(spark, [(1, "a b c d e f")])
        bench = _docs(spark, [(100, "b c d"), (101, "c d e")])
        out = decontaminate_rewrite(corpus, bench, shingle_n=3).collect()[0]
        assert out.clean_text == "a f"
        assert out.n_removed == 4

    def test_fully_contaminated_doc_empties(self, spark):
        corpus = _docs(spark, [(1, "x y z")])
        bench = _docs(spark, [(100, "x y z")])
        out = decontaminate_rewrite(corpus, bench, shingle_n=3).collect()[0]
        assert out.clean_text == ""
        assert out.n_removed == 3

    def test_clean_doc_round_trips_exactly(self, spark):
        # repeated spaces produce empty-string tokens that concat_ws
        # KEEPS — reconstruction must be byte-identical for clean docs
        corpus = _docs(spark, [(1, "a  b c"), (2, "q w e r t")])
        bench = _docs(spark, [(100, "nothing matches here at all")])
        rows = {
            r.doc_id: r
            for r in decontaminate_rewrite(corpus, bench, shingle_n=3).collect()
        }
        assert rows[1].clean_text == "a  b c"
        assert rows[1].n_removed == 0
        assert rows[2].clean_text == "q w e r t"

    def test_short_docs_never_flag(self, spark):
        # fewer tokens than shingle_n -> no shingles -> untouched,
        # even when the tokens all appear in the benchmark
        corpus = _docs(spark, [(1, "x y")])
        bench = _docs(spark, [(100, "x y z")])
        out = decontaminate_rewrite(corpus, bench, shingle_n=3).collect()[0]
        assert out.clean_text == "x y"
        assert out.n_removed == 0

    def test_multiple_disjoint_spans(self, spark):
        corpus = _docs(spark, [(1, "s1 s2 s3 mid1 mid2 t1 t2 t3 tail")])
        bench = _docs(spark, [(100, "s1 s2 s3"), (101, "t1 t2 t3")])
        out = decontaminate_rewrite(corpus, bench, shingle_n=3).collect()[0]
        assert out.clean_text == "mid1 mid2 tail"
        assert out.n_removed == 6


class TestPagerankRound:
    @pytest.fixture(scope="class")
    def result(self, spark):
        from duck_delta_share_spark.plans import QUERIES

        df = QUERIES["pagerank_transition_round"].spark_fn(
            spark, "/root/testdata/sf0.001"
        )
        return df.collect()

    def test_rank_mass_approximately_conserved(self, result):
        # simple-damped round from a uniform start over a graph where
        # every node has outgoing edges: sum(rank) = 1 up to the
        # e6-fixed-point floor truncation (each of the |E| integer DIVs
        # and the two outer DIVs drops < 1 ulp of e6 mass, never adds)
        total = sum(r.rank_e6 for r in result)
        n_nodes = len(result)
        assert n_nodes > 0
        assert total <= 1_000_000
        # each node loses < n_nodes + 2 units of floor mass
        assert total > 1_000_000 - (n_nodes + 2) * n_nodes - 100

    def test_edge_totals_balance(self, result):
        # every transition leaves one node and enters another
        assert sum(r.out_w for r in result) == sum(r.in_w for r in result)


class TestLDiversity:
    def test_homogeneous_groups_detected(self, spark):
        from duck_delta_share_spark.plans import QUERIES

        import datetime

        rows = [
            # group (a, d1): 3 rows, all user 1 -> l = 1 (homogeneous)
            Row(event_id=1, ts=datetime.datetime(2024, 1, 1, 1), user_id=1, event_type="a"),
            Row(event_id=2, ts=datetime.datetime(2024, 1, 1, 2), user_id=1, event_type="a"),
            Row(event_id=3, ts=datetime.datetime(2024, 1, 1, 3), user_id=1, event_type="a"),
            # group (b, d1): 3 rows, 3 users -> l = 3
            Row(event_id=4, ts=datetime.datetime(2024, 1, 1, 4), user_id=1, event_type="b"),
            Row(event_id=5, ts=datetime.datetime(2024, 1, 1, 5), user_id=2, event_type="b"),
            Row(event_id=6, ts=datetime.datetime(2024, 1, 1, 6), user_id=3, event_type="b"),
        ]
        e = spark.createDataFrame(rows)
        g = e.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("user_id").alias("l"),
        )
        out = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("l").alias("l_diversity"),
            F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).alias(
                "n_groups_below_3"
            ),
            F.sum(F.when(F.col("l") < 3, F.col("sz")).otherwise(0)).alias(
                "n_rows_below_3"
            ),
        ).collect()[0]
        # the k-anonymity view of the same data says k = 3 (both groups
        # have 3 rows) — but group (a, d1) is homogeneous: l = 1
        assert out.n_groups == 2
        assert out.l_diversity == 1
        assert out.n_groups_below_3 == 1
        assert out.n_rows_below_3 == 3


class TestDecontaminateRebuildModes:
    def test_arrow_rebuild_identical_incl_edge_shapes(self, spark):
        """rebuild='arrow' (the O(n+c) scatter-mask dial, r12 A/B) must
        match the expr default row-for-row on every edge shape the expr
        lenses above pin: overlap merge, full contamination, clean
        round-trip with doubled spaces, short docs, disjoint spans."""
        corpus = _docs(
            spark,
            [
                (1, "a b c d e f"),
                (2, "x y z"),
                (3, "a  b c"),
                (4, "x y"),
                (5, "s1 s2 s3 mid1 mid2 t1 t2 t3 tail"),
            ],
        )
        bench = _docs(
            spark,
            [(100, "b c d"), (101, "c d e"), (102, "x y z"),
             (103, "s1 s2 s3"), (104, "t1 t2 t3")],
        )
        a = sorted(
            map(tuple, decontaminate_rewrite(corpus, bench, 3).collect())
        )
        b = sorted(
            map(
                tuple,
                decontaminate_rewrite(
                    corpus, bench, 3, rebuild="arrow"
                ).collect(),
            )
        )
        assert a == b

    def test_unknown_rebuild_mode_fails_loud(self, spark):
        corpus = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError, match="unknown rebuild mode"):
            decontaminate_rewrite(corpus, corpus, 3, rebuild="jvm")

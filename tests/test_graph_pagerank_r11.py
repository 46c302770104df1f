"""operators/graph.py:pagerank_rounds — iterative fixed-point PageRank.

The registered query (pagerank_transition_round) hash-checks ONE round
against DuckDB; these tests pin the ITERATIVE behavior: agreement with
an independent pure-Python integer re-implementation (exactness), with
float PageRank (semantics), convergence, dangling handling, and the
node-universe override.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from duck_delta_share_spark.operators.graph import pagerank_rounds


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(src=a, dst=b, w=w) for a, b, w in triples]
    )


def _py_pagerank_e(
    triples,
    nodes,
    n_rounds,
    d_num=85,
    d_den=100,
    scale=1_000_000,
    redistribute=False,
):
    """Independent pure-python-int re-implementation of the documented
    fixed-point recurrence (same DIV order, no Spark code shared)."""
    n = len(nodes)
    outw: dict = {}
    for a, _, w in triples:
        outw[a] = outw.get(a, 0) + w
    base = ((scale * (d_den - d_num)) // d_den) // n
    rank = {v: scale // n for v in nodes}
    for _ in range(n_rounds):
        c = {v: 0 for v in nodes}
        for a, b, w in triples:
            c[b] += (rank[a] * w) // outw[a]
        dang = sum(rank[v] for v in nodes if v not in outw)
        nxt = {}
        for v in nodes:
            r = base + (d_num * c[v]) // d_den
            if redistribute:
                r += (d_num * (dang // n)) // d_den
            nxt[v] = r
        rank = nxt
    return rank


TRIANGLE = [("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("a", "c", 3)]


class TestPagerankRounds:
    @pytest.mark.parametrize("n_rounds", [1, 3, 7])
    def test_matches_independent_integer_model_exactly(self, spark, n_rounds):
        got = {
            r.node: r.rank_e
            for r in pagerank_rounds(
                _edges(spark, TRIANGLE), weight="w", n_rounds=n_rounds
            ).collect()
        }
        want = _py_pagerank_e(TRIANGLE, ["a", "b", "c"], n_rounds)
        assert got == want

    def test_close_to_float_pagerank_at_fixpoint(self, spark):
        got = {
            r.node: r.rank_e / 1e6
            for r in pagerank_rounds(
                _edges(spark, TRIANGLE), weight="w", n_rounds=40
            ).collect()
        }
        # float reference on the same graph
        nodes = ["a", "b", "c"]
        outw = {"a": 4, "b": 2, "c": 1}
        rank = {v: 1 / 3 for v in nodes}
        for _ in range(200):
            c = {v: 0.0 for v in nodes}
            for a, b, w in TRIANGLE:
                c[b] += rank[a] * w / outw[a]
            rank = {v: 0.15 / 3 + 0.85 * c[v] for v in nodes}
        for v in nodes:
            # e6 floor truncation loses < ~1e-5 mass/round on 4 edges
            assert abs(got[v] - rank[v]) < 1e-3

    def test_star_center_dominates(self, spark):
        # hub fans its mass back over ALL leaves (a single hub->leaf0
        # edge would concentrate the whole hub rank on leaf0, which then
        # outranks the hub — the correct-but-surprising variant)
        star = [(f"leaf{i}", "hub", 1) for i in range(6)] + [
            ("hub", f"leaf{i}", 1) for i in range(6)
        ]
        got = {
            r.node: r.rank_e
            for r in pagerank_rounds(_edges(spark, star), n_rounds=10).collect()
        }
        assert got["hub"] == max(got.values())
        assert got["hub"] > 3 * got["leaf3"]

    def test_dangling_simple_damped_loses_mass(self, spark):
        # b has no out-edges: its mass is dropped (documented variant)
        chain = [("a", "b", 1)]
        got = pagerank_rounds(
            _edges(spark, chain), n_rounds=5, redistribute_dangling=False
        ).collect()
        total = sum(r.rank_e for r in got)
        assert total < 1_000_000

    def test_dangling_redistribute_conserves_mass(self, spark):
        chain = [("a", "b", 1)]
        got = pagerank_rounds(
            _edges(spark, chain), n_rounds=5, redistribute_dangling=True
        ).collect()
        want = _py_pagerank_e(
            chain, ["a", "b"], 5, redistribute=True
        )
        assert {r.node: r.rank_e for r in got} == want
        total = sum(r.rank_e for r in got)
        # conserved up to floor truncation (a few e6 units per round)
        assert total > 1_000_000 - 40
        assert total <= 1_000_000

    def test_isolated_nodes_via_node_universe(self, spark):
        nodes = spark.createDataFrame(
            [Row(node=v) for v in ["a", "b", "c", "lonely"]]
        )
        got = {
            r.node: r.rank_e
            for r in pagerank_rounds(
                _edges(spark, TRIANGLE),
                weight="w",
                nodes=nodes,
                n_rounds=2,
            ).collect()
        }
        assert set(got) == {"a", "b", "c", "lonely"}
        # an isolated node keeps exactly the base (1-d)/N share
        assert got["lonely"] == ((1_000_000 * 15) // 100) // 4

    def test_self_loops_match_integer_model(self, spark):
        # a self-loop keeps (part of) a node's mass on itself — legal in
        # transition graphs (repeated identical events); must follow the
        # same recurrence, no special-casing
        g = [("a", "a", 3), ("a", "b", 1), ("b", "a", 2)]
        for rounds in (1, 4):
            got = {
                r.node: r.rank_e
                for r in pagerank_rounds(
                    _edges(spark, g), weight="w", n_rounds=rounds
                ).collect()
            }
            assert got == _py_pagerank_e(g, ["a", "b"], rounds)

    def test_empty_edge_list_with_node_universe(self, spark):
        # an all-isolated graph: every node holds exactly the base share
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        empty = spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("src", StringType()),
                    StructField("dst", StringType()),
                    StructField("w", LongType()),
                ]
            ),
        )
        nodes = spark.createDataFrame([Row(node=v) for v in ["a", "b", "c"]])
        got = {
            r.node: r.rank_e
            for r in pagerank_rounds(
                empty, weight="w", nodes=nodes, n_rounds=3
            ).collect()
        }
        base = ((1_000_000 * 15) // 100) // 3
        assert got == {"a": base, "b": base, "c": base}

    def test_empty_graph_no_nodes_returns_empty(self, spark):
        from pyspark.sql.types import StringType, StructField, StructType

        empty = spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("src", StringType()),
                    StructField("dst", StringType()),
                ]
            ),
        )
        out = pagerank_rounds(empty, n_rounds=2)
        assert out.columns == ["node", "rank_e"]
        assert out.count() == 0

    def test_tol_early_stop_matches_full_run(self, spark):
        full = {
            r.node: r.rank_e
            for r in pagerank_rounds(
                _edges(spark, TRIANGLE), weight="w", n_rounds=60
            ).collect()
        }
        early = {
            r.node: r.rank_e
            for r in pagerank_rounds(
                _edges(spark, TRIANGLE), weight="w", n_rounds=60, tol_e=0
            ).collect()
        }
        # tol_e=0 stops only at an exact fixpoint -> same answer
        assert early == full

"""Connected components on a known graph: chain, triangle, isolated pair —
every node must get the min id of its component, including chains longer
than one propagation hop."""

from __future__ import annotations

from duck_delta_share_spark.operators.components import connected_components


def test_connected_components_known_graph(spark):
    # chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


# ---------------------------------------------------------------------------
# Large-star / small-star algorithm (the O(log^2 n)-round scale path)
# ---------------------------------------------------------------------------


def test_star_matches_hashmin_on_random_graph(spark):
    import random

    from duck_delta_share_spark.operators.components import connected_components

    rng = random.Random(5)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    # driver_gate_edges=0 keeps this a DISTRIBUTED star-vs-hashmin lens
    # (r13: the default gate would run union-find for both)
    star = {
        (r.node, r.component)
        for r in connected_components(
            df, algorithm="star", driver_gate_edges=0
        ).collect()
    }
    hashmin = {
        (r.node, r.component)
        for r in connected_components(df, algorithm="hashmin").collect()
    }
    assert star == hashmin and len(star) > 0


def test_star_converges_on_long_chain(spark):
    """A 300-node path has diameter 299: hash-min needs 299 rounds, the
    star algorithm must close it within the default 25 (O(log^2 n))."""
    from duck_delta_share_spark.operators.components import connected_components

    chain = [(i, i + 1) for i in range(299)]
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # non-convergence warning -> failure
        # gate off: O(log^2 n) star convergence is the claim under test
        out = connected_components(
            df, algorithm="star", driver_gate_edges=0
        ).collect()
    assert len(out) == 300
    assert {r.component for r in out} == {0}


def test_star_self_loops_only(spark):
    from duck_delta_share_spark.operators.components import connected_components

    df = spark.createDataFrame([(7, 7), (9, 9)], ["id_a", "id_b"])
    for gate in (65536, 0):  # driver union-find path AND star fixpoint
        out = {
            (r.node, r.component)
            for r in connected_components(
                df, algorithm="star", driver_gate_edges=gate
            ).collect()
        }
        assert out == {(7, 7), (9, 9)}, f"gate={gate}"


def test_driver_gate_matches_distributed_star(spark):
    """r13: ≤gate edge sets run exact union-find in the driver — labels
    must EQUAL the distributed star loop's on the same graph (self-loops,
    chains, cliques mixed in), and the gate must not swallow the
    singleton re-admission."""
    import random

    rng = random.Random(13)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    edges += [(200, 200), (201, 201)]  # self-loop-only singletons
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    gated = {
        (r.node, r.component)
        for r in connected_components(df, driver_gate_edges=100000).collect()
    }
    distributed = {
        (r.node, r.component)
        for r in connected_components(df, driver_gate_edges=0).collect()
    }
    assert gated == distributed and (200, 200) in gated and (201, 201) in gated


def test_driver_gate_boundary_falls_back_to_star(spark):
    """Exactly gate+1 distinct non-self edges must take the distributed
    path (and still be correct)."""
    chain = [(i, i + 1) for i in range(8)]  # 8 distinct edges
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    out = {
        (r.node, r.component)
        for r in connected_components(df, driver_gate_edges=7).collect()
    }
    assert out == {(i, 0) for i in range(9)}

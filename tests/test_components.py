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

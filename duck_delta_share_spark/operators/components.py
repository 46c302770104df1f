"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS (MinHash/LSH, Jaccard, embedding-cosine) into
duplicate CLUSTERS so a pipeline can keep one representative per cluster.

Iterative hash-min label propagation: every node repeatedly takes the
minimum label among itself and its neighbors; at fixpoint each component
is labeled by its smallest node id. The loop is driver-side CONTROL FLOW
only — each iteration is a distributed join + aggregate, data never
collects to the driver, and ``localCheckpoint`` truncates the plan/lineage
so iteration N doesn't re-execute iterations 1..N-1.

Scale notes: rounds needed = graph diameter; near-dup graphs are
shallow clusters (diameter ≤ a few), so 3-5 rounds close them. For
adversarial long-chain graphs use the large-star/small-star variant
(O(log n) rounds) — the loop skeleton is the same. Each round shuffles
(edges ⋈ labels) hash-partitioned on node id; AQE splits skewed hub
nodes.

This is also the repo's genuinely-iterative algorithm (SURVEY.md §5: ops
whose fixpoint loops SQL can't express single-pass — the oracle uses a
recursive CTE instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 15,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min node
    id in the connected component. Nodes are the ids appearing in edges."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)

    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        # hash-min label propagation converges in O(diameter) rounds; an
        # adversarial long chain can exceed max_iterations, and silently
        # returning split components would be wrong-but-plausible output.
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — components may "
            "be split; raise max_iterations (graph diameter bound)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))

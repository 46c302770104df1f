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

from duck_delta_share_spark.operators.checkpoints import release_local_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    algorithm: str = "star",
    driver_gate_edges: int = 65536,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min node
    id in the connected component. Nodes are the ids appearing in edges.

    ``algorithm='star'`` (default) is the alternating large-star /
    small-star method (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014): each round rewires every node toward its
    neighborhood minimum, halving component diameter — O(log² n) rounds
    WORST case on any graph, vs O(diameter) for plain hash-min label
    propagation (a 1M-node chain needs ~40 star rounds but 1M hash-min
    rounds). Per round it is the same shuffle shape (groupBy min + join on
    node id); convergence is detected with a count+hash signature, one
    tiny aggregate per round. ``algorithm='hashmin'`` keeps the simple
    propagation — marginally cheaper per round on shallow near-dup graphs
    whose diameter is ≤ 3-4.

    ``driver_gate_edges`` (star path only; the r13 train-BPE-in-driver
    precedent): the deduped non-self edge set is probed with a bounded
    ``take(gate+1)`` once it is already materialized as the loop's input
    checkpoint; at or below the gate, exact union-find runs in the driver
    (microseconds) instead of paying ~10 tiny Spark jobs per star round —
    identical (node, min-id) labels by construction. Above the gate the
    distributed loop runs unchanged, so 100 TB-scale pair graphs never
    collect. 0 disables the gate. Self-loop singleton re-admission stays
    distributed either way (that side is not bounded by the gate)."""
    if algorithm == "star":
        return _connected_components_star(
            edges, src, dst, max_iterations, driver_gate_edges
        )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    changed = 0
    labels = None
    new_labels = None
    try:
        labels = sym.select(F.col("a").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        ).localCheckpoint(eager=True)
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
            # the superseded round's checkpoint is no longer referenced
            # (the new round is materialized and the changed-count
            # consumed it) — release its blocks instead of pinning one
            # copy per round
            release_local_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                break
    except BaseException:
        # mid-loop failure: the loop-internal checkpoints (edge table +
        # live round + a just-materialized next round whose changed-count
        # action failed) would otherwise stay pinned until driver GC
        # (unpersist is idempotent when labels is new_labels already)
        release_local_checkpoint(new_labels)
        release_local_checkpoint(labels)
        release_local_checkpoint(sym)
        raise
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
    # the returned plan reads only the FINAL labels checkpoint — the
    # symmetrized edge table is loop-internal and can be dropped now
    release_local_checkpoint(sym)
    return labels.select(F.col("node"), F.col("label").alias("component"))


def _large_star(e: DataFrame) -> DataFrame:
    """Every node's LARGER neighbors rewire to its neighborhood minimum:
    for each u, emit (v, m) for v ∈ N(u), v > u, with m = min(N(u) ∪ {u}).
    Output edges are oriented (bigger, smaller)."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("__mb"))
        .select("a", F.least("a", "__mb").alias("m"))
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Every node's SMALLER-or-equal neighbors rewire to the minimum:
    orient edges (bigger, smaller), group by the bigger endpoint, emit
    (v, m) for each smaller neighbor v ≠ m plus the node's own (u, m)."""
    ori = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).distinct()
    mins = ori.groupBy("a").agg(F.min("b").alias("m"))
    moved = (
        ori.join(mins, "a")
        .filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    kept = mins.select(F.col("a"), F.col("m").alias("b"))
    return moved.union(kept).distinct()


def _union_find_labels(rows) -> dict:
    """Exact driver-side union-find over (a, b) edge rows: node -> min id
    of its component. Path-halving find + union by attaching; the min is
    resolved per root afterwards, so labels equal the distributed star
    fixpoint by definition (component = min node id)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for row in rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iterations: int,
    driver_gate_edges: int = 0,
) -> DataFrame:
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # nodes appearing in SELF-LOOP edges, captured EAGERLY up front: the
    # singleton re-admission below must not embed fresh scans of the
    # (possibly very expensive — LSH pair join) edges lineage into the
    # returned lazy plan, which would re-run it on every action
    loop_nodes = None
    try:
        loop_nodes = (
            raw.filter(F.col("a") == F.col("b"))
            .select(F.col("a").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        probe_n = (driver_gate_edges + 1) if driver_gate_edges > 0 else 1
        head = e.take(probe_n)  # bounded probe of the materialized blocks
        if not head:  # no non-self edges: each edge node is a root
            # the returned plan reads ONLY loop_nodes — the (empty) edge
            # checkpoint can be dropped deterministically
            release_local_checkpoint(e)
            return loop_nodes.select(
                "node", F.col("node").alias("component")
            )
        if driver_gate_edges > 0 and len(head) <= driver_gate_edges:
            # whole edge set fits the driver budget: exact union-find,
            # zero star rounds (each round is ~10 tiny Spark jobs)
            labels = _union_find_labels(head)
            from pyspark.sql.types import StructField, StructType

            ntype = e.schema["a"].dataType
            stars = edges.sparkSession.createDataFrame(
                sorted(labels.items()),
                StructType(
                    [StructField("node", ntype), StructField("component", ntype)]
                ),
            )
            release_local_checkpoint(e)
            singletons = loop_nodes.join(
                stars.select("node"), "node", "left_anti"
            )
            return stars.union(
                singletons.select("node", F.col("node").alias("component"))
            )

        def sig(d: DataFrame):
            # count + order-independent xor of row hashes: a cheap set
            # identity (bit_xor, not sum — summing int64 hashes
            # overflows under ANSI)
            r = d.agg(
                F.count(F.lit(1)).alias("c"),
                F.expr("bit_xor(xxhash64(a, b))").alias("h"),
            ).collect()[0]
            return (r["c"], r["h"])

        prev = None
        converged = False
        for _ in range(max_iterations):
            prev_e = e
            e = _small_star(_large_star(e)).localCheckpoint(eager=True)
            release_local_checkpoint(prev_e)  # new round materialized
            cur = sig(e)
            if cur == prev:
                converged = True
                break
            prev = cur
    except BaseException:
        # failure anywhere from the loop_nodes checkpoint through the
        # iteration (take(1), a round's build, the sig collect): drop
        # the live round's blocks and the eagerly-captured self-loop
        # nodes instead of pinning them until driver GC
        release_local_checkpoint(e)
        release_local_checkpoint(loop_nodes)
        raise
    if not converged:
        import warnings

        warnings.warn(
            f"star connected_components hit max_iterations={max_iterations} "
            "without a stable edge set — components may be split; the bound "
            "is O(log² n) rounds, raise max_iterations",
            RuntimeWarning,
            stacklevel=3,
        )
    # Fixpoint edges are (node, component-min) stars; centers map to
    # themselves. Nodes that appeared ONLY in self-loop edges were removed
    # by the a != b filter before the iteration and never enter the star
    # graph — re-admit them as singleton components (parity with the
    # hashmin branch, whose symmetrized edge set keeps self loops).
    stars = (
        e.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .union(e.select(F.col("b").alias("node"), F.col("b").alias("component")))
        .distinct()
    )
    singletons = loop_nodes.join(stars.select("node"), "node", "left_anti")
    return stars.union(
        singletons.select("node", F.col("node").alias("component"))
    )

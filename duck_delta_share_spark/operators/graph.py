"""Graph centrality over an edge list — the companion to
``operators/components.py``: components turn near-dup PAIRS into
clusters; PageRank turns transition/link WEIGHTS into an importance
score (crawl prioritization, curriculum ordering, behavior-graph
features).

ALL-INTEGER fixed point: ranks live as ``rank_e`` = rank × ``scale``
(default e6) and every per-round operation is integer multiply /
integer DIV — no float op anywhere, so a round is bit-deterministic
across engines, partitionings and retries by construction (the property
that lets ``pagerank_transition_round`` hash-check one round against a
DuckDB re-derivation). Floor truncation loses < 1/scale of mass per
edge per round and never adds mass.

The loop is driver-side CONTROL FLOW only (components.py precedent):
each round is one edges ⋈ out-degree ⋈ ranks join + a hash agg keyed on
dst — data never collects to the driver except the single node COUNT
(one scalar, control-plane) and the optional per-round convergence
delta (one scalar). ``localCheckpoint`` truncates lineage each round and
the superseded round's blocks are released deterministically.

Reference surface: the reference engine (duck_delta_share) has no graph
operators; the algorithm is the public power-iteration formulation
(Page et al. 1999), damped variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duck_delta_share_spark.operators.checkpoints import release_local_checkpoint


def pagerank_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    nodes: DataFrame | None = None,
    n_rounds: int = 10,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 1_000_000,
    tol_e: int | None = None,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Damped PageRank over a (src, dst[, weight]) edge list →
    (node, rank_e) with rank_e = rank × ``scale`` as an exact BIGINT.

    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u) · w_uv / out_w(u), with
    d = ``d_num``/``d_den`` and every division an integer DIV at
    ``scale`` fixed point. From the uniform start rank_e = scale DIV N.

    ``nodes``: optional single-column ("node") frame fixing the node
    universe (e.g. all event types, including isolated ones); defaults
    to the ids appearing in ``edges``. ``tol_e``: stop early when
    max |Δrank_e| ≤ tol_e (adds one tiny join+agg per round).
    ``redistribute_dangling=False`` (the simple-damped variant) drops
    the out-degree-0 mass — matching the oracle-checked single round;
    ``True`` adds (dangling mass) DIV N to every node each round, which
    conserves total mass up to floor truncation.

    Scale shape per round: shuffle #1 keys (edges ⋈ ranks) on src,
    shuffle #2 the contribution agg on dst — both linear in |E|; hub
    skew splits under AQE. out-degrees are computed ONCE and
    checkpointed. 100 TB posture: the frames that iterate are
    node-sized (id + one long), never the corpus.
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    if not (0 < d_num < d_den):
        raise ValueError("need 0 < d_num < d_den (damping in (0,1))")
    w_col = F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w_col.alias("__w")
    )
    if nodes is None:
        node_f = (
            e.select(F.col("__src").alias("node"))
            .union(e.select(F.col("__dst").alias("node")))
            .distinct()
        )
    else:
        node_f = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    node_f = node_f.localCheckpoint(eager=True)
    n = node_f.count()  # single scalar — control-plane bounded
    if n == 0:
        return node_f.withColumn("rank_e", F.lit(0).cast("long"))
    outw = (
        e.groupBy("__src").agg(F.sum("__w").alias("__out_w"))
    ).localCheckpoint(eager=True)

    base_e = ((scale * (d_den - d_num)) // d_den) // n
    r0 = scale // n
    ranks = node_f.withColumn("rank_e", F.lit(r0).cast("long")).localCheckpoint(
        eager=True
    )

    for _ in range(n_rounds):
        contrib = (
            e.join(outw, "__src")
            .join(
                ranks.select(F.col("node").alias("__src"), "rank_e"), "__src"
            )
            .groupBy(F.col("__dst").alias("node"))
            .agg(
                F.sum(F.expr("(rank_e * __w) div __out_w")).alias("__c_e")
            )
        )
        new_rank = F.lit(base_e) + F.expr(
            f"({d_num} * coalesce(__c_e, 0)) div {d_den}"
        )
        if redistribute_dangling:
            # dangling mass = total rank held by out-degree-0 nodes;
            # 1-row frame, broadcast-crossed (BNLJ on a single row)
            dang = F.broadcast(
                ranks.join(
                    outw.select(F.col("__src").alias("node")), "node", "left_anti"
                ).agg(F.coalesce(F.sum("rank_e"), F.lit(0)).alias("__dang_e"))
            )
            stepped = (
                node_f.join(contrib, "node", "left")
                .crossJoin(dang)
                .select(
                    "node",
                    (
                        new_rank
                        + F.expr(f"({d_num} * (__dang_e div {n})) div {d_den}")
                    )
                    .cast("long")
                    .alias("rank_e"),
                )
            )
        else:
            stepped = node_f.join(contrib, "node", "left").select(
                "node", new_rank.cast("long").alias("rank_e")
            )
        stepped = stepped.localCheckpoint(eager=True)
        if tol_e is not None:
            delta = (
                stepped.join(
                    ranks.select("node", F.col("rank_e").alias("__prev")),
                    "node",
                )
                .agg(F.max(F.abs(F.col("rank_e") - F.col("__prev"))).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta <= tol_e:
                release_local_checkpoint(ranks)
                ranks = stepped
                break
        release_local_checkpoint(ranks)
        ranks = stepped

    release_local_checkpoint(outw)
    # node_f stays pinned: the returned lazy frame may still read it via
    # the last round's join lineage... it does not — `stepped` was
    # eagerly checkpointed, truncating that lineage — so release it.
    release_local_checkpoint(node_f)
    return ranks

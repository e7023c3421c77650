"""PageRank over an edge list — the second iterative-algorithm template
(with operators/kmeans.py) for driver-looped computations the reference
could only express as one MR job per iteration (SURVEY §2.9 JobControl;
§1.4: the reference has no graph operators at all).

Spark-first shape, per iteration (ONE lazy plan — no driver action):
- contributions: ONE equi-join of the rank vector with the edge list on
  src (both hash-partition on the node id; the join reuses the same
  partitioning every round), then a map-side-combining aggregate of
  rank/out_degree contributions per dst;
- dangling mass: the dangling-node SET is loop-invariant (computed once);
  per round its rank sum is a 1-row broadcast aggregate folded into the
  same plan via crossJoin — no per-round collect, so each round costs one
  job at the next materialization instead of two;
- the iteration count is fixed (power iteration converges geometrically;
  callers needing a tolerance check the per-round delta like kmeans does).

Determinism: contribution sums are DECIMAL(38,18)-exact (engine- and
partition-order-independent), divisions happen once per round in DOUBLE
(IEEE), so two runs — or a run and the numpy model in the tests — agree
to the last bit of the decimal grid.

Scale notes: state per round is one (node, rank) row per node; lineage is
cut with an EAGER localCheckpoint every round — the update references the
rank vector twice (contributions + dangling scalar), so an uncut plan
doubles per round (swap the cut for a durable write at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = DAMPING,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of damped power iteration
    over the DIRECTED edge list (callers symmetrize for undirected graphs).

    Ranks are normalized over the node set of the edge list; every node
    starts at 1/n. Uses the uniform-teleport formulation
    rank = (1-d)/n + d·Σ contrib; dangling mass is redistributed
    uniformly (computed exactly as a DECIMAL scalar per round).
    """
    edges = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: edge list has no nodes")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # loop-invariant: each edge with its source's out-degree, materialized
    # once (an index build, like IVF's assignment) — per round only the
    # rank vector joins it. The DANGLING node set (no out-edges) is equally
    # loop-invariant, so it too is computed once — not re-derived by a
    # ranks⋈out_deg join every round.
    edges_deg = edges.join(out_deg, "src").localCheckpoint(eager=True)
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        # dangling mass: exact decimal sum of dangling-node ranks, kept
        # IN-PLAN as a broadcast 1-row aggregate (no driver collect — the
        # whole iteration is one lazy plan, so a round costs ONE job at the
        # next materialization instead of a collect job + a compute job)
        dangling_mass = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(38,18)")),
                    F.lit(0).cast("decimal(38,18)"),
                ).alias("_dm")
            )
        )
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # same IEEE expression order as the former literal formulation:
        # double(dangling)/n then added to the contrib double
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib").cast("double"), F.lit(0.0))
                        + F.col("_dm").cast("double") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # EAGER materialized cut EVERY round — one executed job per
        # iteration. The update references ranks_t twice (contributions
        # AND the dangling-mass scalar), so an uncut plan DOUBLES per
        # round (2^k copies after k uncut rounds — a driver-side planning
        # blow-up, not just recompute); the per-round cut keeps lineage
        # linear and is precisely the "one job per iteration" this
        # formulation exists for (the old collect-based round was two).
        ranks = ranks.localCheckpoint(eager=True)
    return ranks

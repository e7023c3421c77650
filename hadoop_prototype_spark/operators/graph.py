"""PageRank over an edge list — the second iterative-algorithm template
(with operators/kmeans.py) for driver-looped computations the reference
could only express as one MR job per iteration (SURVEY §2.9 JobControl;
§1.4: the reference has no graph operators at all).

Spark-first shape, per iteration:
- contributions: ONE equi-join of the rank vector with the edge list on
  src (both hash-partition on the node id; the join reuses the same
  partitioning every round), then a map-side-combining aggregate of
  rank/out_degree contributions per dst;
- damping: a projection; dangling nodes (no out-edges) keep their base
  rank via a left join — no mass is silently dropped for the ranked set;
- the iteration count is fixed (power iteration converges geometrically;
  callers needing a tolerance check the per-round delta like kmeans does).

Determinism: contribution sums are DECIMAL(38,18)-exact (engine- and
partition-order-independent), divisions happen once per round in DOUBLE
(IEEE), so two runs — or a run and the numpy model in the tests — agree
to the last bit of the decimal grid.

Scale notes: state per round is one (node, rank) row per node; lineage is
cut with an EAGER localCheckpoint every few rounds (same discipline as
dedup.connected_components — swap for a durable write at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
CHECKPOINT_EVERY = 4


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
    # rank vector joins it
    edges_deg = edges.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src, "left").select(
            "node", "rank", "out_deg"
        )
        # dangling mass: exact decimal sum of ranks with no out-edges
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum(F.col("rank").cast("decimal(38,18)")), F.lit(0)).alias("m"))
            .collect()[0]["m"]
        )
        dangling_share = float(dangling) / n
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib").cast("double"), F.lit(0.0))
                        + F.lit(dangling_share)
                    )
                ).alias("rank"),
            )
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            # EAGER: the per-round dangling collect executes the full
            # lineage; without a materialized cut each round re-runs every
            # prior round (O(iter²)). kmeans avoids this because its state
            # is driver-side literals; here the state is a DataFrame.
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

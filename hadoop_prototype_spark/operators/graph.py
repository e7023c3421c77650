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

    The edge list is materialized ONCE up front (eager localCheckpoint):
    the node count, degree table, dangling set, and per-round joins all
    re-reference it, and an expensive upstream plan (e.g. the MinHash
    near-dup pair generation) would otherwise re-execute per consumer —
    measured 10.9 s → 2.7 s on the near-dup-graph query at sf0.01.
    """
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # the node set is referenced every round (contrib outer join) plus the
    # dangling build and the rank init — materialize the distinct ONCE and
    # ride the node count as an Observation on the same job (r16 opt: one
    # job where there were one count job + a union+distinct re-execution
    # per consumer)
    from pyspark.sql import Observation

    obs = Observation()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs.get["n"])
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
    for _round in range(iterations):
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
        # EAGER materialized cut between rounds — one executed job per
        # iteration. The update references ranks_t twice (contributions
        # AND the dangling-mass scalar), so an uncut plan DOUBLES per
        # round (2^k copies after k uncut rounds — a driver-side planning
        # blow-up, not just recompute); the per-round cut keeps lineage
        # linear and is precisely the "one job per iteration" this
        # formulation exists for (the old collect-based round was two).
        # The LAST round stays lazy (r16 opt): its plan references only
        # the previous checkpoint twice — no doubling — so the final
        # update computes inside the consumer's own job instead of
        # paying one extra materialization.
        if _round < iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


# fixed-point scale for the exact formulation: ranks live on a 1e-12 grid,
# so Σ ranks ≤ 1e12 and every intermediate (85 × mass) fits a BIGINT with
# five orders of magnitude to spare
PR_FP = 10**12


def pagerank_exact(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Damped power iteration with a FIXED round count in pure fixed-point
    BIGINT arithmetic — every number on the path is an integer (init
    ``PR_FP div n``, contributions ``rank_fp div out_deg``, damping
    ``(85 · mass) div 100``), so any SQL engine replays the IDENTICAL
    ranks and the query upgrades from rows-only to a full value-hash
    oracle (round-10 verdict #4; the kmeans_fit_exact1 idiom on the graph
    dimension). The convergent double-precision ``pagerank`` above stays
    the production operator; two exact rounds are what centrality
    ORDERING inside near-dup clusters needs, not convergence.

    Returns (node, rank_fp, rank) — the exact grid value and its one
    IEEE-division double for human consumption. Integer division floors
    (both engines agree on non-negative operands); the dropped remainder
    mass is ≤ out_deg·1e-12 per node per round, far below any ordering
    the fixture could distinguish. Scale shape matches ``pagerank``:
    rank state is one row per node, contributions shuffle once per round
    on the node id, the dangling scalar stays in-plan as a broadcast
    1-row aggregate; the edge list is materialized once up front (the
    ``pagerank`` rationale above)."""
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # same shape as ``pagerank``: nodes materialized once with the count
    # riding as an Observation on the checkpoint job (r16 opt)
    from pyspark.sql import Observation

    obs = Observation()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs.get["n"])
    if n == 0:
        raise ValueError("pagerank_exact: edge list has no nodes")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_deg = edges.join(out_deg, "src").localCheckpoint(eager=True)
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)

    teleport = ((damping_den - damping_num) * PR_FP) // (damping_den * n)
    ranks = nodes.withColumn("rank_fp", F.lit(PR_FP // n).cast("long"))
    for _round in range(rounds):
        dangling_mass = ranks.join(dangling_nodes, "node", "left_semi").agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("long").alias("_dm")
        )
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank_fp div out_deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "node",
                F.expr(
                    f"{teleport}L + ({damping_num} * (coalesce(contrib, 0L)"
                    f" + (_dm div {n}))) div {damping_den}"
                ).alias("rank_fp"),
            )
        )
        # last round stays lazy — see the ``pagerank`` loop's rationale
        if _round < rounds - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp").cast("double") / F.lit(float(PR_FP))).alias("rank"),
    )


def pagerank_exact_oracle_sql(
    edges_select: str,
    rounds: int = 2,
    damping_num: int = 85,
    damping_den: int = 100,
    prefix_ctes: str = "",
) -> str:
    """DuckDB twin of pagerank_exact as ``rounds`` unrolled self-join
    rounds over ``edges_select`` (a SELECT yielding src, dst; pass the
    CTEs it references — e.g. the MinHash pair chain — via
    ``prefix_ctes``, WITHOUT a trailing comma). Sums are CAST AS BIGINT
    (DuckDB sums BIGINT into HUGEINT — the round-5 lesson); integer
    division is ``//`` (floor), matching Spark's ``div`` on the
    non-negative operands this path guarantees."""
    tel = (
        f"(SELECT (({damping_den} - {damping_num}) * {PR_FP})"
        f" // ({damping_den} * n) FROM nn)"
    )
    parts = []
    if prefix_ctes:
        parts.append(prefix_ctes)
    parts.append(
        f"""edges AS ({edges_select}),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    outd AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    dang AS (
        SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outd)
    ),
    r0 AS (
        SELECT node, (SELECT {PR_FP} // n FROM nn) AS rank_fp FROM nodes
    )"""
    )
    for t in range(rounds):
        parts.append(f"""d{t} AS (
        SELECT COALESCE(CAST(sum(rank_fp) AS BIGINT), 0) AS dm
        FROM r{t} WHERE node IN (SELECT node FROM dang)
    ),
    c{t} AS (
        SELECT e.dst AS node,
               CAST(sum(r.rank_fp // o.out_deg) AS BIGINT) AS contrib
        FROM edges e JOIN outd o ON e.src = o.src JOIN r{t} r ON e.src = r.node
        GROUP BY e.dst
    ),
    r{t + 1} AS (
        SELECT nd.node,
               {tel} + ({damping_num} * (COALESCE(c.contrib, 0)
                   + (SELECT dm FROM d{t}) // (SELECT n FROM nn)))
                   // {damping_den} AS rank_fp
        FROM nodes nd LEFT JOIN c{t} c ON nd.node = c.node
    )""")
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT node, rank_fp,
           CAST(rank_fp AS DOUBLE) / {float(PR_FP)} AS rank
    FROM r{rounds}
    """
    )

"""K-means (Lloyd) training over an embedding column — the iterative
algorithm that produces the codebooks operators like IVF
(similarity.ivf_ann_topk) consume.

No reference analogue (the closest is the iterative JobControl DAG idiom,
SURVEY.md §2.9 — Mahout-era k-means ran one MR job per iteration). The
Spark-first shape, per iteration:

- ASSIGNMENT is a pure codegen projection: the k centroids are driver-side
  metadata (exactly like the IVF codebook), inlined as double literals
  into one argmin expression — no join, no shuffle, no UDF. Distance is
  the expanded form argmin_j(||c_j||² − 2⟨v, c_j⟩): ||v||² is constant per
  row, the ||c_j||² terms fold to literals, so each row costs k dot
  products inside whole-stage codegen.
- UPDATE is ONE map-side-combining hash aggregate to ≤ k rows: per-cluster
  count + per-dimension sums. Component sums are accumulated in
  DECIMAL(30,10) — exact, so the new centroids do not depend on partition
  order or AQE decisions (double sums would make every run drift in the
  last bits; decimal makes fit() bit-reproducible).
- The driver folds the k-row aggregate into new centroid literals and
  checks the max centroid shift for convergence. Per-iteration driver
  traffic is k×(dim+1) numbers — metadata-sized at any corpus scale.

Initialization is deterministic and layout-invariant: the k vectors with
the smallest md5(id) (the same salt-free hash-order idiom as
sampling.per_group_fixed_k), so fit() is reproducible across runs,
partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int


def _assign_col(centroids: list[list[float]], vec_col: str, dim: int) -> F.Column:
    """argmin_j(||c_j||² − 2⟨v,c_j⟩) (0-based) via higher-order functions
    over a single centroid-matrix LITERAL.

    An earlier form unrolled the k×dim dot products into one giant SQL
    string (~3000 expression nodes at k=8, dim=64); Catalyst analysis +
    codegen of that tree cost ~4-6 s PER DISTINCT CENTROID SET — paid on
    every Lloyd iteration and every downstream reuse of the assignment.
    The HOF form is a handful of nodes around one array<array<double>>
    literal: ~0.7 s including compile, and BIT-IDENTICAL — aggregate's
    fold and the unrolled ``+`` chain are both left-associative, so every
    partial sum (hence every distance, hence the argmin) is the same
    IEEE double."""
    comps = [[float(x) for x in c[:dim]] for c in centroids]
    c2 = []
    for cvec in comps:
        s = 0.0
        for c in cvec:
            s = s + c * c
        c2.append(s)

    # The SAME HOF tree, generated as ONE SQL string: F.lit(list) builds
    # the matrix literal element-by-element over py4j (~2 round trips per
    # component — ~0.3 s per assignment at k=8×64, paid per Lloyd round
    # and per downstream reuse); a single parse is JVM-side. CAST(repr AS
    # DOUBLE) round-trips each component exactly, so every distance (and
    # the argmin) is the identical IEEE double (r15 opt).
    def d(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    mat = ", ".join(
        "array(" + ", ".join(d(c) for c in cvec) + ")" for cvec in comps
    )
    c2a = ", ".join(d(s) for s in c2)
    dots = (
        f"transform(array({mat}), c -> aggregate(zip_with(c, {vec_col}, "
        f"(a, b) -> a * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    dists = f"zip_with(array({c2a}), {dots}, (a, b) -> a - 2.0D * b)"
    return F.expr(
        f"CAST(array_position({dists}, array_min({dists})) AS INT) - 1"
    )


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) for the given centroid list — map-side codegen only."""
    return emb.select(
        id_col, vec_col, _assign_col(centroids, vec_col, dim).alias("cluster")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], int]:
    """Lloyd iterations until max centroid shift² < tol or max_iter.

    Returns (centroids, iterations_run). Empty clusters keep their previous
    centroid (the standard fix; deterministic by construction).
    """
    init_rows = (
        emb.orderBy(md5_int(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col][:dim]] for r in init_rows]
    if not centroids:
        raise ValueError("kmeans_fit: input has no rows")
    # fewer rows than k: every row is its own centroid (k shrinks to n)

    sum_exprs = [
        f"sum(CAST(element_at({vec_col}, {i + 1}) AS DECIMAL(30,10))) AS s{i}"
        for i in range(dim)
    ]
    iterations = 0
    for _ in range(max_iter):
        iterations += 1
        assigned = assign_clusters(emb, centroids, dim, id_col, vec_col)
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *[F.expr(e) for e in sum_exprs])
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in stats:
            if r.n > 0:
                new_centroids[r.cluster] = [
                    float(r[f"s{i}"]) / r.n for i in range(dim)
                ]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, iterations


def kmeans_fit_exact1(
    emb: DataFrame,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """md5-head init + ONE Lloyd refinement in engine-portable arithmetic:
    every number on the path is either a raw data double, a
    ``floor(x·1e6 + 0.5)`` fixed-point bigint sum (exact, order-free), or
    one IEEE double division — so a SQL oracle replays the IDENTICAL
    centroids and the downstream assignment is value-hash-checkable
    cross-engine (unlike kmeans_fit, whose DECIMAL(30,10) accumulation is
    Spark-typed). One refinement step is all the cluster-balanced sampler
    needs: it wants balanced strata geometry, not convergence — and
    exactness buys the full DuckDB oracle gate (round-9 verdict #4).

    Empty clusters keep their init centroid (same rule as kmeans_fit)."""
    init_rows = (
        emb.orderBy(md5_int(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    init = [[float(x) for x in r[vec_col][:dim]] for r in init_rows]
    if not init:
        raise ValueError("kmeans_fit_exact1: input has no rows")
    assigned = assign_clusters(emb, init, dim, id_col, vec_col)
    sum_exprs = [
        f"sum(CAST(floor(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) "
        f"* 1000000.0 + 0.5) AS BIGINT)) AS s{i}"
        for i in range(dim)
    ]
    stats = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"), *[F.expr(e) for e in sum_exprs])
        .collect()
    )
    refined = [list(c) for c in init]
    for r in stats:
        if r.n > 0:
            refined[r.cluster] = [
                int(r[f"s{i}"]) / (1000000.0 * r.n) for i in range(dim)
            ]
    return refined


def kmeans_cluster_profile_exact1(
    emb: DataFrame,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_salt: str = "cbsfit",
    fit_mod: int = 4,
) -> DataFrame:
    """Per-cluster profile (cluster, n_vectors, mean_norm) from the
    EXACT1 pipeline: md5 hash-sample fit (kmeans_fit_exact1) → map-side
    HOF-argmin assignment of the FULL input → one hash aggregate. Every
    arithmetic step is engine-portable — the fit is fixed-point, the
    assignment argmin compares left-assoc double dot chains, and the mean
    norm sums ``floor(||v||·1e6 + 0.5)`` BIGINTs before ONE IEEE division
    — so the whole query value-hash-checks against the DuckDB twin
    (similarity.kmeans_cluster_profile_exact1_oracle_sql). This is the
    registered shape of z_kmeans_clusters; the convergent max_iter Lloyd
    fit (kmeans_fit / kmeans_cluster_sizes) stays available for codebook
    consumers and is numpy-agreement-pinned in tests."""
    from ..functions.hashing import md5_int

    fit_sample = emb.filter(
        md5_int(F.col(id_col).cast("string"), salt=fit_salt) % fit_mod == 0
    )
    centroids = kmeans_fit_exact1(
        fit_sample, k=k, dim=dim, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_clusters(emb, centroids, dim, id_col, vec_col)
    # same left-assoc square-sum order as the oracle's expanded chain:
    # the fold seeds at 0.0 and squares are never -0.0, so 0.0 + t1 == t1
    norm = (
        f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (a, b) -> a + b))"
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            F.expr(f"sum(CAST(floor({norm} * 1000000.0 + 0.5) AS BIGINT))").cast(
                "double"
            )
            / (F.lit(1000000.0) * F.count(F.lit(1)))
        ).alias("mean_norm"),
    )


def kmeans_cluster_sizes(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment summary: (cluster, n_vectors, mean_norm).
    Registered as the driver-visible query form (rows-only check — the
    iterative fit is not SQL-expressible)."""
    centroids, _ = kmeans_fit(emb, k, max_iter, dim=dim, id_col=id_col, vec_col=vec_col)
    assigned = assign_clusters(emb, centroids, dim, id_col, vec_col)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.expr(
            f"CAST(sum(CAST(sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * x), "
            f"0.0D, (a, b) -> a + b)) AS DECIMAL(30,10))) AS DOUBLE) / count(1)"
        ).alias("mean_norm"),
    )

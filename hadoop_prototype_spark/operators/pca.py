"""PCA projection / whitening over embedding columns (engine extension —
the embedding-curation stage upstream of ANN search and semantic dedup:
decorrelate + compress vectors so cosine buckets and k-means clusters
work in a lower-dimensional, isotropic space).

Fit-on-sample, project-everything — the only shape that works at 100 TB:
the model (a dim×k matrix + a dim mean) is fit ONCE on a bounded,
deterministic sample and the projection is a broadcast-literal,
pure-codegen map-side expression — zero shuffle, zero Python in the hot
path, exactly like kmeans.assign_clusters / prototype_scores' scoring
leg (operators/kmeans.py:68 documents the sample-fit rationale).

Determinism: the sample is the ``sample_cap`` smallest-md5(id) rows
(the salt-free hash-order idiom used by kmeans_fit and InputSampler),
``numpy.linalg.eigh`` is deterministic for a given matrix, and each
eigenvector's sign is canonicalized (its largest-|coordinate| entry is
made positive), so the model — and every projected value — is a pure
function of the input data, independent of partitioning.

Reference analogue: none (the reference has no vector ops); this slots
into SURVEY.md's LLM-pipeline extension set next to kmeans/similarity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int

EMBED_DIM = 64  # fixture embedding width (similarity.EMBED_DIM)


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]  # dim
    components: tuple[tuple[float, ...], ...]  # k rows, each dim wide
    eigenvalues: tuple[float, ...]  # k, descending (sample variances)

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def pca_fit(
    emb: DataFrame,
    k: int = 8,
    dim: int = EMBED_DIM,
    sample_cap: int | None = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit a k-component PCA on (a deterministic sample of) the vectors.

    ``sample_cap=None`` uses every row (exact PCA — fine up to a few
    million rows; the default cap is the 100 TB posture)."""
    import numpy as np

    sampled = emb.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
    if sample_cap is not None:
        sampled = sampled.orderBy(
            md5_int(F.col("i").cast("string")), F.col("i")
        ).limit(sample_cap)
    rows = sampled.collect()
    if not rows:
        raise ValueError("pca_fit: input has no rows")
    x = np.array([r.v[:dim] for r in rows], dtype=np.float64)
    if x.shape[0] <= 1:
        raise ValueError("pca_fit: need at least 2 rows")
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / (x.shape[0] - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, eigs = [], []
    for j in order:
        v = vecs[:, j]
        # canonical sign: the largest-|coordinate| entry is positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(tuple(float(c) for c in v))
        eigs.append(float(max(vals[j], 0.0)))
    return PCAModel(
        mean=tuple(float(m) for m in mean),
        components=tuple(comps),
        eigenvalues=tuple(eigs),
    )


def _project_exprs(
    model: PCAModel, vec_col: str, whiten: bool, eps: float
) -> list[str]:
    exprs = []
    for j, comp in enumerate(model.components):
        dot = " + ".join(
            f"(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - "
            f"CAST({model.mean[i]!r} AS DOUBLE)) * CAST({c!r} AS DOUBLE)"
            for i, c in enumerate(comp)
        )
        if whiten:
            scale = 1.0 / (model.eigenvalues[j] + eps) ** 0.5
            exprs.append(f"({dot}) * CAST({scale!r} AS DOUBLE)")
        else:
            exprs.append(f"({dot})")
    return exprs


def pca_project(
    emb: DataFrame,
    model: PCAModel,
    whiten: bool = False,
    vec_col: str = "embedding",
    out_col: str = "pc",
    eps: float = 1e-9,
) -> DataFrame:
    """Append ``out_col`` = array<double> of the k projected (optionally
    whitened) coordinates. Broadcast-literal map-side codegen: the model
    is baked into the plan, no join, no shuffle, no Python."""
    arr = "array(" + ", ".join(_project_exprs(model, vec_col, whiten, eps)) + ")"
    return emb.withColumn(out_col, F.expr(arr))


def explained_variance_ratio(
    model: PCAModel, total_variance: float | None = None
) -> list[float]:
    """Per-component share of the sample variance (of the retained total
    when ``total_variance`` is not given)."""
    tot = total_variance if total_variance is not None else sum(model.eigenvalues)
    return [v / tot if tot > 0 else 0.0 for v in model.eigenvalues]


# --- exact power-iteration principal direction (oracle-checkable) ----------


def _dot_sql(vec_col: str, v: list[float]) -> str:
    """Left-assoc SQL dot of a data vector with a literal vector — the
    same partial-sum order as the HOF fold and the DuckDB twin."""
    return " + ".join(
        f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) * CAST({c!r} AS DOUBLE)"
        for i, c in enumerate(v)
    )


def pca_power_scores(
    emb: DataFrame,
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-row score along the TOP principal direction, computed with a
    FIXED number of power-iteration rounds in engine-portable arithmetic
    — the exact-iteration idiom (kmeans_fit_exact1, pagerank_exact) on
    the eigenvector problem, which buys this family a full value-hash
    DuckDB oracle where eigh-based pca_fit is rows-only by nature.

    Each round is ONE pass: y_i = ⟨x_i, v⟩ map-side, then 64 fixed-point
    bigint sums s_j = Σ_i floor(x_ij·y_i·1e6 + 0.5) — exact and
    partition-order-free — collected (64 numbers of driver traffic, the
    kmeans pattern); v updates as s/1e6 normalized, every step one IEEE
    op replayed identically by the SQL twin. Iterates the UNCENTERED
    second-moment matrix (XᵀX)v — the scale factor 1/n cancels in the
    normalization, and skipping the mean keeps the twin exact; for a
    centered model use pca_fit. v0 is all-ones (deterministic; the
    fixture's embedding distribution is not orthogonal to it). Two
    rounds give the ordering/geometry consumers need — the idiom trades
    convergence for exactness, as documented at kmeans_fit_exact1."""
    import math

    v = [1.0] * dim
    for _ in range(rounds):
        with_y = emb.select(vec_col, F.expr(_dot_sql(vec_col, v)).alias("_y"))
        aggs = [
            F.expr(
                f"sum(CAST(floor(CAST(element_at({vec_col}, {j + 1}) AS DOUBLE)"
                f" * _y * 1000000.0 + 0.5) AS BIGINT)) AS s{j}"
            )
            for j in range(dim)
        ]
        row = with_y.agg(*aggs).first()
        m = [row[f"s{j}"] / 1000000.0 for j in range(dim)]
        acc = 0.0
        for x in m:  # left-assoc, matching the SQL twin's + chain
            acc = acc + x * x
        norm = math.sqrt(acc)
        v = [x / norm for x in m]
    return emb.select(
        id_col, label_col, F.expr(_dot_sql(vec_col, v)).alias("pc_score")
    )


def _orthonormalize(u: list[float], comps: list[list[float]]) -> list[float]:
    """Driver-side Gram-Schmidt + normalize in the EXACT left-assoc IEEE
    order the SQL twin replays: subtract the projection onto each prior
    component in sequence, then one sqrt + per-element division."""
    import math

    for prev in comps:
        proj = 0.0
        for j in range(len(u)):  # left-assoc + chain
            proj = proj + prev[j] * u[j]
        u = [u[j] - proj * prev[j] for j in range(len(u))]
    acc = 0.0
    for x in u:
        acc = acc + x * x
    norm = math.sqrt(acc)
    return [x / norm for x in u]


def pca_power_components(
    emb: DataFrame,
    k: int = 2,
    rounds: int = 2,
    dim: int = EMBED_DIM,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The top-k principal directions of the UNCENTERED second-moment
    matrix by fixed-round power iteration with Gram-Schmidt deflation —
    every step engine-portable (the pca_power_scores idiom, extended to
    k components): per round ONE pass computes y_i = ⟨x_i, u⟩ map-side
    and dim fixed-point bigint sums s_j = Σ floor(x_ij·y_i·1e6 + 0.5)
    (exact, partition-order-free, dim numbers of driver traffic); u then
    updates driver-side as orthonormalize(s/1e6) against all prior
    components. Deflation happens on the dim-sized DRIVER vector, never
    the data — the per-row pass stays one dim-term dot, so expression
    width (and codegen size — the 64 KB lesson) is identical to the
    single-component case."""
    comps: list[list[float]] = []
    for _ in range(k):
        u = _orthonormalize([1.0] * dim, comps)
        for _r in range(rounds):
            with_y = emb.select(
                vec_col, F.expr(_dot_sql(vec_col, u)).alias("_y")
            )
            aggs = [
                F.expr(
                    f"sum(CAST(floor(CAST(element_at({vec_col}, {j + 1}) AS "
                    f"DOUBLE) * _y * 1000000.0 + 0.5) AS BIGINT)) AS s{j}"
                )
                for j in range(dim)
            ]
            row = with_y.agg(*aggs).first()
            u = _orthonormalize(
                [row[f"s{j}"] / 1000000.0 for j in range(dim)], comps
            )
        comps.append(u)
    return comps


def pca_power_project(
    emb: DataFrame,
    k: int = 2,
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-row projection onto the top-k power-iteration directions:
    (id, label, pc1..pck) — the oracle-gated PCA projection (deflation
    makes pc2+ available where pca_power_scores stops at the top
    direction; the eigh-based whitening model pca_fit stays the
    numerical-quality path, test-pinned against numpy)."""
    comps = pca_power_components(emb, k=k, rounds=rounds, dim=dim,
                                 vec_col=vec_col)
    return emb.select(
        id_col,
        label_col,
        *[
            F.expr(_dot_sql(vec_col, c)).alias(f"pc{i + 1}")
            for i, c in enumerate(comps)
        ],
    )


def _hof_dot(vec_col: str, v: list[float]) -> str:
    """HOF dot of a data vector with a literal vector: one zip_with +
    left-fold aggregate — 3 plan expressions instead of a 64-term unrolled
    chain, with the IDENTICAL IEEE result: the fold's accumulator starts
    at 0.0 and 0.0 + t == t exactly, so (0 + t0) + t1 + … equals
    _dot_sql's left-assoc (t0 + t1) + … chain term for term."""
    lits = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in v)
    return (
        f"aggregate(zip_with({vec_col}, array({lits}), "
        "(x, c) -> CAST(x AS DOUBLE) * c), CAST(0.0 AS DOUBLE), "
        "(acc, t) -> acc + t)"
    )


def _block_u0(dim: int) -> tuple[list[float], list[float]]:
    """The deterministic, EXACTLY-orthonormal starting pair for block
    iteration: u1 = all 1/sqrt(dim), u2 = alternating ±1/sqrt(dim). For
    dim a power of 4 (the fixture's 64) 1/sqrt(dim) is exactly
    representable (0.125), so the literals embed losslessly in both
    engines and no starting orthonormalization pass is needed."""
    s = 1.0 / (dim**0.5)
    return [s] * dim, [s if j % 2 == 0 else -s for j in range(dim)]


def pca_power_project_block(
    emb: DataFrame,
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Top-2 projection by BLOCK (simultaneous orthogonal) power
    iteration — the round-12 verdict's fused formulation of
    pca_power_project: instead of iterating component 2 only after
    component 1 converged (k·rounds = 4 aggregate passes), both
    directions advance in the SAME pass — per round ONE scan computes
    y1 = ⟨x, u1⟩ and y2 = ⟨x, u2⟩ map-side plus 2·dim fixed-point bigint
    sums s{c}_j = Σ floor(x_j·y{c}·1e6 + 0.5), then the driver
    re-orthonormalizes the pair (Gram-Schmidt on 64-float vectors, the
    pca_power_components discipline). Halves the pass count at identical
    per-pass cost; every step stays engine-portable, so the DuckDB twin
    (pca_power_project_block_oracle_sql) hash-matches. Subspace
    iteration converges to the same top-2 invariant subspace as deflated
    iteration; with FIXED rounds the two formulations differ in the
    trailing digits — each is exact against its own twin, which is the
    gate's contract (the kmeans_fit_exact1 idiom)."""
    u1, u2 = _block_u0(dim)
    inner = ", ".join(
        f"sum(CAST(floor(CAST(element_at({vec_col}, {j + 1}) AS DOUBLE)"
        f" * _y{c} * 1000000.0 + 0.5) AS BIGINT)) AS s{c}_{j}"
        for c in (1, 2)
        for j in range(dim)
    )
    for _ in range(rounds):
        # plan-size discipline (round-13 profile: at 2k fixture rows this
        # query is 100% fixed plan-handling cost, 0% data): the two dots
        # are HOF folds (3 expressions each, not 64-term unrolled chains
        # — that alone was 0.8 s/pass of analysis), and all 2·dim sums
        # ride in ONE struct expression string (one py4j hop; the verify
        # skill's 60-agg lesson)
        with_y = emb.selectExpr(
            vec_col,
            f"{_hof_dot(vec_col, u1)} AS _y1",
            f"{_hof_dot(vec_col, u2)} AS _y2",
        )
        row = with_y.agg(F.expr(f"struct({inner})").alias("s")).first()["s"]
        m1 = [row[f"s1_{j}"] / 1000000.0 for j in range(dim)]
        m2 = [row[f"s2_{j}"] / 1000000.0 for j in range(dim)]
        u1 = _orthonormalize(m1, [])
        u2 = _orthonormalize(m2, [u1])
    return emb.selectExpr(
        id_col,
        label_col,
        f"{_hof_dot(vec_col, u1)} AS pc1",
        f"{_hof_dot(vec_col, u2)} AS pc2",
    )


def pca_power_project_block_oracle_sql(
    table: str = "embeddings",
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """DuckDB twin of pca_power_project_block: per round one y-CTE (both
    dots), one 2·dim-sum s-CTE (fixed-point bigint, CAST from HUGEINT),
    then the pair's Gram-Schmidt as 1-row CTEs replaying the driver's
    IEEE op order exactly — normalize u1, project m2 onto it
    (left-assoc), subtract, normalize."""

    def dot_data(vpfx: str) -> str:
        return " + ".join(
            f"CAST(e.{vec_col}[{i + 1}] AS DOUBLE) * {vpfx}.c{i}"
            for i in range(dim)
        )

    s = 1.0 / (dim**0.5)
    ctes = [
        "u1_0 AS (SELECT "
        + ", ".join(f"CAST({s!r} AS DOUBLE) AS c{j}" for j in range(dim))
        + ")",
        "u2_0 AS (SELECT "
        + ", ".join(
            f"CAST({(s if j % 2 == 0 else -s)!r} AS DOUBLE) AS c{j}"
            for j in range(dim)
        )
        + ")",
    ]
    for r in range(1, rounds + 1):
        fx = ", ".join(
            f"CAST(sum(CAST(floor(CAST(e.{vec_col}[{j + 1}] AS DOUBLE)"
            f" * y.y{c} * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s{c}_{j}"
            for c in (1, 2)
            for j in range(dim)
        )
        ms = ", ".join(
            f"CAST(s{c}_{j} AS DOUBLE) / 1000000.0 AS m{c}_{j}"
            for c in (1, 2)
            for j in range(dim)
        )
        n1 = " + ".join(f"m.m1_{j} * m.m1_{j}" for j in range(dim))
        proj = " + ".join(f"a.c{j} * m.m2_{j}" for j in range(dim))
        n2 = " + ".join(f"g.g{j} * g.g{j}" for j in range(dim))
        ctes.append(
            f"""y{r} AS (
        SELECT e.{id_col}, ({dot_data('a')}) AS y1, ({dot_data('b')}) AS y2
        FROM {table} e CROSS JOIN u1_{r - 1} a CROSS JOIN u2_{r - 1} b
    ), s{r} AS (
        SELECT {fx} FROM {table} e JOIN y{r} y ON e.{id_col} = y.{id_col}
    ), m{r} AS (SELECT {ms} FROM s{r}),
    n1_{r} AS (SELECT sqrt({n1}) AS nrm FROM m{r} m),
    u1_{r} AS (SELECT """
            + ", ".join(f"m.m1_{j} / n.nrm AS c{j}" for j in range(dim))
            + f""" FROM m{r} m, n1_{r} n),
    p{r} AS (SELECT ({proj}) AS proj FROM u1_{r} a, m{r} m),
    g{r} AS (SELECT """
            + ", ".join(
                f"m.m2_{j} - p.proj * a.c{j} AS g{j}" for j in range(dim)
            )
            + f""" FROM m{r} m, p{r} p, u1_{r} a),
    n2_{r} AS (SELECT sqrt({n2}) AS nrm FROM g{r} g),
    u2_{r} AS (SELECT """
            + ", ".join(f"g.g{j} / n.nrm AS c{j}" for j in range(dim))
            + f" FROM g{r} g, n2_{r} n)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.{id_col}, e.{label_col},
           ({dot_data('a')}) AS pc1, ({dot_data('b')}) AS pc2
    FROM {table} e CROSS JOIN u1_{rounds} a CROSS JOIN u2_{rounds} b
    """
    )


def pca_power_project_oracle_sql(
    table: str = "embeddings",
    k: int = 2,
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """DuckDB twin of pca_power_project: one CTE chain per component
    re-derives every round's direction with identical arithmetic —
    left-assoc dots, fixed-point bigint sums (CAST from HUGEINT),
    sequential Gram-Schmidt subtraction against the prior components'
    CTEs, one sqrt + division per normalize — so the k per-row
    projections hash-match the engine's."""

    def dot_data(vpfx: str) -> str:
        return " + ".join(
            f"CAST(e.{vec_col}[{i + 1}] AS DOUBLE) * {vpfx}.c{i}"
            for i in range(dim)
        )

    ctes: list[str] = []
    final_refs: list[str] = []

    def ortho_cte(name: str, src: str, src_cols: str, priors: list[str]) -> None:
        """CTEs: project out each prior in sequence, then normalize.
        ``src_cols`` is a prefix-less column template m{j} in ``src``."""
        cur, cols = src, [f"{src_cols}{j}" for j in range(dim)]
        for pi, p in enumerate(priors):
            proj = " + ".join(f"{p}.c{j} * x.{cols[j]}" for j in range(dim))
            nm = f"{name}_o{pi}"
            out = ", ".join(
                f"x.{cols[j]} - pr.proj * {p}.c{j} AS g{j}" for j in range(dim)
            )
            ctes.append(
                f"{nm}_p AS (SELECT ({proj}) AS proj FROM {cur} x, {p} {p}),\n"
                f"    {nm} AS (SELECT {out} FROM {cur} x, {nm}_p pr, {p} {p})"
            )
            cur, cols = nm, [f"g{j}" for j in range(dim)]
        nrm = " + ".join(f"x.{cols[j]} * x.{cols[j]}" for j in range(dim))
        vs = ", ".join(
            f"x.{cols[j]} / sqrt({nrm.replace('x.', 'x.')}) AS c{j}"
            for j in range(dim)
        )
        # compute the norm once in its own CTE (one sqrt, like the driver)
        ctes.append(
            f"{name}_n AS (SELECT sqrt({nrm}) AS nrm FROM {cur} x),\n"
            f"    {name} AS (SELECT "
            + ", ".join(f"x.{cols[j]} / n.nrm AS c{j}" for j in range(dim))
            + f" FROM {cur} x, {name}_n n)"
        )

    for ci in range(k):
        priors = final_refs[:]
        ones = ", ".join(f"CAST(1.0 AS DOUBLE) AS m{j}" for j in range(dim))
        ctes.append(f"k{ci}_raw0 AS (SELECT {ones})")
        ortho_cte(f"k{ci}_u0", f"k{ci}_raw0", "m", priors)
        cur_v = f"k{ci}_u0"
        for r in range(1, rounds + 1):
            fx = ", ".join(
                f"CAST(sum(CAST(floor(CAST(e.{vec_col}[{j + 1}] AS DOUBLE)"
                f" * y.y * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s{j}"
                for j in range(dim)
            )
            ms = ", ".join(
                f"CAST(s{j} AS DOUBLE) / 1000000.0 AS m{j}" for j in range(dim)
            )
            ctes.append(
                f"k{ci}_y{r} AS (SELECT e.{id_col}, ({dot_data('v')}) AS y "
                f"FROM {table} e CROSS JOIN {cur_v} v),\n"
                f"    k{ci}_s{r} AS (SELECT {fx} FROM {table} e "
                f"JOIN k{ci}_y{r} y ON e.{id_col} = y.{id_col}),\n"
                f"    k{ci}_m{r} AS (SELECT {ms} FROM k{ci}_s{r})"
            )
            ortho_cte(f"k{ci}_u{r}", f"k{ci}_m{r}", "m", priors)
            cur_v = f"k{ci}_u{r}"
        final_refs.append(cur_v)

    proj_cols = ", ".join(
        f"({dot_data(v)}) AS pc{i + 1}" for i, v in enumerate(final_refs)
    )
    froms = " ".join(f"CROSS JOIN {v} {v}" for v in final_refs)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.{id_col}, e.{label_col}, {proj_cols}
    FROM {table} e {froms}
    """
    )


def pca_power_scores_oracle_sql(
    table: str = "embeddings",
    rounds: int = 2,
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """DuckDB twin of pca_power_scores: the v-vector CTE chain re-derives
    every round's direction with the identical arithmetic (left-assoc
    dots, fixed-point bigint sums CAST from DuckDB's HUGEINT, one IEEE
    division per step), so the final per-row scores hash-match."""

    def dot_with(vprefix: str) -> str:
        return " + ".join(
            f"CAST(e.{vec_col}[{i + 1}] AS DOUBLE) * {vprefix}.c{i}"
            for i in range(dim)
        )

    ctes = [
        "v0 AS (SELECT "
        + ", ".join(f"CAST(1.0 AS DOUBLE) AS c{i}" for i in range(dim))
        + ")"
    ]
    for r in range(1, rounds + 1):
        fx = ", ".join(
            f"CAST(sum(CAST(floor(CAST(e.{vec_col}[{j + 1}] AS DOUBLE)"
            f" * y.y * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s{j}"
            for j in range(dim)
        )
        ms = ", ".join(
            f"CAST(s{j} AS DOUBLE) / 1000000.0 AS m{j}" for j in range(dim)
        )
        nrm = " + ".join(f"m{j} * m{j}" for j in range(dim))
        vs = ", ".join(f"m{j} / sqrt({nrm}) AS c{j}" for j in range(dim))
        ctes.append(
            f"""y{r} AS (
        SELECT e.{id_col}, ({dot_with('v')}) AS y
        FROM {table} e CROSS JOIN v{r - 1} v
    ), s{r} AS (
        SELECT {fx} FROM {table} e JOIN y{r} y ON e.{id_col} = y.{id_col}
    ), m{r} AS (SELECT {ms} FROM s{r}),
    v{r} AS (SELECT {vs} FROM m{r})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.{id_col}, e.{label_col}, ({dot_with('v')}) AS pc_score
    FROM {table} e CROSS JOIN v{rounds} v
    """
    )

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

"""PCA projection / whitening (operators/pca.py): numpy agreement on the
full fixture, whitened isotropy, deterministic sample-fit, and the
zero-shuffle broadcast-literal projection plan."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_prototype_spark.operators import pca
from hadoop_prototype_spark.sources.tables import load_table

K = 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_full_fit_matches_numpy_eigendecomposition(emb, emb_np):
    model = pca.pca_fit(emb, k=K, sample_cap=None)
    x = emb_np - emb_np.mean(axis=0)
    cov = (x.T @ x) / (x.shape[0] - 1)
    vals, vecs = np.linalg.eigh(cov)
    top = np.argsort(vals)[::-1][:K]
    assert np.allclose(model.mean, emb_np.mean(axis=0), atol=1e-9)
    assert np.allclose(model.eigenvalues, vals[top], rtol=1e-9)
    for j, comp in enumerate(model.components):
        # same 1-D eigenspace: |cos| == 1 (sign is canonicalized our side)
        cos = float(np.dot(comp, vecs[:, top[j]]))
        assert abs(abs(cos) - 1.0) < 1e-9
        assert abs(np.linalg.norm(comp) - 1.0) < 1e-9  # orthonormal


def test_projected_variance_equals_eigenvalues(spark, emb, emb_np):
    model = pca.pca_fit(emb, k=K, sample_cap=None)
    proj = pca.pca_project(emb, model).select("pc").collect()
    p = np.array([r.pc for r in proj])
    var = p.var(axis=0, ddof=1)
    assert np.allclose(var, model.eigenvalues, rtol=1e-6)
    # components are ordered by descending captured variance
    assert all(a >= b for a, b in zip(var, var[1:]))


def test_whitened_projection_is_isotropic(emb):
    model = pca.pca_fit(emb, k=K, sample_cap=None)
    p = np.array(
        [r.pc for r in pca.pca_project(emb, model, whiten=True).select("pc").collect()]
    )
    cov = np.cov(p.T)
    assert np.allclose(cov, np.eye(K), atol=1e-4)


def test_sample_fit_is_deterministic_and_close_to_full(emb):
    m1 = pca.pca_fit(emb, k=K, sample_cap=500)
    m2 = pca.pca_fit(emb, k=K, sample_cap=500)
    assert m1 == m2  # bit-identical across runs: md5-ordered sample
    full = pca.pca_fit(emb, k=K, sample_cap=None)
    # the sampled top subspace approximates the full one (principal angles)
    s = np.array(m1.components) @ np.array(full.components).T
    # each sampled component lives mostly in the full top-K subspace
    assert (np.linalg.norm(s, axis=1) > 0.8).all()


def test_projection_plan_is_mapside_codegen_only(emb):
    model = pca.pca_fit(emb, k=K, sample_cap=256)
    out = pca.pca_project(emb, model)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: model baked as literals
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_power_scores_match_numpy_model_and_climb_rayleigh(spark, emb):
    """Math checks (the DuckDB oracle pins cross-engine exactness; this
    pins MEANING): (a) the scores equal a numpy simulation of the same
    fixed-point power iteration near-exactly; (b) the direction's
    Rayleigh quotient is non-decreasing in rounds and sits above the
    spectrum's mean — the power-iteration property that holds even on
    the fixture's nearly-flat spectrum (top eigengap ~1.07, so
    convergence-to-eigh is NOT a meaningful pin here)."""
    import numpy as np

    from hadoop_prototype_spark.operators.pca import pca_power_scores

    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]

    def model_scores(rounds):
        v = np.ones(64)
        for _ in range(rounds):
            y = X @ v
            m = np.array(
                [np.floor(X[:, j] * y * 1e6 + 0.5).sum() / 1e6 for j in range(64)]
            )
            v = m / np.linalg.norm(m)
        return dict(zip(ids, X @ v)), v

    rayleighs = []
    for rounds in (1, 2, 4):
        got = {
            r.vec_id: r.pc_score
            for r in pca_power_scores(emb, rounds=rounds).collect()
        }
        want, v = model_scores(rounds)
        diffs = [abs(got[i] - want[i]) for i in ids]
        assert max(diffs) < 1e-9, (rounds, max(diffs))
        rayleighs.append(float(v @ (X.T @ (X @ v))))
    assert rayleighs[0] <= rayleighs[1] + 1e-9 <= rayleighs[2] + 2e-9, rayleighs
    assert rayleighs[-1] > np.trace(X.T @ X) / 64  # above the mean eigenvalue

def test_pca_power_project_block_matches_numpy_and_spans_top_subspace(emb):
    """The fused block iteration (round 13 — one 128-sum pass per round
    instead of two 64-sum passes per component): (a) pc1/pc2 equal a
    numpy simulation of the same fixed-point block iteration
    near-exactly; (b) the implied directions are orthonormal; (c) the
    2-D subspace captures at least as much second-moment energy as the
    single-direction power path (it contains a same-quality leading
    direction plus an orthogonal one)."""
    import numpy as np

    from hadoop_prototype_spark.operators.pca import (
        _block_u0,
        pca_power_project_block,
    )

    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    ids = [r.vec_id for r in rows]

    u1, u2 = (np.array(u) for u in _block_u0(64))
    for _ in range(2):
        y1, y2 = X @ u1, X @ u2
        m1 = np.array(
            [np.floor(X[:, j] * y1 * 1e6 + 0.5).sum() / 1e6 for j in range(64)]
        )
        m2 = np.array(
            [np.floor(X[:, j] * y2 * 1e6 + 0.5).sum() / 1e6 for j in range(64)]
        )
        u1 = m1 / np.linalg.norm(m1)
        g = m2 - (u1 @ m2) * u1
        u2 = g / np.linalg.norm(g)
    want1 = dict(zip(ids, X @ u1))
    want2 = dict(zip(ids, X @ u2))

    got = {r.vec_id: (r.pc1, r.pc2) for r in pca_power_project_block(emb).collect()}
    d1 = max(abs(got[i][0] - want1[i]) for i in ids)
    d2 = max(abs(got[i][1] - want2[i]) for i in ids)
    assert d1 < 1e-9 and d2 < 1e-9, (d1, d2)

    assert abs(u1 @ u1 - 1.0) < 1e-12
    assert abs(u2 @ u2 - 1.0) < 1e-12
    assert abs(u1 @ u2) < 1e-12

    M = X.T @ X
    energy2d = float(u1 @ M @ u1 + u2 @ M @ u2)
    # the single-direction 2-round power path's energy (same v0 as u1)
    v = np.ones(64)
    for _ in range(2):
        y = X @ v
        m = np.array(
            [np.floor(X[:, j] * y * 1e6 + 0.5).sum() / 1e6 for j in range(64)]
        )
        v = m / np.linalg.norm(m)
    assert energy2d >= float(v @ M @ v) - 1e-6

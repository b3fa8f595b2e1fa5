"""3D (7-point voxel) mode tests: operator vs dense oracle, analytical slab
oracles, solver agreement (Jacobi/CG/MGCG), Galerkin identity, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from effectivediffusivityfvm_tpu.ops import fvm3d
from effectivediffusivityfvm_tpu.solvers.solvers3d import (
    build_hierarchy_3d,
    coarsen_3d,
    solve_cg_3d,
    solve_cg_3d_batched,
    solve_jacobi_3d,
    solve_mgcg_3d,
)


def to_sparse_3d(c):
    diag = np.asarray(c.diag)
    nz, ny, nx = diag.shape
    n = diag.size
    return sp.diags(
        [diag.ravel(),
         -np.asarray(c.a_w).ravel()[1:], -np.asarray(c.a_e).ravel()[:-1],
         -np.asarray(c.a_n).ravel()[nx:], -np.asarray(c.a_s).ravel()[:-nx],
         -np.asarray(c.a_u).ravel()[nx * ny:], -np.asarray(c.a_d).ravel()[:-nx * ny]],
        [0, -1, 1, -nx, nx, -nx * ny, nx * ny], format="csc")


def hmean(a, b):
    return 0.0 if (a == 0.0 or b == 0.0) else 2.0 * a * b / (a + b)


def dense_assembly_3d(d, cl, cr):
    """Independent loop-based oracle of the 7-point discretization."""
    nz, ny, nx = d.shape
    dx, dy, dz = 1.0 / nx, 1.0 / ny, 1.0 / nz
    n = d.size
    A = sp.lil_matrix((n, n))
    b = np.zeros(n)
    for k in range(nz):
        for i in range(ny):
            for j in range(nx):
                p = (k * ny + i) * nx + j
                diag = 0.0
                if j > 0:
                    kk = hmean(d[k, i, j], d[k, i, j - 1]) * dy * dz / dx
                    A[p, p - 1] = -kk; diag += kk
                else:
                    kk = d[k, i, j] * dy * dz / (dx / 2)
                    diag += kk; b[p] += cl * kk
                if j < nx - 1:
                    kk = hmean(d[k, i, j], d[k, i, j + 1]) * dy * dz / dx
                    A[p, p + 1] = -kk; diag += kk
                else:
                    kk = d[k, i, j] * dy * dz / (dx / 2)
                    diag += kk; b[p] += cr * kk
                if i > 0:
                    kk = hmean(d[k, i, j], d[k, i - 1, j]) * dx * dz / dy
                    A[p, p - nx] = -kk; diag += kk
                if i < ny - 1:
                    kk = hmean(d[k, i, j], d[k, i + 1, j]) * dx * dz / dy
                    A[p, p + nx] = -kk; diag += kk
                if k > 0:
                    kk = hmean(d[k, i, j], d[k - 1, i, j]) * dx * dy / dz
                    A[p, p - nx * ny] = -kk; diag += kk
                if k < nz - 1:
                    kk = hmean(d[k, i, j], d[k + 1, i, j]) * dx * dy / dz
                    A[p, p + nx * ny] = -kk; diag += kk
                A[p, p] = diag
    return A.tocsr(), b


def problem(rng, nz=6, ny=7, nx=8, contrast=100.0):
    d = np.exp(rng.uniform(0, np.log(contrast), (nz, ny, nx)))
    dj = jnp.asarray(d)
    c = fvm3d.fvm_coefficients_3d(dj, 0.0, 1.0)
    spec = fvm3d.make_flux_spec_3d(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (nz, ny, nx))
    return c, spec, x0, d


class TestOperator3D:
    def test_matches_dense_oracle(self, rng):
        c, _, _, d = problem(rng)
        A_ref, b_ref = dense_assembly_3d(d, 0.0, 1.0)
        A_ours = to_sparse_3d(c)
        np.testing.assert_allclose(A_ours.toarray(), A_ref.toarray(), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(c.b).ravel(), b_ref, rtol=1e-12)

    def test_apply_matches_dense(self, rng):
        c, _, _, d = problem(rng)
        A_ref, _ = dense_assembly_3d(d, 0.0, 1.0)
        x = rng.random(d.shape)
        np.testing.assert_allclose(
            np.asarray(fvm3d.apply_operator_3d(c, jnp.asarray(x))).ravel(),
            A_ref @ x.ravel(), rtol=1e-11)


class TestAnalytical3D:
    @pytest.mark.parametrize("eps", [0.25, 0.5, 0.75])
    def test_parallel_slabs(self, eps):
        """z-slabs spanning x: Deff = eps*Df + (1-eps)*Ds (eq. 7 in 3D)."""
        n = 16
        d = np.full((n, n, n), 0.1)
        d[: int(round(eps * n))] = 1.0
        dj = jnp.asarray(d)
        c = fvm3d.fvm_coefficients_3d(dj, 0.0, 1.0)
        spec = fvm3d.make_flux_spec_3d(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64) / n, (n, n, n))
        res = solve_cg_3d(c, spec, x0, tol=1e-12, max_iter=50_000, check_every=50)
        np.testing.assert_allclose(float(res.deff), eps * 1.0 + (1 - eps) * 0.1,
                                   rtol=1e-7)

    def test_series_slabs(self):
        """x-slabs across transport: Deff = (eps/Df + (1-eps)/Ds)^-1."""
        n = 16
        eps = 0.5
        d = np.full((n, n, n), 0.1)
        d[:, :, : int(round(eps * n))] = 1.0
        dj = jnp.asarray(d)
        c = fvm3d.fvm_coefficients_3d(dj, 0.0, 1.0)
        spec = fvm3d.make_flux_spec_3d(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64) / n, (n, n, n))
        res = solve_cg_3d(c, spec, x0, tol=1e-13, max_iter=100_000, check_every=50)
        np.testing.assert_allclose(
            float(res.deff), 1.0 / (eps / 1.0 + (1 - eps) / 0.1), rtol=1e-7)


class TestSolvers3D:
    def test_cg_matches_direct(self, rng):
        c, spec, x0, d = problem(rng, contrast=1e4)
        res = solve_cg_3d(c, spec, x0, tol=1e-12, max_iter=50_000, check_every=50)
        xd = spla.spsolve(to_sparse_3d(c), np.asarray(c.b).ravel()).reshape(d.shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)

    def test_jacobi_agrees_with_cg(self, rng):
        c, spec, x0, _ = problem(rng, contrast=10.0)
        jac = solve_jacobi_3d(c, spec, x0, tol=1e-10, max_iter=500_000,
                              check_every=500, criterion="residual")
        cg = solve_cg_3d(c, spec, x0, tol=1e-10, max_iter=50_000, check_every=50)
        np.testing.assert_allclose(float(jac.deff), float(cg.deff), rtol=1e-7)

    def test_mgcg_matches_direct(self, rng):
        c, spec, x0, d = problem(rng, nz=16, ny=16, nx=16, contrast=1e4)
        res = solve_mgcg_3d(c, spec, x0, tol=1e-11, max_iter=2000, check_every=10)
        xd = spla.spsolve(to_sparse_3d(c), np.asarray(c.b).ravel()).reshape(d.shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)

    def test_mgcg_fewer_iterations(self, rng):
        c, spec, x0, _ = problem(rng, nz=32, ny=32, nx=32, contrast=1e3)
        mg = solve_mgcg_3d(c, spec, x0, tol=1e-9, max_iter=2000, check_every=10)
        cg = solve_cg_3d(c, spec, x0, tol=1e-9, max_iter=100_000, check_every=50)
        assert int(mg.iters) * 3 < int(cg.iters)

    def test_batched_matches_singles(self, rng):
        probs = [problem(rng, contrast=c)[:3] for c in (10.0, 1e3)]
        kw = dict(tol=1e-10, max_iter=20_000, check_every=50)
        singles = [solve_cg_3d(c, s, x, **kw) for c, s, x in probs]
        coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
        spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
        x0 = jnp.stack([p[2] for p in probs])
        batched = solve_cg_3d_batched(coeffs, spec, x0, **kw)
        for k, single in enumerate(singles):
            np.testing.assert_allclose(float(batched.deff[k]), float(single.deff),
                                       rtol=1e-9)


class TestGalerkin3D:
    def test_coarse_operator_is_galerkin_product(self, rng):
        c, _, _, d = problem(rng, nz=4, ny=4, nx=4)
        A = to_sparse_3d(c).toarray()
        P = np.zeros((64, 8))
        for k in range(4):
            for i in range(4):
                for j in range(4):
                    P[(k * 4 + i) * 4 + j,
                      ((k // 2) * 2 + (i // 2)) * 2 + (j // 2)] = 1.0
        A_c_ref = P.T @ A @ P
        c_c = coarsen_3d(c)
        np.testing.assert_allclose(to_sparse_3d(c_c).toarray(), A_c_ref,
                                   rtol=1e-12, atol=1e-12)

    def test_hierarchy_spd(self, rng):
        c, _, _, _ = problem(rng, nz=8, ny=8, nx=8, contrast=1e6)
        for lvl in build_hierarchy_3d(c, min_size=2):
            A = to_sparse_3d(lvl).toarray()
            np.testing.assert_allclose(A, A.T, rtol=1e-10, atol=1e-12)
            assert np.linalg.eigvalsh(A).min() > 0


class TestRBSOR3D:
    def test_agrees_with_cg(self, rng):
        from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_rbsor_3d

        c, spec, x0, _ = problem(rng, contrast=10.0)
        sor = solve_rbsor_3d(c, spec, x0, tol=1e-10, max_iter=200_000,
                             check_every=500, criterion="residual")
        cg = solve_cg_3d(c, spec, x0, tol=1e-10, max_iter=50_000, check_every=50)
        np.testing.assert_allclose(float(sor.deff), float(cg.deff), rtol=1e-7)

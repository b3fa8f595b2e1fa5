"""Sharded-solver correctness on the 8-virtual-device CPU mesh:
sharded solve ≡ unsharded solve (same iterations, same Deff, fields equal to
rounding), dp x sp combinations, and halo-exchange unit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
from effectivediffusivityfvm_tpu.parallel.halo import sharded_solve_jacobi
from effectivediffusivityfvm_tpu.parallel.mesh import make_mesh
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi, solve_jacobi_batched


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def problem(rng, ny, nx):
    d = np.exp(rng.uniform(0, np.log(1e3), (ny, nx)))
    dj = jnp.asarray(d)
    c = fvm.fvm_coefficients(dj, 0.0, 1.0)
    spec = make_flux_spec(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    return c, spec, x0


@pytest.mark.parametrize("criterion", ["deff", "residual"])
def test_sharded_equals_unsharded(rng, criterion):
    c, spec, x0 = problem(rng, ny=32, nx=16)
    mesh = make_mesh(8, dp=1)   # sp=8 row shards
    kw = dict(omega=2.0 / 3.0, tol=1e-7, max_iter=50_000, check_every=100,
              criterion=criterion)
    ref = solve_jacobi(c, spec, x0, **kw)
    got = sharded_solve_jacobi(c, spec, x0, mesh, **kw)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_sharded_batched_dp_sp(rng):
    bsz = 2
    probs = [problem(rng, 16, 12) for _ in range(bsz)]
    coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
    spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
    x0 = jnp.stack([p[2] for p in probs])
    mesh = make_mesh(8, dp=2)   # dp=2 x sp=4
    kw = dict(omega=2.0 / 3.0, tol=1e-7, max_iter=50_000, check_every=100)
    ref = solve_jacobi_batched(coeffs, spec, x0, **kw)
    got = sharded_solve_jacobi(coeffs, spec, x0, mesh, **kw)
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_uneven_contrast_convergence_sharded(rng):
    # a hard medium still converges identically when sharded
    c, spec, x0 = problem(rng, ny=24, nx=24)
    mesh = make_mesh(8, dp=1)
    kw = dict(omega=2.0 / 3.0, tol=1e-9, max_iter=200_000, check_every=500,
              criterion="residual")
    ref = solve_jacobi(c, spec, x0, **kw)
    got = sharded_solve_jacobi(c, spec, x0, mesh, **kw)
    assert int(got.iters) == int(ref.iters)
    assert float(fvm.residual(c, got.x)) <= 1e-9


class TestSharded3D:
    def _problem3d(self, rng, nz=16, ny=12, nx=10):
        from effectivediffusivityfvm_tpu.ops import fvm3d

        d = np.exp(rng.uniform(0, np.log(1e3), (nz, ny, nx)))
        dj = jnp.asarray(d)
        c = fvm3d.fvm_coefficients_3d(dj, 0.0, 1.0)
        spec = fvm3d.make_flux_spec_3d(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (nz, ny, nx))
        return c, spec, x0

    def test_sharded_jacobi_equals_unsharded(self, rng):
        from effectivediffusivityfvm_tpu.parallel.halo3d import sharded_solve_jacobi_3d
        from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_jacobi_3d

        c, spec, x0 = self._problem3d(rng)
        mesh = make_mesh(8, dp=1)
        kw = dict(omega=2.0 / 3.0, tol=1e-7, max_iter=50_000, check_every=100)
        ref = solve_jacobi_3d(c, spec, x0, **kw)
        got = sharded_solve_jacobi_3d(c, spec, x0, mesh, **kw)
        assert int(got.iters) == int(ref.iters)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-12)

    def test_sharded_cg_equals_unsharded(self, rng):
        from effectivediffusivityfvm_tpu.parallel.halo3d import sharded_solve_cg_3d
        from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_cg_3d

        c, spec, x0 = self._problem3d(rng)
        mesh = make_mesh(8, dp=1)
        kw = dict(tol=1e-9, max_iter=50_000, check_every=50)
        ref = solve_cg_3d(c, spec, x0, **kw)
        got = sharded_solve_cg_3d(c, spec, x0, mesh, **kw)
        assert int(got.iters) == int(ref.iters)
        np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-8, atol=1e-11)

    def test_sharded_cg_batched_dp_sp(self, rng):
        from effectivediffusivityfvm_tpu.parallel.halo3d import sharded_solve_cg_3d
        from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_cg_3d_batched

        probs = [self._problem3d(rng, nz=8, ny=6, nx=6) for _ in range(2)]
        coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
        spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
        x0 = jnp.stack([p[2] for p in probs])
        mesh = make_mesh(8, dp=2)
        kw = dict(tol=1e-8, max_iter=20_000, check_every=50)
        ref = solve_cg_3d_batched(coeffs, spec, x0, **kw)
        got = sharded_solve_cg_3d(coeffs, spec, x0, mesh, **kw)
        np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff),
                                   rtol=1e-9)

    def test_sharded_mgcg_equals_unsharded(self, rng):
        from effectivediffusivityfvm_tpu.ops import fvm3d
        from effectivediffusivityfvm_tpu.parallel.halo3d import sharded_solve_mgcg_3d
        from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_mgcg_3d

        nz, ny, nx = 32, 16, 16
        d = np.exp(rng.uniform(0, np.log(1e3), (nz, ny, nx)))
        dj = jnp.asarray(d)
        c = fvm3d.fvm_coefficients_3d(dj, 0.0, 1.0)
        spec = fvm3d.make_flux_spec_3d(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (nz, ny, nx))
        mesh = make_mesh(8, dp=1)
        kw = dict(tol=1e-9, max_iter=2000, check_every=10)
        ref = solve_mgcg_3d(c, spec, x0, **kw)
        got = sharded_solve_mgcg_3d(c, spec, x0, mesh, **kw)
        assert int(got.iters) == int(ref.iters)
        np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                                   rtol=1e-7, atol=1e-10)


def test_sharded_mgcg_2d_equals_unsharded(rng):
    from effectivediffusivityfvm_tpu.parallel.halo import sharded_solve_mgcg
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg

    ny, nx = 64, 32
    d = np.exp(rng.uniform(0, np.log(1e3), (ny, nx)))
    dj = jnp.asarray(d)
    c = fvm.fvm_coefficients(dj, 0.0, 1.0)
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    spec = make_flux_spec(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    mesh = make_mesh(8, dp=1)
    kw = dict(tol=1e-9, max_iter=2000, check_every=10)
    ref = solve_mgcg(c, spec, x0, **kw)
    got = sharded_solve_mgcg(c, spec, x0, mesh, **kw)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-10)

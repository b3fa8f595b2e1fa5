"""Fused VMEM Jacobi kernel tests (interpret mode on CPU; the same code
compiles with Mosaic on TPU — verified on hardware, see bench history)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
from effectivediffusivityfvm_tpu.ops.kernels.jacobi_vmem import jacobi_sweeps_pallas
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi, solve_jacobi_batched
from effectivediffusivityfvm_tpu.solvers.jacobi_pallas import (
    solve_jacobi_pallas,
    solve_jacobi_pallas_batched,
)


def batch_problem(rng, bsz=3, ny=16, nx=24):
    d = np.exp(rng.uniform(0, np.log(100), (bsz, ny, nx)))
    dj = jnp.asarray(d)
    coeffs = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))(dj, 0.0, 1.0)
    spec = jax.vmap(make_flux_spec, in_axes=(0, None, None))(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (bsz, ny, nx))
    return coeffs, spec, x0


@pytest.mark.parametrize("k", [1, 7])
def test_kernel_matches_plain_sweeps(rng, k):
    coeffs, _, x0 = batch_problem(rng)
    xk = jacobi_sweeps_pallas(coeffs, x0, k, interpret=True)
    xs = x0
    for _ in range(k):
        xs = fvm.jacobi_sweep(coeffs, xs, 2.0 / 3.0)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xs), rtol=1e-13, atol=1e-15)


def test_traced_sweep_count(rng):
    coeffs, _, x0 = batch_problem(rng)

    @jax.jit
    def run(k):
        return jacobi_sweeps_pallas(coeffs, x0, k, interpret=True)

    x3 = run(jnp.int32(3))
    xs = x0
    for _ in range(3):
        xs = fvm.jacobi_sweep(coeffs, xs, 2.0 / 3.0)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(xs), rtol=1e-13)


def test_solver_matches_reference_driver(rng):
    coeffs, spec, x0 = batch_problem(rng)
    kw = dict(tol=1e-6, max_iter=20_000, check_every=50)
    ref = solve_jacobi_batched(coeffs, spec, x0, **kw)
    got = solve_jacobi_pallas_batched(coeffs, spec, x0, **kw)
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-13)


def test_single_image_wrapper(rng):
    coeffs, spec, x0 = batch_problem(rng, bsz=1)
    single_coeffs = jax.tree.map(lambda a: a[0], coeffs)
    single_spec = jax.tree.map(lambda a: a[0], spec)
    kw = dict(tol=1e-6, max_iter=20_000, check_every=50)
    ref = solve_jacobi(single_coeffs, single_spec, x0[0], **kw)
    got = solve_jacobi_pallas(single_coeffs, single_spec, x0[0], **kw)
    assert int(got.iters) == int(ref.iters)
    np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-10)

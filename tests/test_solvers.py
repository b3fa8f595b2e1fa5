"""Solver-driver semantics tests.

The chunked ``lax.while_loop`` drivers must reproduce the reference's literal
per-sweep loop (JacobiGPU, Deff2D.cuh:1232-1290) exactly: check cadence
(sweep indices 0, N, 2N, ...), deffOld=5/deffNew=1 init, percent-change
stopping, max_iter truncation, and conv reporting.  The oracle below is that
literal loop, one sweep at a time.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import boundary_deff, make_flux_spec
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi, solve_jacobi_batched


def make_problem(rng, ny=10, nx=12, contrast=100.0):
    d = np.exp(rng.uniform(0, np.log(contrast), size=(ny, nx)))
    dj = jnp.asarray(d)
    coeffs = fvm.fvm_coefficients(dj, 0.0, 1.0)
    spec = make_flux_spec(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    return coeffs, spec, x0


def literal_reference_loop(coeffs, spec, x0, *, omega, tol, max_iter, check_every):
    """Sweep-at-a-time transcription of the reference driver's control flow."""
    x = x0
    it = 0
    deff_new, deff_old, pc, conv = 1.0, 5.0, 100.0, 100.0
    while it < max_iter and tol < abs(pc):
        x = fvm.jacobi_sweep(coeffs, x, omega)
        if it % check_every == 0:
            deff_new = float(boundary_deff(spec, x))
            pc = (deff_old - deff_new) / deff_old
            deff_old = deff_new
            conv = pc
        it += 1
    return x, deff_new, conv, it


@pytest.mark.parametrize("max_iter,check_every", [
    (5000, 100),    # normal convergence at a check
    (250, 100),     # max_iter truncates mid-chunk (no final check)
    (300, 100),     # max_iter lands exactly on a check boundary
    (1, 100),       # single sweep
    (5000, 7),      # odd cadence
])
def test_matches_literal_reference_loop(rng, max_iter, check_every):
    coeffs, spec, x0 = make_problem(rng)
    kw = dict(omega=2.0 / 3.0, tol=1e-6, max_iter=max_iter, check_every=check_every)
    x_ref, deff_ref, conv_ref, it_ref = literal_reference_loop(coeffs, spec, x0, **kw)
    res = solve_jacobi(coeffs, spec, x0, **kw)
    assert int(res.iters) == it_ref
    # jit-fused sweeps may FMA-contract differently from the eager oracle;
    # agreement is to rounding noise, the control flow is what must be exact.
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(res.deff), deff_ref, rtol=1e-10)
    np.testing.assert_allclose(float(res.conv), conv_ref, rtol=1e-8, atol=1e-12)


def test_batched_matches_singles(rng):
    """Each image in a fused batch must stop at exactly its solo schedule."""
    import jax

    problems = [make_problem(rng, contrast=c) for c in (10.0, 100.0, 1000.0)]
    kw = dict(omega=2.0 / 3.0, tol=1e-6, max_iter=20_000, check_every=50)
    singles = [solve_jacobi(c, s, x, **kw) for c, s, x in problems]

    coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in problems])
    spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in problems])
    x0 = jnp.stack([p[2] for p in problems])
    batched = solve_jacobi_batched(coeffs, spec, x0, **kw)

    for k, single in enumerate(singles):
        assert int(batched.iters[k]) == int(single.iters)
        np.testing.assert_allclose(
            np.asarray(batched.x[k]), np.asarray(single.x), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(batched.deff[k]), float(single.deff), rtol=1e-10)
        np.testing.assert_allclose(float(batched.conv[k]), float(single.conv), rtol=1e-8, atol=1e-12)


def test_residual_criterion_converges_tighter(rng):
    coeffs, spec, x0 = make_problem(rng)
    res = solve_jacobi(coeffs, spec, x0, tol=1e-10, max_iter=2_000_000,
                       check_every=500, criterion="residual")
    assert float(fvm.residual(coeffs, res.x)) <= 1e-10
    # deff is still reported
    np.testing.assert_allclose(
        float(res.deff), float(boundary_deff(spec, res.x)), rtol=1e-12)


def test_warm_start_reduces_iterations(rng):
    coeffs, spec, x0 = make_problem(rng)
    kw = dict(omega=2.0 / 3.0, tol=1e-8, max_iter=2_000_000, check_every=100,
              criterion="residual")
    cold = solve_jacobi(coeffs, spec, x0, **kw)
    warm = solve_jacobi(coeffs, spec, cold.x, **kw)
    assert int(warm.iters) < int(cold.iters)


def test_relresidual_criterion_scale_free(rng):
    """relresidual must stop at the same iterate regardless of the global
    coefficient scale (absolute residual is scale-dependent)."""
    from effectivediffusivityfvm_tpu.solvers.cg import solve_cg

    d = np.exp(rng.uniform(0, np.log(100), (16, 16)))
    for scale in (1.0, 1e6):
        dj = jnp.asarray(d * scale)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        spec = make_flux_spec(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float64) / 16, (16, 16))
        res = solve_cg(c, spec, x0, tol=1e-9, max_iter=50_000,
                       check_every=50, criterion="relresidual")
        if scale == 1.0:
            iters_ref, x_ref = int(res.iters), np.asarray(res.x)
        else:
            # identical spectra -> identical iteration counts and fields
            assert int(res.iters) == iters_ref
            np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-9)


def test_relresidual_in_sweep_driver(rng):
    coeffs, spec, x0 = make_problem(rng)
    res = solve_jacobi(coeffs, spec, x0, tol=1e-8, max_iter=500_000,
                       check_every=200, criterion="relresidual")
    from effectivediffusivityfvm_tpu.ops import fvm as _fvm
    rel = float(_fvm.residual(coeffs, res.x)) / float(jnp.mean(jnp.abs(coeffs.b)))
    assert rel <= 1e-8

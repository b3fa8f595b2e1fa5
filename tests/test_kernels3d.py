"""Fused 3D kernel tests (interpret mode on CPU; the same code compiles
with Mosaic on TPU — verified on hardware: 64^3 whole-VMEM and 256^3
banded cycles rel_err ~1e-7 vs the XLA cycle, see docs/PERFORMANCE.md).

The 3D kernels are the framework's scale axis (SURVEY §6, BASELINE
config 5); the reference itself is strictly 2D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.ops import fvm3d
from effectivediffusivityfvm_tpu.ops.fvm3d import make_flux_spec_3d
from effectivediffusivityfvm_tpu.ops.kernels.vcycle3d import (
    band_z_for, pad_op_3d, pad_shape_3d, v_cycle3d_pallas, v_cycle3d_tiled)
from effectivediffusivityfvm_tpu.solvers.solvers3d import (
    build_hierarchy_3d, solve_mgcg_3d, solve_mgcg_3d_batched, v_cycle_3d)


def problem(rng, bsz=2, nz=8, ny=8, nx=12, contrast=1e3, dtype=jnp.float32):
    d = np.exp(rng.uniform(0, np.log(contrast), (bsz, nz, ny, nx)))
    dj = jnp.asarray(d, dtype)
    coeffs = jax.vmap(fvm3d.fvm_coefficients_3d, in_axes=(0, None, None))(
        dj, 0.0, 1.0)
    spec = jax.vmap(make_flux_spec_3d, in_axes=(0, None, None))(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=dtype) / nx, (bsz, nz, ny, nx))
    return coeffs, spec, x0


@pytest.mark.parametrize("nu", [1, 2])
def test_whole_cycle_matches_xla(rng, nu):
    coeffs, _, _ = problem(rng)
    lv = build_hierarchy_3d(coeffs, min_size=4, pad_levels=True)
    pz, py, px = lv[0].diag.shape[-3:]
    r = jnp.asarray(rng.standard_normal((2, pz, py, px)), jnp.float32)
    z = v_cycle3d_pallas(lv, r, omega=0.8, nu=nu, coarse_iters=8, over=1.8,
                         interpret=True)
    z_ref = v_cycle_3d(lv, r, nu1=nu, nu2=nu, omega=0.8, coarse_iters=8,
                       over=1.8)
    scale = np.max(np.abs(np.asarray(z_ref)))
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=1e-5 * scale)


@pytest.mark.parametrize("nu", [1, 3])
def test_tiled_cycle_matches_xla(rng, nu):
    nz, ny, nx = 16, 10, 12
    coeffs, _, _ = problem(rng, nz=nz, ny=ny, nx=nx)
    band = 4
    pz, py, px = pad_shape_3d(nz, ny, nx, band)
    cp = pad_op_3d(coeffs, pz - nz, py - ny, px - nx)
    lv = build_hierarchy_3d(cp, min_size=4, pad_levels=True)
    r = jnp.asarray(rng.standard_normal((2, pz, py, px)), jnp.float32)
    z = v_cycle3d_tiled(lv, r, omega=0.8, nu=nu, coarse_iters=8, over=1.8,
                        band=band, interpret=True)
    z_ref = v_cycle_3d(lv, r, nu1=nu, nu2=nu, omega=0.8, coarse_iters=8,
                       over=1.8)
    scale = np.max(np.abs(np.asarray(z_ref)))
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               atol=1e-5 * scale)


def test_fused3d_solver_matches_xla_engine(rng):
    coeffs, spec, x0 = problem(rng, contrast=1e4, dtype=jnp.float64)
    # tolerance note: the fused engine early-exits in-kernel AT the
    # threshold while the XLA engine sweeps to the check-window edge, so
    # cross-engine agreement scales with tol (not rounding)
    kw = dict(tol=1e-5, max_iter=60, check_every=5, criterion="residual",
              nu1=2, nu2=2, min_size=4)
    ref = solve_mgcg_3d_batched(coeffs, spec, x0, use_pallas=False, **kw)
    got = solve_mgcg_3d_batched(coeffs, spec, x0, use_pallas="tiled3d",
                                pallas_interpret=True, **kw)
    assert np.all(np.asarray(got.conv) <= 1e-5)
    np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-6)


def test_fused3d_single_image(rng):
    coeffs, spec, x0 = problem(rng, bsz=1, dtype=jnp.float64)
    c1 = jax.tree.map(lambda a: a[0], coeffs)
    s1 = jax.tree.map(lambda a: jnp.asarray(a)[0], spec)
    kw = dict(tol=1e-5, max_iter=60, check_every=5, criterion="residual",
              nu1=2, nu2=2, min_size=4)
    ref = solve_mgcg_3d(c1, s1, x0[0], use_pallas=False, **kw)
    got = solve_mgcg_3d(c1, s1, x0[0], use_pallas="tiled3d",
                        pallas_interpret=True, **kw)
    assert float(got.conv) <= 1e-5
    np.testing.assert_allclose(float(got.deff), float(ref.deff), rtol=1e-4)


def test_fused3d_freezes_converged_images(rng):
    """Per-image in-kernel early exit: batch results identical to solo runs
    (deff + iteration count)."""
    coeffs, spec, x0 = problem(rng, bsz=2, nz=8, ny=8, nx=12, contrast=1e5,
                               dtype=jnp.float64)
    kw = dict(tol=1e-5, max_iter=60, check_every=5, criterion="residual",
              nu1=2, nu2=2, min_size=4, use_pallas="tiled3d",
              pallas_interpret=True)
    got = solve_mgcg_3d_batched(coeffs, spec, x0, **kw)
    for k in range(2):
        solo = solve_mgcg_3d_batched(
            jax.tree.map(lambda a, k=k: a[k:k + 1], coeffs),
            jax.tree.map(lambda a, k=k: jnp.asarray(a)[k:k + 1], spec),
            x0[k:k + 1], **kw)
        np.testing.assert_allclose(float(got.deff[k]), float(solo.deff[0]),
                                   rtol=1e-9)
        assert int(got.iters[k]) == int(solo.iters[0])


def test_band_z_for_small_volume():
    assert band_z_for(12, 10, 14) == 12
    # bands are HALO_Z-block multiples (in-array halo BlockSpecs)
    assert band_z_for(9, 10, 14) == 12
    # large xy planes force narrow bands
    assert band_z_for(256, 512, 512) <= 8

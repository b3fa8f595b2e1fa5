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


def test_fused3d_matrix_free_unpadded_matches_stored(rng):
    """Matrix-free level 0 on an unpadded volume (even dims, one band):
    the recomputed windows are bit-exact vs stored coefficients (the
    dwin parity test below), so the solve matches the stored-coefficient
    engine to compiler-reassociation roundoff (XLA fuses the recompute
    into its consumers with different FMA contraction than the stored
    loads — measured ~1e-14 relative on a single launch; a wrong window
    would be O(1))."""
    bsz, nz, ny, nx = 2, 8, 8, 12
    d = np.exp(rng.uniform(0, np.log(1e4), (bsz, nz, ny, nx)))
    dj = jnp.asarray(d, jnp.float64)
    coeffs = jax.vmap(fvm3d.fvm_coefficients_3d, in_axes=(0, None, None))(
        dj, 0.0, 1.0)
    spec = jax.vmap(make_flux_spec_3d, in_axes=(0, None, None))(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx,
                          (bsz, nz, ny, nx))
    kw = dict(tol=1e-5, max_iter=60, check_every=5, criterion="residual",
              nu1=2, nu2=2, min_size=4, use_pallas="tiled3d",
              pallas_interpret=True)
    ref = solve_mgcg_3d_batched(coeffs, spec, x0, **kw)
    got = solve_mgcg_3d_batched(coeffs, spec, x0, d_field=dj, **kw)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff),
                               rtol=1e-11)
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))


def test_fused3d_matrix_free_padded(rng):
    """Matrix-free level 0 with padding on all three axes (the pads carry
    diag 0 instead of the stored identity — a numerically different but
    equivalent padded system): converged results match the XLA engine."""
    bsz, nz, ny, nx = 2, 9, 9, 11
    d = np.exp(rng.uniform(0, np.log(1e4), (bsz, nz, ny, nx)))
    dj = jnp.asarray(d, jnp.float64)
    coeffs = jax.vmap(fvm3d.fvm_coefficients_3d, in_axes=(0, None, None))(
        dj, 0.0, 1.0)
    spec = jax.vmap(make_flux_spec_3d, in_axes=(0, None, None))(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx,
                          (bsz, nz, ny, nx))
    kw = dict(tol=1e-6, max_iter=80, check_every=5, criterion="residual",
              nu1=2, nu2=2, min_size=4)
    ref = solve_mgcg_3d_batched(coeffs, spec, x0, use_pallas=False, **kw)
    got = solve_mgcg_3d_batched(coeffs, spec, x0, use_pallas="tiled3d",
                                pallas_interpret=True, d_field=dj, **kw)
    assert np.all(np.asarray(got.conv) <= 1e-6)
    np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-7)


def test_coeffs_from_dwin_matches_assembly(rng):
    """Matrix-free level-0 window recompute (vcycle3d._coeffs_from_dwin)
    vs fvm_coefficients_3d + pad_op_3d windows, for every band of a
    2-image batch with padding on all three axes — including the global
    z-edge bands (zero-masked halo blocks), the cross-image block clamps,
    the padded x columns (no Dirichlet add past the real nx), and the
    padded voxels where the recompute's diag_inv is 0 instead of the
    stored identity's 1 (equivalent: every field is 0 there)."""
    from effectivediffusivityfvm_tpu.ops.kernels.vcycle3d import (
        HALO_Z, _coeffs_from_dwin)

    bsz, nzr, nyr, nxr = 2, 13, 9, 11
    band = 2 * HALO_Z                                   # q = 2
    pz, py, px = pad_shape_3d(nzr, nyr, nxr, band)
    d = np.exp(rng.uniform(np.log(1e-3), np.log(1e3), (bsz, nzr, nyr, nxr)))
    dj = jnp.asarray(d, jnp.float32)
    coeffs = jax.vmap(fvm3d.fvm_coefficients_3d, in_axes=(0, None, None))(
        dj, 0.0, 1.0)
    cp = pad_op_3d(coeffs, pz - nzr, py - nyr, px - nxr)
    d_pad = jnp.pad(dj, [(0, 0), (0, pz - nzr), (0, py - nyr),
                         (0, px - nxr)])

    dx, dy, dz = 1.0 / nxr, 1.0 / nyr, 1.0 / nzr
    fx, fy, fz = dy * dz / dx, dx * dz / dy, dx * dy / dz
    bcf = dy * dz / (dx / 2.0)

    G, q, h = pz // band, band // HALO_Z, HALO_Z
    n_blocks = bsz * G * q
    flat_d = np.asarray(d_pad).reshape(bsz * pz, py, px)
    # padded-voxel mask on the flattened layout (z pad is per-image)
    zloc = np.arange(bsz * pz) % pz
    padmask = (zloc[:, None, None] >= nzr) | \
        (np.arange(py)[None, :, None] >= nyr) | \
        (np.arange(px)[None, None, :] >= nxr)

    stored = {k: np.asarray(getattr(cp, k)).reshape(bsz * pz, py, px)
              for k in ("a_w", "a_n", "a_u", "diag_inv")}

    def hblock(arr, flag, i):
        v = arr[min(max(i, 0), n_blocks - 1) * h:][:h]
        return np.zeros_like(v) if flag else v

    for b in range(bsz):
        for g in range(G):
            base = (b * G + g) * q
            f1, l1 = g == 0, g == G - 1
            f2 = g * q < 2
            l2 = (g + 1) * q + 1 > G * q - 1
            body = flat_d[base * h:(base + q) * h]
            dw = np.concatenate([
                hblock(flat_d, f2, base - 2), hblock(flat_d, f1, base - 1),
                body, hblock(flat_d, l1, base + q),
                hblock(flat_d, l2, base + q + 1)], axis=0)
            aw, an, au, di = (np.asarray(v) for v in _coeffs_from_dwin(
                jnp.asarray(dw), fx=fx, fy=fy, fz=fz, bcf=bcf, nxr=nxr))

            def swin(arr):
                return np.concatenate([
                    hblock(arr, f1, base - 1), arr[base * h:(base + q) * h],
                    hblock(arr, l1, base + q)], axis=0)

            # guarded-product harmonic mean: ~1-2 ulp from assembly's
            # reciprocal form on positive faces, identical zero structure
            saw, san, sau = (swin(stored[k_])
                             for k_ in ("a_w", "a_n", "a_u"))
            np.testing.assert_allclose(aw, saw, rtol=1e-6)
            np.testing.assert_allclose(an, san, rtol=1e-6)
            np.testing.assert_allclose(au, sau, rtol=1e-6)
            np.testing.assert_array_equal(aw == 0.0, saw == 0.0)
            np.testing.assert_array_equal(an == 0.0, san == 0.0)
            np.testing.assert_array_equal(au == 0.0, sau == 0.0)
            pm = swin(padmask.astype(np.float32)) > 0
            di_exp = np.where(pm, 0.0, swin(stored["diag_inv"]))
            np.testing.assert_allclose(di, di_exp.astype(np.float32),
                                       rtol=1e-5)
            np.testing.assert_array_equal(di == 0.0, di_exp == 0.0)
            # the documented equivalence: stored identity 1, recompute 0
            assert np.all(swin(stored["diag_inv"])[pm] == 1.0)


def test_band_z_for_small_volume():
    assert band_z_for(12, 10, 14) == 12
    # bands are HALO_Z-block multiples (in-array halo BlockSpecs)
    assert band_z_for(9, 10, 14) == 12
    # large xy planes force narrow bands
    assert band_z_for(256, 512, 512) <= 8


def test_band_z_for_matrix_free_fields():
    # the matrix-free engine's ~12-field working set admits a 2x band at
    # 256^3 (halo-overlap factor 2.0 -> 1.5); stored stays at 8
    assert band_z_for(256, 256, 256) == 8
    assert band_z_for(256, 256, 256, fields=12) == 16
    # smaller working sets never shrink the band
    for shp in ((64, 64, 64), (128, 128, 128), (256, 256, 256),
                (512, 512, 512)):
        assert band_z_for(*shp, fields=12) >= band_z_for(*shp)

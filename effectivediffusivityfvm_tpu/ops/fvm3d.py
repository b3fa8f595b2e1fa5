"""Matrix-free 7-point FVM operator for 3D voxel domains.

The reference is strictly 2D (its largest case is a 1002x2007 image); 3D
voxel domains are the planned scale axis (BASELINE.json config 5: 256^3,
7-point stencil, sharded over the TPU mesh).  This module extends the 2D
discretization of ``ops/fvm.py`` to ``(nz, ny, nx)`` fields with identical
conventions:

  * unit cube, ``dx = 1/nx, dy = 1/ny, dz = 1/nz``;
  * transport along x: Dirichlet ``CL``/``CR`` on the x boundaries over
    half-cell distances with the cell's own diffusivity;
  * zero-flux on all y and z boundaries;
  * interface conductance = dx/2-weighted harmonic mean * face area /
    center distance (x faces: dy*dz/dx, y faces: dx*dz/dy, z: dx*dy/dz);
  * masked voxels (solid / non-participating pores) are identity rows, with
    the same optional symmetrization for Krylov solvers.

Neighbor key: W/E along x (last axis), N/S along y (axis -2), U/D along z
(axis -3).  All functions are batch-agnostic over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .fvm import harmonic_mean

__all__ = [
    "StencilCoeffs3D",
    "fvm_coefficients_3d",
    "neighbor_sum_3d",
    "jacobi_sweep_3d",
    "apply_operator_3d",
    "residual_3d",
    "equilibrate_3d",
    "FluxSpec3D",
    "make_flux_spec_3d",
    "boundary_deff_3d",
]


class StencilCoeffs3D(NamedTuple):
    a_w: jax.Array
    a_e: jax.Array
    a_n: jax.Array   # y-1 neighbor
    a_s: jax.Array   # y+1
    a_u: jax.Array   # z-1
    a_d: jax.Array   # z+1
    diag: jax.Array
    diag_inv: jax.Array
    b: jax.Array


def _shift(x, axis, off):
    """Neighbor values along ``axis`` with zero fill (off = -1: value of the
    previous-index neighbor)."""
    z = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    n = x.shape[axis]
    if off == -1:
        body = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        return jnp.concatenate([z, body], axis=axis)
    body = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    return jnp.concatenate([body, z], axis=axis)


def fvm_coefficients_3d(
    d_field: jax.Array,
    c_left: float,
    c_right: float,
    mask: Optional[jax.Array] = None,
    symmetric: bool = False,
) -> StencilCoeffs3D:
    d = d_field
    nz, ny, nx = d.shape[-3:]
    dtype = d.dtype
    dx, dy, dz = 1.0 / nx, 1.0 / ny, 1.0 / nz

    # face conductances (harmonic mean * area / distance)
    hx = harmonic_mean(d[..., :, :, :-1], d[..., :, :, 1:]) * (dy * dz / dx)
    hy = harmonic_mean(d[..., :, :-1, :], d[..., :, 1:, :]) * (dx * dz / dy)
    hz = harmonic_mean(d[..., :-1, :, :], d[..., 1:, :, :]) * (dx * dy / dz)

    zx = jnp.zeros_like(d[..., :, :, :1])
    zy = jnp.zeros_like(d[..., :, :1, :])
    zz = jnp.zeros_like(d[..., :1, :, :])

    a_w = jnp.concatenate([zx, hx], axis=-1)
    a_e = jnp.concatenate([hx, zx], axis=-1)
    a_n = jnp.concatenate([zy, hy], axis=-2)
    a_s = jnp.concatenate([hy, zy], axis=-2)
    a_u = jnp.concatenate([zz, hz], axis=-3)
    a_d = jnp.concatenate([hz, zz], axis=-3)

    bc_l = d[..., :, :, 0] * (dy * dz / (dx / 2.0))   # (..., nz, ny)
    bc_r = d[..., :, :, -1] * (dy * dz / (dx / 2.0))

    diag = a_w + a_e + a_n + a_s + a_u + a_d
    diag = diag.at[..., :, :, 0].add(bc_l)
    diag = diag.at[..., :, :, -1].add(bc_r)

    b = jnp.zeros_like(d)
    b = b.at[..., :, :, 0].add(bc_l * jnp.asarray(c_left, dtype))
    b = b.at[..., :, :, -1].add(bc_r * jnp.asarray(c_right, dtype))

    if mask is not None:
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)
        a_w, a_e, a_n, a_s, a_u, a_d = (
            jnp.where(mask, zero, a) for a in (a_w, a_e, a_n, a_s, a_u, a_d))
        diag = jnp.where(mask, one, diag)
        b = jnp.where(mask, zero, b)
        if symmetric:
            m = mask.astype(jnp.int8)
            a_w = jnp.where(_shift(m, -1, -1) > 0, zero, a_w)
            a_e = jnp.where(_shift(m, -1, +1) > 0, zero, a_e)
            a_n = jnp.where(_shift(m, -2, -1) > 0, zero, a_n)
            a_s = jnp.where(_shift(m, -2, +1) > 0, zero, a_s)
            a_u = jnp.where(_shift(m, -3, -1) > 0, zero, a_u)
            a_d = jnp.where(_shift(m, -3, +1) > 0, zero, a_d)

    diag_inv = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0)
    return StencilCoeffs3D(a_w, a_e, a_n, a_s, a_u, a_d, diag, diag_inv, b)


def neighbor_sum_3d(c: StencilCoeffs3D, x: jax.Array) -> jax.Array:
    return (
        c.a_w * _shift(x, -1, -1) + c.a_e * _shift(x, -1, +1)
        + c.a_n * _shift(x, -2, -1) + c.a_s * _shift(x, -2, +1)
        + c.a_u * _shift(x, -3, -1) + c.a_d * _shift(x, -3, +1)
    )


def jacobi_sweep_3d(c: StencilCoeffs3D, x: jax.Array, omega: float) -> jax.Array:
    num = c.b + neighbor_sum_3d(c, x)
    return (1.0 - omega) * x + omega * num * c.diag_inv


def apply_operator_3d(c: StencilCoeffs3D, x: jax.Array) -> jax.Array:
    return c.diag * x - neighbor_sum_3d(c, x)


def residual_3d(c: StencilCoeffs3D, x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(c.b - apply_operator_3d(c, x)), axis=(-3, -2, -1))


def equilibrate_3d(c: StencilCoeffs3D):
    """Symmetric diagonal equilibration A' = S A S, S = diag(1/sqrt(diag))
    (3D mirror of ops/fvm.equilibrate; see its docstring for why)."""
    s = jnp.sqrt(c.diag_inv)
    one = jnp.ones_like(c.diag)
    return StencilCoeffs3D(
        a_w=c.a_w * s * _shift(s, -1, -1),
        a_e=c.a_e * s * _shift(s, -1, +1),
        a_n=c.a_n * s * _shift(s, -2, -1),
        a_s=c.a_s * s * _shift(s, -2, +1),
        a_u=c.a_u * s * _shift(s, -3, -1),
        a_d=c.a_d * s * _shift(s, -3, +1),
        diag=one, diag_inv=one,
        b=c.b * s,
    ), s


class FluxSpec3D(NamedTuple):
    d_left: jax.Array     # (..., nz, ny)
    d_right: jax.Array
    c_left: jax.Array
    c_right: jax.Array
    inv_half_dx: jax.Array


def make_flux_spec_3d(d_field: jax.Array, c_left, c_right) -> FluxSpec3D:
    nx = d_field.shape[-1]
    dtype = d_field.dtype
    return FluxSpec3D(
        d_left=d_field[..., :, :, 0],
        d_right=d_field[..., :, :, -1],
        c_left=jnp.asarray(c_left, dtype),
        c_right=jnp.asarray(c_right, dtype),
        inv_half_dx=jnp.asarray(2.0 * nx, dtype),
    )


def boundary_deff_3d(spec: FluxSpec3D, x: jax.Array) -> jax.Array:
    """Deff from the x-boundary fluxes, averaged over the (nz, ny) face
    (the 3D extension of Deff2D.cuh:1252-1264: divide the flux sums by the
    number of boundary cells instead of multiplying by dy*dz)."""
    nz, ny = x.shape[-3], x.shape[-2]
    acc = jnp.promote_types(x.dtype, jnp.float32)
    cl = jnp.asarray(spec.c_left)[..., None, None]
    cr = jnp.asarray(spec.c_right)[..., None, None]
    ihdx = jnp.asarray(spec.inv_half_dx)[..., None, None]
    mfl = (spec.d_left * (x[..., :, :, 0] - cl) * ihdx).astype(acc)
    mfr = (spec.d_right * (cr - x[..., :, :, -1]) * ihdx).astype(acc)
    q = (jnp.sum(mfl, axis=(-2, -1)) + jnp.sum(mfr, axis=(-2, -1))) / (2.0 * ny * nz)
    denom = jnp.asarray(spec.c_right - spec.c_left).astype(acc)
    return (q / denom).astype(x.dtype)

"""Boundary-flux effective-diffusivity reduction.

TPU-native equivalent of the host-side flux loop inside the reference solver
drivers (Deff2D.cuh:1252-1264): instead of D2H-copying the concentration field
every 10,000 iterations and reducing on the CPU, the reduction runs on-device
and lives inside the solver's ``lax.while_loop`` carry — zero host round-trips
in the hot loop.

Math (documentation PDF eq. 6, Fick's law rearranged):
  MFL[i] = D[i, 0]  * (x[i, 0]  - CL) / (dx/2)      left-boundary flux, per row
  MFR[i] = D[i, -1] * (CR - x[i, -1]) / (dx/2)      right-boundary flux, per row
  qAvg   = (sum(MFL) + sum(MFR)) / (2 * ny)
  Deff   = qAvg / (CR - CL)

Note the reference does not multiply by the face length ``dy``; dividing the
row sum by ``ny`` is the same thing because ``dy = 1/ny``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["BoundaryFluxSpec", "boundary_deff", "deff_from_columns"]


from typing import NamedTuple


class BoundaryFluxSpec(NamedTuple):
    """Static per-solve data needed to evaluate Deff from a concentration field.

    ``d_left``/``d_right`` are the diffusivity columns on the Dirichlet
    boundaries (``D[:, 0]`` and ``D[:, -1]``); only these enter the flux.
    """

    d_left: jax.Array    # (ny,)
    d_right: jax.Array   # (ny,)
    c_left: jax.Array    # scalar
    c_right: jax.Array   # scalar
    inv_half_dx: jax.Array  # 1 / (dx/2) = 2 * nx


def make_flux_spec(d_field: jax.Array, c_left, c_right) -> BoundaryFluxSpec:
    ny, nx = d_field.shape
    dtype = d_field.dtype
    return BoundaryFluxSpec(
        d_left=d_field[:, 0],
        d_right=d_field[:, -1],
        c_left=jnp.asarray(c_left, dtype),
        c_right=jnp.asarray(c_right, dtype),
        inv_half_dx=jnp.asarray(2.0 * nx, dtype),
    )


def deff_from_columns(spec: BoundaryFluxSpec, x_left: jax.Array, x_right: jax.Array) -> jax.Array:
    """Deff given just the two boundary columns of the concentration field.

    Kept separate from :func:`boundary_deff` so sharded solvers can evaluate it
    after a ``psum`` over row shards, and Pallas kernels can call it on VMEM
    column slices.  Accumulates in float32-or-wider regardless of the field
    dtype (the row sums are the only place cancellation matters).
    """
    ny = x_left.shape[-1]
    acc = jnp.promote_types(x_left.dtype, jnp.float32)
    # scalars in an unbatched spec, (B,) under vmap/stacking — expand so they
    # broadcast against the (..., ny) boundary columns either way
    cl = jnp.asarray(spec.c_left)[..., None]
    cr = jnp.asarray(spec.c_right)[..., None]
    ihdx = jnp.asarray(spec.inv_half_dx)[..., None]
    mfl = (spec.d_left * (x_left - cl) * ihdx).astype(acc)
    mfr = (spec.d_right * (cr - x_right) * ihdx).astype(acc)
    q_avg = (jnp.sum(mfl, axis=-1) + jnp.sum(mfr, axis=-1)) / (2.0 * ny)
    denom = jnp.asarray(spec.c_right - spec.c_left).astype(acc)
    return (q_avg / denom).astype(x_left.dtype)


def boundary_deff(spec: BoundaryFluxSpec, x: jax.Array) -> jax.Array:
    """Deff of a full ``(..., ny, nx)`` concentration field (reference
    Deff2D.cuh:1252-1264, fused on-device; batch-agnostic)."""
    return deff_from_columns(spec, x[..., :, 0], x[..., :, -1])


def deff_flux_average(d_field: jax.Array, x: jax.Array, c_left, c_right) -> jax.Array:
    """Deff from the flux averaged over EVERY vertical cut (accuracy mode).

    At steady state the net flux through every x-cut is identical; the
    reference (and :func:`boundary_deff`) samples only the two boundary
    cuts, where half-cell Dirichlet gradients amplify solution noise by
    2*nx.  Averaging all nx-1 interior face fluxes plus the two boundary
    fluxes suppresses that noise by ~sqrt(nx) — useful for fp32 runs and
    loose tolerances.  Exactly equal to :func:`boundary_deff` on a fully
    converged field; batch-agnostic.
    """
    from .fvm import harmonic_mean

    ny, nx = x.shape[-2], x.shape[-1]
    acc = jnp.promote_types(x.dtype, jnp.float32)
    dx = 1.0 / nx
    dy = 1.0 / ny
    cl = jnp.asarray(c_left, x.dtype)
    cr = jnp.asarray(c_right, x.dtype)

    # interior faces: q_j = sum_i h[i,j] * (x[i,j+1]-x[i,j]) * dy/dx
    h = harmonic_mean(d_field[..., :, :-1], d_field[..., :, 1:])
    q_int = jnp.sum(
        (h * (x[..., :, 1:] - x[..., :, :-1])).astype(acc), axis=-2
    ) * (dy / dx)                                            # (..., nx-1)
    # boundary cuts (half-cell Dirichlet distances)
    q_l = jnp.sum((d_field[..., :, 0] * (x[..., :, 0] - cl)).astype(acc),
                  axis=-1) * (dy / (dx / 2.0))
    q_r = jnp.sum((d_field[..., :, -1] * (cr - x[..., :, -1])).astype(acc),
                  axis=-1) * (dy / (dx / 2.0))
    q_all = jnp.concatenate(
        [q_l[..., None], q_int, q_r[..., None]], axis=-1)    # (..., nx+1)
    q_mean = jnp.mean(q_all, axis=-1)
    return (q_mean / (cr - cl).astype(acc)).astype(x.dtype)

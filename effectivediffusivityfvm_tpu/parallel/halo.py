"""Spatially-sharded solves: shard_map + ICI halo exchange.

Large domains (and the planned 3D mode, BASELINE.json config 5) are sharded
by rows over the mesh's ``sp`` axis; each damped-Jacobi sweep exchanges a
1-cell-deep boundary strip with the two ring neighbors via
``jax.lax.ppermute`` (collective permute rides ICI), and the Deff/residual
convergence monitors reduce with ``psum`` — the whole solve loop stays inside
one ``shard_map``-wrapped ``jit`` with zero host involvement.

This is the stencil-code analog of sequence/context parallelism (SURVEY.md
§2.6): the neighbor-ring halo pattern is structurally the same communication
graph as ring attention, with the X-direction Dirichlet boundaries playing
the role of the sequence ends.

Correctness contract (tested): a sharded solve is numerically equivalent to
the unsharded solve of the same system — same sweep count, same Deff, fields
equal to rounding noise.

An optional ``dp`` batch axis shards the image batch on top (fields shaped
``(B, ny, nx)`` with ``P('dp', 'sp', None)``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec
from ..solvers import driver
from ..solvers.driver import SolveResult

__all__ = ["sharded_solve_jacobi", "halo_exchange_rows"]


def _ring_perms(n: int):
    """Non-wrapping send-down / send-up permutations for a row-sharded grid
    (the global top/bottom boundaries are zero-flux, so edge shards receive
    zeros, matching the zero a_n/a_s coefficients there)."""
    down = [(i, i + 1) for i in range(n - 1)]   # my last row -> next shard's north halo
    up = [(i + 1, i) for i in range(n - 1)]     # my first row -> prev shard's south halo
    return down, up


def halo_exchange_rows(x: jax.Array, axis_name: str):
    """Exchange 1-row halos along ``axis_name``.  Returns (north, south) halo
    rows for this shard (zeros at the global edges)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:  # degenerate shard count: no neighbors, no collective
        z = jnp.zeros_like(x[..., :1, :])
        return z, z
    down, up = _ring_perms(n)
    north = jax.lax.ppermute(x[..., -1:, :], axis_name, down)
    south = jax.lax.ppermute(x[..., :1, :], axis_name, up)
    return north, south


def _sweep_local(coeffs: fvm.StencilCoeffs, x, omega, axis_name):
    """One damped-Jacobi sweep on a row shard with halo exchange."""
    north, south = halo_exchange_rows(x, axis_name)
    xn = jnp.concatenate([north, x[..., :-1, :]], axis=-2)
    xs = jnp.concatenate([x[..., 1:, :], south], axis=-2)
    z = jnp.zeros_like(x[..., :, :1])
    xw = jnp.concatenate([z, x[..., :, :-1]], axis=-1)
    xe = jnp.concatenate([x[..., :, 1:], z], axis=-1)
    num = (coeffs.b + coeffs.a_w * xw + coeffs.a_e * xe
           + coeffs.a_n * xn + coeffs.a_s * xs)
    return (1.0 - omega) * x + omega * num * coeffs.diag_inv


def _deff_local(spec: BoundaryFluxSpec, x, axis_name):
    """Boundary-flux Deff with a psum over the row shards."""
    ny_local = x.shape[-2]
    ny_global = ny_local * jax.lax.axis_size(axis_name)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    cl = jnp.asarray(spec.c_left)[..., None]
    cr = jnp.asarray(spec.c_right)[..., None]
    ihdx = jnp.asarray(spec.inv_half_dx)[..., None]
    mfl = (spec.d_left * (x[..., :, 0] - cl) * ihdx).astype(acc)
    mfr = (spec.d_right * (cr - x[..., :, -1]) * ihdx).astype(acc)
    q_local = jnp.sum(mfl, axis=-1) + jnp.sum(mfr, axis=-1)
    q = jax.lax.psum(q_local, axis_name) / (2.0 * ny_global)
    denom = jnp.asarray(spec.c_right - spec.c_left).astype(acc)
    return (q / denom).astype(x.dtype)


def _resid_local(coeffs: fvm.StencilCoeffs, x, axis_name):
    """Mean |b - A x| with halo exchange and a psum mean."""
    north, south = halo_exchange_rows(x, axis_name)
    xn = jnp.concatenate([north, x[..., :-1, :]], axis=-2)
    xs = jnp.concatenate([x[..., 1:, :], south], axis=-2)
    z = jnp.zeros_like(x[..., :, :1])
    xw = jnp.concatenate([z, x[..., :, :-1]], axis=-1)
    xe = jnp.concatenate([x[..., :, 1:], z], axis=-1)
    nb = (coeffs.a_w * xw + coeffs.a_e * xe + coeffs.a_n * xn + coeffs.a_s * xs)
    defect = jnp.abs(coeffs.b - (coeffs.diag * x - nb))
    s = jax.lax.psum(jnp.sum(defect, axis=(-2, -1)), axis_name)
    n = x.shape[-2] * x.shape[-1] * jax.lax.axis_size(axis_name)
    return s / n


def sharded_solve_jacobi(
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    mesh: Mesh,
    *,
    omega: float = 2.0 / 3.0,
    tol: float = 1e-5,
    max_iter: int = 500_000,
    check_every: int = 10_000,
    criterion: str = "deff",
    spatial_axis: str = "sp",
    batch_axis: str = "dp",
) -> SolveResult:
    """Row-sharded (optionally batch-sharded) Jacobi solve.

    ``x0`` of shape ``(ny, nx)`` runs the single-image driver sharded over
    ``spatial_axis``; ``(B, ny, nx)`` additionally shards the batch over
    ``batch_axis`` and keeps per-image convergence freezing.
    """
    omega = omega or 2.0 / 3.0
    batched = x0.ndim == 3

    grid_spec = P(batch_axis, spatial_axis, None) if batched else P(spatial_axis, None)
    col_spec = P(batch_axis, spatial_axis) if batched else P(spatial_axis)
    scal_spec = P(batch_axis) if batched else P()
    coeffs_specs = fvm.StencilCoeffs(*([grid_spec] * 7))
    spec_specs = BoundaryFluxSpec(
        d_left=col_spec, d_right=col_spec,
        c_left=scal_spec, c_right=scal_spec, inv_half_dx=scal_spec,
    )
    out_specs = SolveResult(
        x=grid_spec,
        deff=scal_spec, conv=scal_spec,
        iters=scal_spec if batched else P(),
    )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(coeffs_specs, spec_specs, grid_spec),
        out_specs=out_specs,
        check_vma=False,
    )
    def run(coeffs_l, spec_l, x0_l):
        sweep = lambda x: _sweep_local(coeffs_l, x, omega, spatial_axis)
        deff_fn = lambda x: _deff_local(spec_l, x, spatial_axis)
        resid_fn = lambda x: _resid_local(coeffs_l, x, spatial_axis)
        kw = dict(tol=tol, max_iter=max_iter, check_every=check_every,
                  criterion=criterion, deff_fn=deff_fn, resid_fn=resid_fn)
        if batched:
            # trip count must be uniform across the whole mesh or the halo
            # collectives desynchronize between dp groups (XLA's rendezvous
            # is global): all-reduce the batch-active flag over dp
            def reduce_any(active):
                local = jnp.any(active)
                tot = jax.lax.psum(local.astype(jnp.int32), batch_axis)
                return tot > 0
            return driver.run_batched(sweep, coeffs_l, spec_l, x0_l,
                                      reduce_any_fn=reduce_any, **kw)
        return driver.run_single(sweep, coeffs_l, spec_l, x0_l, **kw)

    return jax.jit(run)(coeffs, spec, x0)

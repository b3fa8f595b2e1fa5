"""Sharded 3D solves: z-slab decomposition with ICI halo exchange.

The 256^3 voxel config (BASELINE.json config 5) is sharded as z-slabs over
the mesh's ``sp`` axis.  The 7-point stencil needs one ghost (z-1, z+1) slab
face per sweep/matvec, exchanged with the ring neighbors via
``jax.lax.ppermute``; CG dot products and the Deff/residual monitors reduce
with ``psum``.  Everything (the whole Krylov/sweep loop) runs inside one
``shard_map``-wrapped jit.

Provided solvers:
  * :func:`sharded_solve_jacobi_3d` — sweep driver,
  * :func:`sharded_solve_cg_3d` — diagonal-PCG through the shared engine
    (solvers/pcg.py) with psum'd reductions.

Correctness contract (tested): sharded == unsharded to rounding, identical
iteration counts.  An optional ``dp`` batch axis composes on top with a
globally-uniform trip count (see parallel/halo.py for why).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import fvm3d
from ..ops.fvm3d import FluxSpec3D, StencilCoeffs3D
from ..solvers import driver
from ..solvers.driver import SolveResult
from ..solvers.pcg import run_pcg

__all__ = ["sharded_solve_jacobi_3d", "sharded_solve_cg_3d"]


def _halo_slabs(x, axis_name):
    """(up, down) ghost faces along the z axis (-3); zeros at global edges."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[..., :1, :, :])
        return z, z
    down_perm = [(i, i + 1) for i in range(n - 1)]
    up_perm = [(i + 1, i) for i in range(n - 1)]
    up = jax.lax.ppermute(x[..., -1:, :, :], axis_name, down_perm)
    down = jax.lax.ppermute(x[..., :1, :, :], axis_name, up_perm)
    return up, down


def _neighbor_sum_local(c: StencilCoeffs3D, x, axis_name):
    up, down = _halo_slabs(x, axis_name)
    xu = jnp.concatenate([up, x[..., :-1, :, :]], axis=-3)
    xd = jnp.concatenate([x[..., 1:, :, :], down], axis=-3)
    zy = jnp.zeros_like(x[..., :, :1, :])
    xn = jnp.concatenate([zy, x[..., :, :-1, :]], axis=-2)
    xs = jnp.concatenate([x[..., :, 1:, :], zy], axis=-2)
    zx = jnp.zeros_like(x[..., :, :, :1])
    xw = jnp.concatenate([zx, x[..., :, :, :-1]], axis=-1)
    xe = jnp.concatenate([x[..., :, :, 1:], zx], axis=-1)
    return (c.a_w * xw + c.a_e * xe + c.a_n * xn + c.a_s * xs
            + c.a_u * xu + c.a_d * xd)


def _deff_local(spec: FluxSpec3D, x, axis_name):
    nz_l, ny = x.shape[-3], x.shape[-2]
    nz_g = nz_l * jax.lax.axis_size(axis_name)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    cl = jnp.asarray(spec.c_left)[..., None, None]
    cr = jnp.asarray(spec.c_right)[..., None, None]
    ihdx = jnp.asarray(spec.inv_half_dx)[..., None, None]
    mfl = (spec.d_left * (x[..., :, :, 0] - cl) * ihdx).astype(acc)
    mfr = (spec.d_right * (cr - x[..., :, :, -1]) * ihdx).astype(acc)
    q_local = jnp.sum(mfl, axis=(-2, -1)) + jnp.sum(mfr, axis=(-2, -1))
    q = jax.lax.psum(q_local, axis_name) / (2.0 * ny * nz_g)
    denom = jnp.asarray(spec.c_right - spec.c_left).astype(acc)
    return (q / denom).astype(x.dtype)


def _specs(batched, spatial_axis, batch_axis):
    grid = (P(batch_axis, spatial_axis, None, None) if batched
            else P(spatial_axis, None, None))
    face = (P(batch_axis, spatial_axis, None) if batched
            else P(spatial_axis, None))
    scal = P(batch_axis) if batched else P()
    coeffs = StencilCoeffs3D(*([grid] * 9))
    spec = FluxSpec3D(d_left=face, d_right=face,
                      c_left=scal, c_right=scal, inv_half_dx=scal)
    out = SolveResult(x=grid, deff=scal, conv=scal,
                      iters=scal if batched else P())
    return coeffs, spec, grid, out


def sharded_solve_jacobi_3d(
    coeffs: StencilCoeffs3D,
    spec: FluxSpec3D,
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
    omega = omega or 2.0 / 3.0
    batched = x0.ndim == 4
    coeffs_specs, spec_specs, grid_spec, out_specs = _specs(
        batched, spatial_axis, batch_axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(coeffs_specs, spec_specs, grid_spec),
        out_specs=out_specs, check_vma=False,
    )
    def run(c_l, s_l, x0_l):
        def sweep(x):
            num = c_l.b + _neighbor_sum_local(c_l, x, spatial_axis)
            return (1.0 - omega) * x + omega * num * c_l.diag_inv

        def resid_fn(x):
            defect = jnp.abs(c_l.b - (c_l.diag * x - _neighbor_sum_local(c_l, x, spatial_axis)))
            s = jax.lax.psum(jnp.sum(defect, axis=(-3, -2, -1)), spatial_axis)
            n = (x.shape[-3] * x.shape[-2] * x.shape[-1]
                 * jax.lax.axis_size(spatial_axis))
            return s / n

        kw = dict(tol=tol, max_iter=max_iter, check_every=check_every,
                  criterion=criterion,
                  deff_fn=lambda x: _deff_local(s_l, x, spatial_axis),
                  resid_fn=resid_fn)
        if batched:
            def reduce_any(active):
                tot = jax.lax.psum(jnp.any(active).astype(jnp.int32), batch_axis)
                return tot > 0
            return driver.run_batched(sweep, c_l, s_l, x0_l,
                                      reduce_any_fn=reduce_any, **kw)
        return driver.run_single(sweep, c_l, s_l, x0_l, **kw)

    return jax.jit(run)(coeffs, spec, x0)


def sharded_solve_cg_3d(
    coeffs: StencilCoeffs3D,
    spec: FluxSpec3D,
    x0: jax.Array,
    mesh: Mesh,
    *,
    omega: float = 0.0,
    tol: float = 1e-8,
    max_iter: int = 100_000,
    check_every: int = 10_000,
    criterion: str = "residual",
    spatial_axis: str = "sp",
    batch_axis: str = "dp",
) -> SolveResult:
    """Diagonal-PCG over z-slabs: halo-exchanged matvec, psum'd dots."""
    batched = x0.ndim == 4
    check_every = min(check_every, 100)
    coeffs_specs, spec_specs, grid_spec, out_specs = _specs(
        batched, spatial_axis, batch_axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(coeffs_specs, spec_specs, grid_spec),
        out_specs=out_specs, check_vma=False,
    )
    def run(c_l, s_l, x0_l):
        def matvec(p):
            return c_l.diag * p - _neighbor_sum_local(c_l, p, spatial_axis)

        def dot_fn(u, v):
            return jax.lax.psum(jnp.sum(u * v, axis=(-3, -2, -1)), spatial_axis)

        def mean_abs_fn(u):
            s = jax.lax.psum(jnp.sum(jnp.abs(u), axis=(-3, -2, -1)), spatial_axis)
            n = (u.shape[-3] * u.shape[-2] * u.shape[-1]
                 * jax.lax.axis_size(spatial_axis))
            return s / n

        reduce_any = None
        if batched:
            def reduce_any(active):
                tot = jax.lax.psum(jnp.any(active).astype(jnp.int32), batch_axis)
                return tot > 0

        return run_pcg(
            matvec=matvec,
            precond=lambda r: c_l.diag_inv * r,
            b=c_l.b,
            x0=x0_l,
            deff_fn=lambda x: _deff_local(s_l, x, spatial_axis),
            tol=tol, max_iter=max_iter, check_every=check_every,
            criterion=criterion, grid_ndim=3, batched=batched,
            reduce_any_fn=reduce_any, mean_abs_fn=mean_abs_fn, dot_fn=dot_fn,
        )

    return jax.jit(run)(coeffs, spec, x0)

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
from ..ops.kernels.vcycle_vmem import smoothing_schedule
from ..ops.fvm3d import FluxSpec3D, StencilCoeffs3D
from ..solvers import driver
from ..solvers.driver import SolveResult
from ..solvers.pcg import run_pcg

__all__ = ["sharded_solve_jacobi_3d", "sharded_solve_cg_3d", "sharded_solve_mgcg_3d"]


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


_RUNNERS = {}


def _cached_jit_runner(key, run):
    """Cache ``jax.jit(run)`` on the static configuration: a fresh jit
    object per call would retrace the whole sharded solve every time
    (seconds per call).  ``key`` must cover every static the closure
    captures (incl. input shapes where the closure bakes shape-derived
    values)."""
    fn = _RUNNERS.get(key)
    if fn is None:
        fn = _RUNNERS[key] = jax.jit(run)
    return fn


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

    key = ("jacobi3d", mesh, batched, omega, tol, max_iter, check_every,
           criterion, spatial_axis, batch_axis, x0.shape)
    return _cached_jit_runner(key, run)(coeffs, spec, x0)


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

    key = ("cg3d", mesh, batched, tol, max_iter, check_every, criterion,
           spatial_axis, batch_axis, x0.shape)
    return _cached_jit_runner(key, run)(coeffs, spec, x0)


# ---------------------------------------------------------------------------
# Sharded multigrid
# ---------------------------------------------------------------------------

def _coarsen_local(c_l: StencilCoeffs3D, axis_name: str) -> StencilCoeffs3D:
    """Shard-local 2x2x2 Galerkin coarsening of a z-slab-sharded operator.

    Identical math to ``solvers3d.coarsen_3d`` except at the shard's z
    edges: the crossing coupling into the NEXT shard lives in the local
    ``a_d`` of the last fine plane (so the odd-index block sum already
    yields the correct coarse ``a_d`` there — it must NOT be zeroed), and
    the mirrored ``a_u`` of the first coarse plane comes from the PREVIOUS
    shard's last coarse ``a_d`` via ppermute.  Requires even local nz.
    """
    from ..solvers.solvers3d import _xsum, _ysum, _zsum, restrict_3d

    # slice-pair formulation (see solvers3d.coarsen_3d: ~60x faster on TPU
    # than the blocked (K,2,I,2,J,2) reshape)
    t_e = _zsum(_ysum(c_l.a_e))          # (..., K, I, nx)
    a_e_c = t_e[..., 1::2]
    t_s = _xsum(_zsum(c_l.a_s))          # (..., K, ny, J)
    a_s_c = t_s[..., 1::2, :]
    t_d = _ysum(_xsum(c_l.a_d))          # (..., nz, I, J)
    a_d_c = t_d[..., 1::2, :, :]

    internal = t_e[..., 0::2] + t_s[..., 0::2, :] + t_d[..., 0::2, :, :]
    diag_r = restrict_3d(c_l.diag)
    diag_c = diag_r - 2.0 * internal
    b_c = restrict_3d(c_l.b)

    # x/y mirrors are local exactly as in the unsharded case
    zx = jnp.zeros_like(a_e_c[..., :, :, :1])
    zy = jnp.zeros_like(a_s_c[..., :, :1, :])
    a_e_c = jnp.concatenate([a_e_c[..., :, :, :-1], zx], axis=-1)
    a_w_c = jnp.concatenate([zx, a_e_c[..., :, :, :-1]], axis=-1)
    a_s_c = jnp.concatenate([a_s_c[..., :, :-1, :], zy], axis=-2)
    a_n_c = jnp.concatenate([zy, a_s_c[..., :, :-1, :]], axis=-2)

    # z mirror crosses shards: my first a_u = previous shard's last a_d.
    # (The global last shard's a_d last plane is already 0 because the fine
    # a_d is 0 on the global z edge.)
    n = jax.lax.axis_size(axis_name)
    last_ad = a_d_c[..., -1:, :, :]
    if n > 1:
        halo = jax.lax.ppermute(last_ad, axis_name,
                                [(i, i + 1) for i in range(n - 1)])
    else:
        halo = jnp.zeros_like(last_ad)
    a_u_c = jnp.concatenate([halo, a_d_c[..., :-1, :, :]], axis=-3)

    floor = jnp.asarray(1e-6, diag_c.dtype) * diag_r
    ok = diag_c > floor
    diag_inv = jnp.where(ok, 1.0 / jnp.where(ok, diag_c, 1.0), 0.0)
    return StencilCoeffs3D(a_w_c, a_e_c, a_n_c, a_s_c, a_u_c, a_d_c,
                           diag_c, diag_inv, b_c)


def _smooth_local(c_l, x, b, omega, axis_name):
    num = b + _neighbor_sum_local(c_l, x, axis_name)
    return (1.0 - omega) * x + omega * num * c_l.diag_inv


def _build_sharded_hierarchy(c_l: StencilCoeffs3D, nz_local: int,
                             axis_name: str, min_size: int = 4):
    """(sharded_levels, replicated_levels): coarsen shard-locally while the
    local slab stays even and >= 2 planes thick, then all_gather and hand
    the replicated coarse problem to the plain hierarchy builder."""
    from ..solvers.solvers3d import build_hierarchy_3d

    sharded = [c_l]
    while nz_local % 2 == 0 and nz_local >= 4:
        c_l = _coarsen_local(c_l, axis_name)
        nz_local //= 2
        sharded.append(c_l)

    gathered = jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=a.ndim - 3, tiled=True),
        sharded[-1])
    replicated = build_hierarchy_3d(gathered, min_size=min_size)
    return sharded[:-1], replicated


def _v_cycle_sharded(sharded_levels, replicated_levels, r, *, nu1=1, nu2=1,
                     omega=0.8, coarse_iters=32, over=1.8,
                     axis_name="sp", level=0):
    """V-cycle over the sharded prefix of the hierarchy; the coarse suffix
    runs replicated on every shard (identical inputs -> identical results)."""
    from ..solvers import solvers3d as s3

    if level == len(sharded_levels):
        # hand off to the replicated tail: gather the residual, run the
        # plain (unsharded) cycle, slice back this shard's slab
        n = jax.lax.axis_size(axis_name)
        r_full = jax.lax.all_gather(r, axis_name, axis=r.ndim - 3, tiled=True)
        e_full = s3.v_cycle_3d(replicated_levels, r_full, nu1=nu1, nu2=nu2,
                               omega=omega, coarse_iters=coarse_iters, over=over)
        idx = jax.lax.axis_index(axis_name)
        nz_local = r.shape[-3]
        return jax.lax.dynamic_slice_in_dim(
            e_full, idx * nz_local, nz_local, axis=e_full.ndim - 3)

    c = sharded_levels[level]
    e = jnp.zeros_like(r)
    for w in smoothing_schedule(omega, nu1):
        e = _smooth_local(c, e, r, w, axis_name)
    res = r - (c.diag * e - _neighbor_sum_local(c, e, axis_name))
    from ..solvers.solvers3d import restrict_3d
    r_c = restrict_3d(res)
    e_c = _v_cycle_sharded(sharded_levels, replicated_levels, r_c,
                           nu1=nu1, nu2=nu2, omega=omega,
                           coarse_iters=coarse_iters, over=over,
                           axis_name=axis_name, level=level + 1)
    from ..solvers.solvers3d import prolong_3d
    e = e + over * prolong_3d(e_c)
    for w in reversed(smoothing_schedule(omega, nu2)):
        e = _smooth_local(c, e, r, w, axis_name)
    return e


def sharded_solve_mgcg_3d(
    coeffs: StencilCoeffs3D,
    spec: FluxSpec3D,
    x0: jax.Array,
    mesh: Mesh,
    *,
    omega: float = 0.0,
    tol: float = 1e-8,
    max_iter: int = 10_000,
    check_every: int = 10_000,
    criterion: str = "residual",
    nu1: int = 1,
    nu2: int = 1,
    mg_omega: float = 0.8,
    coarse_iters: int = 32,
    min_size: int = 4,
    over: float = 1.8,
    spatial_axis: str = "sp",
    batch_axis: str = "dp",
) -> SolveResult:
    """Multigrid-PCG over z-slabs: shard-local Galerkin coarsening while the
    slab stays >= 2 planes, then a replicated coarse tail (all_gather of a
    small grid); halo-exchanged smoothing/matvec, psum'd CG reductions.

    Equals the unsharded ``solve_mgcg_3d`` exactly: the distributed coarse
    operators are the same Galerkin products (the shard-boundary couplings
    are carried by the local a_d planes + one ppermute per level), so every
    iterate matches to rounding.

    ``x0`` of shape ``(nz, ny, nx)`` solves one volume; ``(B, nz, ny, nx)``
    additionally shards the batch over ``batch_axis`` with per-image
    convergence freezing (the coarsening/cycle machinery is batch-dim
    agnostic; the trip count psums over dp to stay globally uniform).
    """
    batched = x0.ndim == 4
    check_every = min(check_every, 10)
    coeffs_specs, spec_specs, grid_spec, out_specs = _specs(
        batched, spatial_axis, batch_axis)
    n_shards = mesh.shape[spatial_axis]
    nz_local = x0.shape[-3] // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(coeffs_specs, spec_specs, grid_spec),
        out_specs=out_specs, check_vma=False,
    )
    def run(c_l, s_l, x0_l):
        sharded_levels, replicated_levels = _build_sharded_hierarchy(
            c_l, nz_local, spatial_axis, min_size=min_size)

        def precond(r):
            return _v_cycle_sharded(
                sharded_levels, replicated_levels, r, nu1=nu1, nu2=nu2,
                omega=mg_omega, coarse_iters=coarse_iters, over=over,
                axis_name=spatial_axis)

        def matvec(p):
            return c_l.diag * p - _neighbor_sum_local(c_l, p, spatial_axis)

        def dot_fn(u, v):
            return jax.lax.psum(jnp.sum(u * v, axis=(-3, -2, -1)), spatial_axis)

        def mean_abs_fn(u):
            s = jax.lax.psum(jnp.sum(jnp.abs(u), axis=(-3, -2, -1)), spatial_axis)
            nn = (u.shape[-3] * u.shape[-2] * u.shape[-1]
                  * jax.lax.axis_size(spatial_axis))
            return s / nn

        reduce_any = None
        if batched:
            def reduce_any(active):
                tot = jax.lax.psum(jnp.any(active).astype(jnp.int32),
                                   batch_axis)
                return tot > 0

        return run_pcg(
            matvec=matvec, precond=precond, b=c_l.b, x0=x0_l,
            deff_fn=lambda x: _deff_local(s_l, x, spatial_axis),
            tol=tol, max_iter=max_iter, check_every=check_every,
            criterion=criterion, grid_ndim=3, batched=batched,
            reduce_any_fn=reduce_any, mean_abs_fn=mean_abs_fn, dot_fn=dot_fn,
        )

    key = ("mgcg3d", mesh, batched, tol, max_iter, check_every, criterion,
           nu1, nu2, mg_omega, coarse_iters, min_size, over, spatial_axis,
           batch_axis, x0.shape)
    return _cached_jit_runner(key, run)(coeffs, spec, x0)

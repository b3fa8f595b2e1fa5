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
from ..ops.kernels.vcycle_vmem import smoothing_schedule
from ..ops.flux import BoundaryFluxSpec
from ..solvers import driver
from ..solvers.driver import SolveResult

__all__ = ["sharded_solve_jacobi", "sharded_solve_mgcg", "halo_exchange_rows"]


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
    runner = _jacobi_runner(mesh, x0.ndim == 3, omega, tol, max_iter,
                            check_every, criterion, spatial_axis, batch_axis)
    return runner(coeffs, spec, x0)


@functools.lru_cache(maxsize=64)
def _jacobi_runner(mesh, batched, omega, tol, max_iter, check_every,
                   criterion, spatial_axis, batch_axis):
    """Jitted sharded-Jacobi runner, cached on the static configuration
    (a fresh ``jax.jit(run)`` per call retraces the whole solve)."""
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

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Sharded multigrid (rows) — the 2D mirror of parallel/halo3d.py
# ---------------------------------------------------------------------------

def _coarsen_local_2d(c_l: fvm.StencilCoeffs, axis_name: str) -> fvm.StencilCoeffs:
    """Shard-local 2x2 Galerkin coarsening of a row-sharded operator.

    Same closed form as ``solvers.multigrid.coarsen`` except at the shard's
    row edges: the crossing coupling into the next shard is carried by the
    local ``a_s`` of the last fine row (the odd-row block sum keeps it),
    and the first coarse row's ``a_n`` arrives from the previous shard's
    last coarse ``a_s`` via ppermute.  Requires even local ny.
    """
    from ..solvers.multigrid import _blocks, restrict

    ae_b = _blocks(c_l.a_e)                       # (..., I, 2, J, 2)
    as_b = _blocks(c_l.a_s)
    a_e_c = ae_b[..., :, :, :, 1].sum(-2)
    a_s_c = as_b[..., :, 1, :, :].sum(-1)
    internal = ae_b[..., :, :, :, 0].sum(-2) + as_b[..., :, 0, :, :].sum(-1)
    diag_c = restrict(c_l.diag) - 2.0 * internal
    b_c = restrict(c_l.b)

    z_col = jnp.zeros_like(a_e_c[..., :, :1])
    a_e_c = jnp.concatenate([a_e_c[..., :, :-1], z_col], axis=-1)
    a_w_c = jnp.concatenate([z_col, a_e_c[..., :, :-1]], axis=-1)

    n = jax.lax.axis_size(axis_name)
    last_as = a_s_c[..., -1:, :]
    if n > 1:
        halo = jax.lax.ppermute(last_as, axis_name,
                                [(i, i + 1) for i in range(n - 1)])
    else:
        halo = jnp.zeros_like(last_as)
    a_n_c = jnp.concatenate([halo, a_s_c[..., :-1, :]], axis=-2)

    floor = jnp.asarray(1e-6, diag_c.dtype) * restrict(c_l.diag)
    ok = diag_c > floor
    diag_inv = jnp.where(ok, 1.0 / jnp.where(ok, diag_c, 1.0), 0.0)
    return fvm.StencilCoeffs(a_w_c, a_e_c, a_n_c, a_s_c, diag_c, diag_inv, b_c)


def _smooth_local_2d(c_l, x, b, omega, axis_name):
    north, south = halo_exchange_rows(x, axis_name)
    xn = jnp.concatenate([north, x[..., :-1, :]], axis=-2)
    xs = jnp.concatenate([x[..., 1:, :], south], axis=-2)
    z = jnp.zeros_like(x[..., :, :1])
    xw = jnp.concatenate([z, x[..., :, :-1]], axis=-1)
    xe = jnp.concatenate([x[..., :, 1:], z], axis=-1)
    num = (b + c_l.a_w * xw + c_l.a_e * xe + c_l.a_n * xn + c_l.a_s * xs)
    return (1.0 - omega) * x + omega * num * c_l.diag_inv


def _build_sharded_hierarchy_2d(c_l, ny_local, axis_name, min_size=8):
    from ..solvers.multigrid import build_hierarchy

    sharded = [c_l]
    while ny_local % 2 == 0 and ny_local >= 4 and c_l.diag.shape[-1] % 2 == 0 \
            and c_l.diag.shape[-1] > min_size:
        c_l = _coarsen_local_2d(c_l, axis_name)
        ny_local //= 2
        sharded.append(c_l)

    gathered = jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=a.ndim - 2, tiled=True),
        sharded[-1])
    replicated = build_hierarchy(gathered, min_size=min_size)
    return sharded[:-1], replicated


def _v_cycle_sharded_2d(sharded_levels, replicated_levels, r, *, nu1=1, nu2=1,
                        omega=0.8, coarse_iters=32, over=1.8,
                        axis_name="sp", level=0):
    from ..solvers import multigrid as mg

    if level == len(sharded_levels):
        r_full = jax.lax.all_gather(r, axis_name, axis=r.ndim - 2, tiled=True)
        e_full = mg.v_cycle(replicated_levels, r_full, nu1=nu1, nu2=nu2,
                            omega=omega, coarse_iters=coarse_iters, over=over)
        idx = jax.lax.axis_index(axis_name)
        ny_local = r.shape[-2]
        return jax.lax.dynamic_slice_in_dim(
            e_full, idx * ny_local, ny_local, axis=e_full.ndim - 2)

    c = sharded_levels[level]
    e = jnp.zeros_like(r)
    for w in smoothing_schedule(omega, nu1):
        e = _smooth_local_2d(c, e, r, w, axis_name)
    res = r - (c.diag * e - _neighbor_sum_2d_local(c, e, axis_name))
    from ..solvers.multigrid import restrict
    r_c = restrict(res)
    e_c = _v_cycle_sharded_2d(sharded_levels, replicated_levels, r_c,
                              nu1=nu1, nu2=nu2, omega=omega,
                              coarse_iters=coarse_iters, over=over,
                              axis_name=axis_name, level=level + 1)
    from ..solvers.multigrid import prolong
    e = e + over * prolong(e_c)
    for w in reversed(smoothing_schedule(omega, nu2)):
        e = _smooth_local_2d(c, e, r, w, axis_name)
    return e


def _neighbor_sum_2d_local(c, x, axis_name):
    north, south = halo_exchange_rows(x, axis_name)
    xn = jnp.concatenate([north, x[..., :-1, :]], axis=-2)
    xs = jnp.concatenate([x[..., 1:, :], south], axis=-2)
    z = jnp.zeros_like(x[..., :, :1])
    xw = jnp.concatenate([z, x[..., :, :-1]], axis=-1)
    xe = jnp.concatenate([x[..., :, 1:], z], axis=-1)
    return c.a_w * xw + c.a_e * xe + c.a_n * xn + c.a_s * xs


def sharded_solve_mgcg(
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
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
    min_size: int = 8,
    over: float = 1.8,
    spatial_axis: str = "sp",
    batch_axis: str = "dp",
    use_pallas=None,
    pallas_interpret: bool = False,
    first_window: int = 1,
) -> SolveResult:
    """Row-sharded 2D multigrid-PCG: shard-local Galerkin coarsening down to
    2-row slabs, then a replicated coarse tail; equals the unsharded
    ``solve_mgcg`` to rounding.

    ``x0`` of shape ``(ny, nx)`` solves one image over ``spatial_axis``;
    ``(B, ny, nx)`` additionally shards the batch over ``batch_axis`` with
    per-image convergence freezing (the whole coarsening/cycle machinery is
    batch-dim agnostic; only the monitors and the trip-count reduction need
    the extra axis — see sharded_solve_jacobi for why the dp-wide psum'd
    trip count is required).

    ``use_pallas``: None = auto — on TPU fp32 V(nu, nu) the solve runs the
    fused sharded whole-CG-iteration engine when the shard's fine window
    fits VMEM (parallel/fused2d_cg.py: three per-shard Pallas passes per
    PCG iteration with psum'd scalars), else the per-shard fused T1/T2
    cycle kernels under the XLA CG algebra (parallel/fused2d.py; measured
    2.1x the XLA sweeps end-to-end at 1024², numerics identical); False
    forces XLA; True forces fused."""
    batched = x0.ndim == 3
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and coeffs.diag.dtype == jnp.float32
                      and nu1 == nu2 and nu1 <= 4)
    from ..solvers.driver import resolve_first_window

    first_window = resolve_first_window(first_window, check_every, criterion)
    runner = _mgcg_runner(mesh, batched, tol, max_iter,
                          check_every, criterion, nu1, nu2,
                          mg_omega, coarse_iters, min_size, over,
                          spatial_axis, batch_axis, use_pallas,
                          pallas_interpret, first_window)
    return runner(coeffs, spec, x0)


@functools.lru_cache(maxsize=64)
def _mgcg_runner(mesh, batched, tol, max_iter, check_every, criterion, nu1,
                 nu2, mg_omega, coarse_iters, min_size, over, spatial_axis,
                 batch_axis, use_pallas, pallas_interpret, first_window=1):
    """Jitted sharded-MGCG runner, cached on the static configuration —
    a fresh ``jax.jit(run)`` per call would retrace the whole solve every
    time (seconds per call; the fused-cycle trace is the largest)."""
    from ..solvers.pcg import run_pcg

    grid_spec = (P(batch_axis, spatial_axis, None) if batched
                 else P(spatial_axis, None))
    col_spec = (P(batch_axis, spatial_axis) if batched else P(spatial_axis))
    scal_spec = P(batch_axis) if batched else P()
    coeffs_specs = fvm.StencilCoeffs(*([grid_spec] * 7))
    spec_specs = BoundaryFluxSpec(
        d_left=col_spec, d_right=col_spec,
        c_left=scal_spec, c_right=scal_spec, inv_half_dx=scal_spec)
    out_specs = SolveResult(x=grid_spec, deff=scal_spec, conv=scal_spec,
                            iters=scal_spec if batched else P())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(coeffs_specs, spec_specs, grid_spec),
        out_specs=out_specs, check_vma=False,
    )
    def run(c_l, s_l, x0_l):
        ny_l, nx_l = x0_l.shape[-2], x0_l.shape[-1]
        if use_pallas:
            from .fused2d_cg import run_mgcg_sharded_fused, sharded_fused_cg_ok

            if sharded_fused_cg_ok(ny_l, nx_l, x0_l.dtype.itemsize):
                # fused whole-CG-iteration engine: the CG algebra joins the
                # cycle inside per-shard Pallas passes (honors the caller's
                # check_every; the XLA path below chunks at <= 10)
                return run_mgcg_sharded_fused(
                    c_l, s_l, x0_l, tol=tol, max_iter=max_iter,
                    check_every=check_every, criterion=criterion, nu=nu1,
                    mg_omega=mg_omega, coarse_iters=coarse_iters,
                    min_size=min_size, over=over, axis_name=spatial_axis,
                    batch_axis=batch_axis if batched else None,
                    interpret=pallas_interpret, first_window=first_window)

        sharded_levels, replicated_levels = _build_sharded_hierarchy_2d(
            c_l, x0_l.shape[-2], spatial_axis, min_size=min_size)

        if use_pallas:
            from .fused2d import (_coef_windows, build_fused_tail,
                                  v_cycle_sharded_fused)

            coef_wins = _coef_windows(sharded_levels, spatial_axis)
            tail = build_fused_tail(sharded_levels, spatial_axis, min_size)

            def precond(r):
                return v_cycle_sharded_fused(
                    sharded_levels, replicated_levels, coef_wins, r,
                    nu=nu1, omega=mg_omega, coarse_iters=coarse_iters,
                    over=over, axis_name=spatial_axis,
                    interpret=pallas_interpret, tail=tail)
        else:
            def precond(r):
                return _v_cycle_sharded_2d(
                    sharded_levels, replicated_levels, r, nu1=nu1, nu2=nu2,
                    omega=mg_omega, coarse_iters=coarse_iters, over=over,
                    axis_name=spatial_axis)

        def matvec(p):
            return c_l.diag * p - _neighbor_sum_2d_local(c_l, p, spatial_axis)

        def dot_fn(u, v):
            return jax.lax.psum(jnp.sum(u * v, axis=(-2, -1)), spatial_axis)

        def mean_abs_fn(u):
            s = jax.lax.psum(jnp.sum(jnp.abs(u), axis=(-2, -1)), spatial_axis)
            nn = u.shape[-2] * u.shape[-1] * jax.lax.axis_size(spatial_axis)
            return s / nn

        def deff_fn(x):
            return _deff_local(s_l, x, spatial_axis)

        reduce_any = None
        if batched:
            def reduce_any(active):
                tot = jax.lax.psum(jnp.any(active).astype(jnp.int32),
                                   batch_axis)
                return tot > 0

        return run_pcg(
            matvec=matvec, precond=precond, b=c_l.b, x0=x0_l,
            deff_fn=deff_fn, tol=tol, max_iter=max_iter,
            check_every=min(check_every, 10), criterion=criterion, grid_ndim=2,
            batched=batched, reduce_any_fn=reduce_any,
            mean_abs_fn=mean_abs_fn, dot_fn=dot_fn,
        )

    return jax.jit(run)

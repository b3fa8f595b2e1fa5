"""3D solver suite: weighted Jacobi, diagonal-PCG, and multigrid-PCG on the
7-point voxel operator (BASELINE.json config 5).

Thin compositions of the shared engines:
  * the sweep driver (solvers/driver.py) with the 3D Jacobi sweep,
  * the PCG engine (solvers/pcg.py) with the 3D matvec and either the
    reciprocal diagonal or a 2x2x2 aggregation-Galerkin V-cycle
    (closed form like the 2D one; internal couplings now count the
    within-block faces of all three axes).

All solvers share the framework's stopping semantics and return
:class:`SolveResult`.  Batched variants take ``(B, nz, ny, nx)``.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp

from ..ops import fvm3d
from ..ops.fvm3d import StencilCoeffs3D, boundary_deff_3d
from ..ops.kernels.vcycle_vmem import smoothing_schedule
from . import driver
from .driver import SolveResult
from .pcg import run_pcg

__all__ = [
    "solve_jacobi_3d", "solve_rbsor_3d", "solve_cg_3d", "solve_mgcg_3d",
    "solve_jacobi_3d_batched", "solve_rbsor_3d_batched",
    "solve_cg_3d_batched", "solve_mgcg_3d_batched",
    "coarsen_3d", "build_hierarchy_3d", "v_cycle_3d",
]


# --------------------------------------------------------------------------
# 3D aggregation-Galerkin multigrid
# --------------------------------------------------------------------------

def _pad_even_3d(c: StencilCoeffs3D) -> StencilCoeffs3D:
    nz, ny, nx = c.diag.shape[-3:]
    pz, py, px = nz % 2, ny % 2, nx % 2
    if not (pz or py or px):
        return c
    lead = c.diag.ndim - 3
    pad = [(0, 0)] * lead + [(0, pz), (0, py), (0, px)]

    def z(a):
        return jnp.pad(a, pad)

    diag = jnp.pad(c.diag, pad, constant_values=1.0)
    return StencilCoeffs3D(
        a_w=z(c.a_w), a_e=z(c.a_e), a_n=z(c.a_n), a_s=z(c.a_s),
        a_u=z(c.a_u), a_d=z(c.a_d),
        diag=diag,
        diag_inv=jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0),
        b=z(c.b),
    )


def _zsum(a):
    """Pair-sum the z axis via stride-2 slices (keeps full lane layouts)."""
    return a[..., 0::2, :, :] + a[..., 1::2, :, :]


def _ysum(a):
    return a[..., 0::2, :] + a[..., 1::2, :]


def _xsum(a):
    s = a.shape
    return a.reshape(s[:-1] + (s[-1] // 2, 2)).sum(-1)


def restrict_3d(r):
    return _xsum(_ysum(_zsum(r)))


def prolong_3d(e):
    for ax in (-3, -2, -1):
        e = jnp.repeat(e, 2, axis=ax)
    return e


def coarsen_3d(c: StencilCoeffs3D) -> StencilCoeffs3D:
    """Galerkin R A P for aligned 2x2x2 aggregation of a 7-point stencil
    (closed form; the 3D analog of the 2D derivation in
    solvers/multigrid.py)."""
    c = _pad_even_3d(c)

    # Pair-sum two block axes first with stride-2 slices (which XLA lowers
    # to full-lane adds), THEN pick crossing (odd) vs internal (even) faces
    # along the coupling's own axis.  The earlier (K,2,I,2,J,2) blocked
    # reshape forced 2-element lane layouts on TPU and ran ~60x slower on
    # a 256^3 level (measured: 55.4 ms -> 0.9 ms, benchmarks/bench_coarsen3d.py).
    t_e = _zsum(_ysum(c.a_e))            # (..., K, I, nx)
    a_e_c = t_e[..., 1::2]               # crossing x faces
    t_s = _xsum(_zsum(c.a_s))            # (..., K, ny, J)
    a_s_c = t_s[..., 1::2, :]
    t_d = _ysum(_xsum(c.a_d))            # (..., nz, I, J)
    a_d_c = t_d[..., 1::2, :, :]

    # internal (within-block) couplings: even index along their axis
    internal = t_e[..., 0::2] + t_s[..., 0::2, :] + t_d[..., 0::2, :, :]

    diag_r = restrict_3d(c.diag)
    diag_c = diag_r - 2.0 * internal
    b_c = restrict_3d(c.b)

    zx = jnp.zeros_like(a_e_c[..., :, :, :1])
    zy = jnp.zeros_like(a_s_c[..., :, :1, :])
    zz = jnp.zeros_like(a_d_c[..., :1, :, :])
    a_e_c = jnp.concatenate([a_e_c[..., :, :, :-1], zx], axis=-1)
    a_w_c = jnp.concatenate([zx, a_e_c[..., :, :, :-1]], axis=-1)
    a_s_c = jnp.concatenate([a_s_c[..., :, :-1, :], zy], axis=-2)
    a_n_c = jnp.concatenate([zy, a_s_c[..., :, :-1, :]], axis=-2)
    a_d_c = jnp.concatenate([a_d_c[..., :-1, :, :], zz], axis=-3)
    a_u_c = jnp.concatenate([zz, a_d_c[..., :-1, :, :]], axis=-3)

    floor = jnp.asarray(1e-6, diag_c.dtype) * diag_r
    ok = diag_c > floor
    diag_inv = jnp.where(ok, 1.0 / jnp.where(ok, diag_c, 1.0), 0.0)
    return StencilCoeffs3D(a_w_c, a_e_c, a_n_c, a_s_c, a_u_c, a_d_c,
                           diag_c, diag_inv, b_c)


def build_hierarchy_3d(c: StencilCoeffs3D, min_size: int = 4,
                       pad_levels: bool = False) -> List[StencilCoeffs3D]:
    """Fine-to-coarse operator list; ``pad_levels=True`` stores every level
    pre-padded to even dims (decoupled identity voxels), required by the
    fused Pallas cycles (ops/kernels/vcycle3d.py)."""
    if pad_levels:
        c = _pad_even_3d(c)
    levels = [c]
    while min(c.diag.shape[-3:]) > min_size:
        c = coarsen_3d(c)
        if pad_levels:
            c = _pad_even_3d(c)
        levels.append(c)
    return levels


def _smooth_3d(c, x, b, omega):
    num = b + fvm3d.neighbor_sum_3d(c, x)
    return (1.0 - omega) * x + omega * num * c.diag_inv


def _pad_to_3d(r, shape):
    pz = shape[-3] - r.shape[-3]
    py = shape[-2] - r.shape[-2]
    px = shape[-1] - r.shape[-1]
    if pz or py or px:
        lead = r.ndim - 3
        r = jnp.pad(r, [(0, 0)] * lead + [(0, pz), (0, py), (0, px)])
    return r


def v_cycle_3d(levels, r, *, nu1=1, nu2=1, omega=0.8, coarse_iters=32,
               level=0, over=1.8):
    c = levels[level]
    shp = c.diag.shape
    r_lvl = _pad_to_3d(r, shp)

    om1 = smoothing_schedule(omega, nu1)
    om2 = smoothing_schedule(omega, nu2)
    if level == len(levels) - 1:
        e = jnp.zeros_like(r_lvl)
        for _ in range(coarse_iters):
            e = _smooth_3d(c, e, r_lvl, om1[-1])
        return e[..., :r.shape[-3], :r.shape[-2], :r.shape[-1]]

    e = jnp.zeros_like(r_lvl)
    for w in om1:
        e = _smooth_3d(c, e, r_lvl, w)

    res = r_lvl - (c.diag * e - fvm3d.neighbor_sum_3d(c, e))
    nxt = levels[level + 1].diag.shape
    res = _pad_to_3d(res, res.shape[:-3] + (2 * nxt[-3], 2 * nxt[-2], 2 * nxt[-1]))
    e_c = v_cycle_3d(levels, restrict_3d(res), nu1=nu1, nu2=nu2, omega=omega,
                     coarse_iters=coarse_iters, level=level + 1, over=over)
    e = e + over * prolong_3d(e_c)[..., :shp[-3], :shp[-2], :shp[-1]]

    for w in reversed(om2):
        e = _smooth_3d(c, e, r_lvl, w)
    return e[..., :r.shape[-3], :r.shape[-2], :r.shape[-1]]


# --------------------------------------------------------------------------
# Solvers
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi_3d(coeffs, spec, x0, *, omega: float = 2.0 / 3.0,
                    tol: float = 1e-5, max_iter: int = 500_000,
                    check_every: int = 0, criterion: str = "deff") -> SolveResult:
    omega = omega or 2.0 / 3.0
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_single(
        lambda x: fvm3d.jacobi_sweep_3d(coeffs, x, omega),
        coeffs, None, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        deff_fn=lambda x: boundary_deff_3d(spec, x),
        resid_fn=lambda x: fvm3d.residual_3d(coeffs, x),
    )


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi_3d_batched(coeffs, spec, x0, *, omega: float = 2.0 / 3.0,
                            tol: float = 1e-5, max_iter: int = 500_000,
                            check_every: int = 0,
                            criterion: str = "deff") -> SolveResult:
    omega = omega or 2.0 / 3.0
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_batched(
        lambda x: fvm3d.jacobi_sweep_3d(coeffs, x, omega),
        coeffs, None, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        deff_fn=lambda x: boundary_deff_3d(spec, x),
        resid_fn=lambda x: fvm3d.residual_3d(coeffs, x),
    )


def _rb_sweep_3d(coeffs, x, omega):
    """Red-black SOR sweep on the voxel grid ((i+j+k) parity coloring)."""
    nz, ny, nx = x.shape[-3:]
    kk = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 2)
    red = ((kk + ii + jj) % 2) == 0

    def half(xc, m):
        gs = (coeffs.b + fvm3d.neighbor_sum_3d(coeffs, xc)) * coeffs.diag_inv
        return jnp.where(m, xc + omega * (gs - xc), xc)

    return half(half(x, red), ~red)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_rbsor_3d(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-5,
                   max_iter: int = 500_000, check_every: int = 0,
                   criterion: str = "deff") -> SolveResult:
    from .rbsor import omega_opt

    omega = omega or omega_opt(max(x0.shape[-3:]), max(x0.shape[-3:]))
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_single(
        lambda x: _rb_sweep_3d(coeffs, x, omega),
        coeffs, None, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        deff_fn=lambda x: boundary_deff_3d(spec, x),
        resid_fn=lambda x: fvm3d.residual_3d(coeffs, x),
    )


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_rbsor_3d_batched(coeffs, spec, x0, *, omega: float = 0.0,
                           tol: float = 1e-5, max_iter: int = 500_000,
                           check_every: int = 0,
                           criterion: str = "deff") -> SolveResult:
    from .rbsor import omega_opt

    omega = omega or omega_opt(max(x0.shape[-3:]), max(x0.shape[-3:]))
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_batched(
        lambda x: _rb_sweep_3d(coeffs, x, omega),
        coeffs, None, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        deff_fn=lambda x: boundary_deff_3d(spec, x),
        resid_fn=lambda x: fvm3d.residual_3d(coeffs, x),
    )


def _pallas_auto_3d(coeffs, nu1, nu2):
    """Default 3D kernel selection: the banded fused whole-CG-iteration
    engine (ops/kernels/cgstep3d.py) on TPU fp32 V(nu, nu), nu <= 3 —
    a volume small enough for one band degenerates to a whole-window
    residency, so one engine covers every size."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or nu1 != nu2 or nu1 > 3:
        return False
    if coeffs.diag.dtype != jnp.float32:
        return False
    return "tiled3d"


def _run_mgcg3d_fused(coeffs, spec, x0, *, tol, max_iter, check_every,
                      criterion, nu, mg_omega, coarse_iters, min_size, over,
                      d_field=None, interpret=False,
                      first_window=1) -> SolveResult:
    """Batched 3D MGCG on the banded fused engine: k = check_every full PCG
    iterations per launch (ops/kernels/cgstep3d.py), check/restart/
    divergence/freeze semantics mirroring the 2D fused driver
    (solvers/multigrid._run_mgcg_fused).  ``d_field`` (optional) switches
    the engine's level 0 matrix-free — see cg_steps3d_tiled."""
    from ..ops.kernels.cgstep3d import cg_steps3d_tiled
    from ..ops.kernels.vcycle3d import (HALO_Z, band_z_for, pad_op_3d,
                                        pad_shape_3d, v_cycle3d_tiled)

    bsz, nz, ny, nx = coeffs.b.shape
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)

    mf = d_field is not None
    itemsize = coeffs.diag.dtype.itemsize
    # The matrix-free engine's window working set is ~12 fields (5-block D
    # window replaces 12 stored-coefficient blocks), which admits a larger
    # band than the stored passes — see band_z_for.
    band = band_z_for(nz, ny + ny % 2, nx + nx % 2, itemsize,
                      fields=12 if mf else 18)
    pz, py, px = pad_shape_3d(nz, ny, nx, band)
    levels = build_hierarchy_3d(
        pad_op_3d(coeffs, pz - nz, py - ny, px - nx),
        min_size=min_size, pad_levels=True)
    pz, py, px = levels[0].diag.shape[-3:]
    lvl0 = levels[0]
    pad = (pz, py, px) != (nz, ny, nx)

    def pad_to(a):
        if not pad:
            return a
        return jnp.pad(a, [(0, 0), (0, pz - nz), (0, py - ny), (0, px - nx)])

    if d_field is not None:
        d_p = pad_to(d_field.astype(dtype))
        dx, dy, dz = 1.0 / nx, 1.0 / ny, 1.0 / nz
        geom = (dy * dz / dx, dx * dz / dy, dx * dy / dz,
                dy * dz / (dx / 2.0), nx)
    else:
        d_p, geom = None, None

    def unpad(a):
        return a[..., :nz, :ny, :nx] if pad else a

    def cg_steps(x, r, p, rz, active, stop_s, hi_s, k):
        return cg_steps3d_tiled(
            levels, x, r, p, rz, active, stop_s, hi_s, k,
            omega=mg_omega, nu=nu, coarse_iters=coarse_iters, over=over,
            band=band, interpret=interpret, d_field=d_p, geom=geom)

    if mf:
        # the refresh cycle streams STORED coefficients (18-field working
        # set): give it its own band, shrunk until it divides the padded nz
        band_cyc = band_z_for(pz, py, px, itemsize)
        while pz % band_cyc:
            band_cyc -= HALO_Z
    else:
        band_cyc = band

    def cycle(r):
        return v_cycle3d_tiled(levels, r, omega=mg_omega, nu=nu,
                               coarse_iters=coarse_iters, over=over,
                               band=band_cyc, interpret=interpret)

    b_p = lvl0.b
    x_p = pad_to(x0)

    def matvec(v):
        return fvm3d.apply_operator_3d(lvl0, v)

    def mean_abs(v):
        return jnp.mean(jnp.abs(unpad(v)), axis=(-3, -2, -1))

    def dot(u, v):
        return jnp.sum(u * v, axis=(-3, -2, -1))

    def expand(v):
        return v[:, None, None, None]

    bscale = mean_abs(b_p) if criterion == "relresidual" else None

    npts = jnp.asarray(nz * ny * nx, dtype)
    if criterion == "residual":
        stop_sum = jnp.full((bsz,), tol, dtype) * npts
    elif criterion == "relresidual":
        stop_sum = tol_ * bscale * npts
    else:
        stop_sum = jnp.zeros((bsz,), dtype)

    def deff_fn(xp):
        return boundary_deff_3d(spec, unpad(xp))

    def fresh(xp):
        r = b_p - matvec(xp)
        z = cycle(r)
        return r, z, dot(r, z)

    def cond(c):
        pc, it = c[8], c[5]
        return jnp.any(tol_ < jnp.abs(pc)) & (it < max_iter)

    def body(c):
        (x, r, p, rz, _z, it, deff, deff_old, pc, conv, iters, x_best, best,
         bad) = c
        active = tol_ < jnp.abs(pc)
        k = jnp.where(it == 0, jnp.minimum(first_window, max_iter),
                      jnp.minimum(check_every, max_iter - it))
        hi_sum = 1e3 * best * npts
        x, r, p, rz1, kdone = cg_steps(
            x, r, p, rz[:, None], active.astype(dtype)[:, None],
            stop_sum[:, None], hi_sum[:, None], k)
        rz = rz1[:, 0]
        it_new = it + k
        iters = iters + jnp.where(active, kdone[:, 0], 0)
        # force the final check on a max_iter-truncated window — see
        # solvers/multigrid._run_mgcg_fused
        do_check = (((it_new - first_window) % check_every) == 0) \
            | (it_new >= max_iter)

        r_true, z_true, rz_true = fresh(x)
        refresh = expand(do_check & active)
        r = jnp.where(refresh, r_true, r)
        p = jnp.where(refresh, z_true, p)
        rz = jnp.where(do_check & active, rz_true, rz)

        r_mean = mean_abs(r_true)
        improved = do_check & active & (r_mean < best)
        x_best = jnp.where(expand(improved), x, x_best)
        best = jnp.where(improved, r_mean, best)
        diverged = do_check & active & (
            ~jnp.isfinite(r_mean) | (r_mean > 1e3 * best))

        deff_new = deff_fn(x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = r_mean / bscale
        else:
            pc_new = r_mean

        upd = do_check & active
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        pc = jnp.where(diverged, jnp.zeros_like(pc), pc)
        conv = jnp.where(upd, pc_new, conv)
        bad = bad | diverged
        return (x, r, p, rz, _z, it_new, deff, deff_old, pc, conv, iters,
                x_best, best, bad)

    r0, z0, rz0 = fresh(x_p)
    scal = lambda v: jnp.full((bsz,), v, dtype)
    init = (x_p, r0, z0, rz0, jnp.zeros((), dtype), jnp.asarray(0, jnp.int32),
            scal(1.0), scal(5.0), scal(100.0), scal(100.0),
            jnp.zeros((bsz,), jnp.int32), x_p, mean_abs(r0),
            jnp.zeros((bsz,), bool))
    out = jax.lax.while_loop(cond, body, init)
    (x, r, p, rz, _z, it, deff, deff_old, pc, conv, iters, x_best, best,
     bad) = out
    x_out = jnp.where(expand(bad), x_best, x)
    deff_out = deff_fn(x_out)
    if criterion == "relresidual":
        conv = jnp.where(bad, best / bscale, conv)
    elif criterion != "deff":
        conv = jnp.where(bad, best, conv)
    return SolveResult(x=unpad(x_out), deff=deff_out, conv=conv, iters=iters)


def _pcg3(coeffs, spec, x0, precond, batched, *, tol, max_iter, check_every, criterion):
    return run_pcg(
        matvec=lambda p: fvm3d.apply_operator_3d(coeffs, p),
        precond=precond,
        b=coeffs.b,
        x0=x0,
        deff_fn=lambda x: boundary_deff_3d(spec, x),
        tol=tol, max_iter=max_iter, check_every=check_every,
        criterion=criterion, grid_ndim=3, batched=batched,
    )


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg_3d(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                max_iter: int = 100_000, check_every: int = 0,
                criterion: str = "residual") -> SolveResult:
    return _pcg3(coeffs, spec, x0, lambda r: coeffs.diag_inv * r, False,
                 tol=tol, max_iter=max_iter,
                 check_every=driver.resolve_check_every(check_every, 100),
                 criterion=criterion)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg_3d_batched(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                        max_iter: int = 100_000, check_every: int = 0,
                        criterion: str = "residual") -> SolveResult:
    return _pcg3(coeffs, spec, x0, lambda r: coeffs.diag_inv * r, True,
                 tol=tol, max_iter=max_iter,
                 check_every=driver.resolve_check_every(check_every, 100),
                 criterion=criterion)


def _mgcg3_core(coeffs, spec, x0, *, tol, max_iter, check_every, criterion,
                batched, nu1, nu2, mg_omega, coarse_iters, min_size, over,
                use_pallas=None, pallas_interpret=False, d_field=None,
                first_window=1):
    # the 3D matrix-free engine measured NEUTRAL under a full-size opening
    # window (unlike 2D — see resolve_first_window), so d_field does not
    # force matrix_free=True here
    first_window = driver.resolve_first_window(first_window, check_every,
                                               criterion)
    if use_pallas is None:
        use_pallas = _pallas_auto_3d(coeffs, nu1, nu2)

    if use_pallas == "tiled3d":
        hier_coeffs = coeffs if batched else jax.tree.map(
            lambda a: a[None], coeffs)
        hier_spec = spec if batched else jax.tree.map(
            lambda a: jnp.asarray(a)[None], spec)
        if d_field is not None and not batched:
            d_field = d_field[None]
        res = _run_mgcg3d_fused(
            hier_coeffs, hier_spec, x0 if batched else x0[None],
            tol=tol, max_iter=max_iter, check_every=check_every,
            criterion=criterion, nu=nu1, mg_omega=mg_omega,
            coarse_iters=coarse_iters, min_size=min_size, over=over,
            d_field=d_field, interpret=pallas_interpret,
            first_window=first_window)
        if not batched:
            res = jax.tree.map(lambda a: a[0], res)
        return res

    levels = build_hierarchy_3d(coeffs, min_size=min_size)
    precond = lambda r: v_cycle_3d(levels, r, nu1=nu1, nu2=nu2, omega=mg_omega,
                                   coarse_iters=coarse_iters, over=over)
    return _pcg3(coeffs, spec, x0, precond, batched,
                 tol=tol, max_iter=max_iter, check_every=check_every,
                 criterion=criterion)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "nu1", "nu2", "mg_omega", "coarse_iters", "min_size",
                     "over", "use_pallas", "pallas_interpret",
                     "first_window"),
)
def solve_mgcg_3d(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                  max_iter: int = 10_000, check_every: int = 0,
                  criterion: str = "residual", nu1: int = 1, nu2: int = 1,
                  mg_omega: float = 0.8, coarse_iters: int = 32,
                  min_size: int = 4, over: float = 1.8,
                  use_pallas=None, pallas_interpret: bool = False,
                  d_field=None, first_window: int = 1) -> SolveResult:
    """3D multigrid-PCG.  ``use_pallas``: None = auto (the banded fused
    whole-CG-iteration engine on TPU fp32 V(nu, nu) — ops/kernels/
    cgstep3d.py); False forces the XLA path; "tiled3d" forces the fused
    engine (CPU tests pass pallas_interpret=True).

    ``d_field``: optionally the raw diffusivity volume behind ``coeffs``.
    When given AND ``coeffs`` is exactly the plain unmasked, unequilibrated
    ``fvm_coefficients_3d(d_field, cl, cr)``, the fused engine recomputes
    its level-0 stencil from D in-kernel instead of streaming 4 stored
    coefficient fields (matrix-free level 0 — ~1.4x on the engine's
    per-iteration HBM traffic).  Ignored on the XLA path.

    ``first_window``: iterations in the first fused-engine launch window
    (fused engine only) — see solvers/multigrid.solve_mgcg."""
    return _mgcg3_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                       check_every=driver.resolve_check_every(check_every, 10),
                       criterion=criterion, batched=False, nu1=nu1, nu2=nu2,
                       mg_omega=mg_omega, coarse_iters=coarse_iters,
                       min_size=min_size, over=over, use_pallas=use_pallas,
                       pallas_interpret=pallas_interpret, d_field=d_field,
                       first_window=first_window)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "nu1", "nu2", "mg_omega", "coarse_iters", "min_size",
                     "over", "use_pallas", "pallas_interpret",
                     "first_window"),
)
def solve_mgcg_3d_batched(coeffs, spec, x0, *, omega: float = 0.0,
                          tol: float = 1e-8, max_iter: int = 10_000,
                          check_every: int = 0, criterion: str = "residual",
                          nu1: int = 1, nu2: int = 1, mg_omega: float = 0.8,
                          coarse_iters: int = 32, min_size: int = 4,
                          over: float = 1.8,
                          use_pallas=None, pallas_interpret: bool = False,
                          d_field=None,
                          first_window: int = 1) -> SolveResult:
    """Batched :func:`solve_mgcg_3d` (see it for ``d_field``)."""
    return _mgcg3_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                       check_every=driver.resolve_check_every(check_every, 10),
                       criterion=criterion, batched=True, nu1=nu1, nu2=nu2,
                       mg_omega=mg_omega, coarse_iters=coarse_iters,
                       min_size=min_size, over=over, use_pallas=use_pallas,
                       pallas_interpret=pallas_interpret, d_field=d_field,
                       first_window=first_window)

"""Geometric multigrid: aggregation-Galerkin hierarchy + V-cycle PCG.

The reference's only solver is weighted Jacobi (Deff2D.cuh:69-92), which
needs O(n^2) sweeps for grid diameter n; its DCF/DCG homotopies exist to
nurse that solver through high-contrast media.  Multigrid is the
asymptotically right algorithm for the steady-state diffusion equation:
O(N) work per digit of accuracy regardless of grid size.

Construction (all closed-form array ops, TPU-friendly):
  * Aggregates are aligned 2x2 cell blocks; restriction R sums over the
    block, prolongation P = R^T injects piecewise-constant corrections.
  * Coarse operators are Galerkin products A_c = R A P, which for an aligned
    2x2 aggregation of a 5-point stencil stay 5-point stencils in closed
    form:
      - coarse E/W (N/S) conductance = sum of the two fine conductances
        crossing the aggregate face;
      - coarse diagonal = sum of fine diagonals - 2 * (internal
        conductances), because each intra-block coupling A_ij = A_ji = -a
        appears twice in sum_{i,j in I} A_ij.
    Dirichlet boundary terms ride along inside the fine diagonals/RHS.
  * Odd dimensions are padded with decoupled identity rows (diag=1, a=0,
    b=0) before coarsening.
  * Smoother: damped Jacobi (omega=0.8), symmetric pre+post -> the V(1,1)
    cycle is an SPD operator, hence a valid PCG preconditioner.
  * Coarsest level (<= min_size): a fixed block of damped-Jacobi sweeps.
    Tuning note for LARGE grids (>= 256^2): min_size=32 / coarse_iters=64
    is ~24% faster than the defaults at 512^2 (profiled: tiny deep levels
    cost fixed overhead; the V-cycle measured 5.5 matvec-equivalents with a
    depth-7 hierarchy).  The defaults keep deep hierarchies because small
    grids (tests, crops) need them for preconditioning quality.

``solve_mgcg`` runs PCG with one V-cycle as the preconditioner — robust on
the contrast-1e6 media where both plain Jacobi and diagonal-PCG crawl — and
plugs into the same driver semantics (Deff/residual monitors, chunked
checks, batched per-image freezing) as every other solver.

Masked (3-phase) systems must use the symmetrized assembly
(``fvm_coefficients(..., symmetric=True)``), same as plain CG.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from ..ops.kernels.vcycle_vmem import smoothing_schedule
from .driver import SolveResult, resolve_check_every, resolve_first_window
from .pcg import run_pcg

__all__ = ["build_hierarchy", "v_cycle", "solve_mgcg", "solve_mgcg_batched"]


def _pad_op(c: fvm.StencilCoeffs, py: int, px: int) -> fvm.StencilCoeffs:
    """Pad the operator by (py, px) trailing rows/cols of decoupled identity
    cells (diag=1, couplings=0, b=0): the padded block is an independent
    x=0 subsystem that never talks to the physical cells."""
    if not (py or px):
        return c
    lead = c.diag.ndim - 2
    pad = [(0, 0)] * lead + [(0, py), (0, px)]

    def z(a):
        return jnp.pad(a, pad)

    def d(a):  # diag pads with 1 (identity rows)
        return jnp.pad(a, pad, constant_values=1.0)

    diag = d(c.diag)
    return fvm.StencilCoeffs(
        a_w=z(c.a_w), a_e=z(c.a_e), a_n=z(c.a_n), a_s=z(c.a_s),
        diag=diag, diag_inv=jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0),
        b=z(c.b),
    )


def _pad_even(c: fvm.StencilCoeffs) -> fvm.StencilCoeffs:
    """Pad odd dims with decoupled identity cells so 2x2 blocks align."""
    ny, nx = c.diag.shape[-2], c.diag.shape[-1]
    return _pad_op(c, ny % 2, nx % 2)


def _blocks(a):
    """(..., 2i, 2j) -> (..., i, 2, j, 2) view."""
    ny, nx = a.shape[-2], a.shape[-1]
    return a.reshape(a.shape[:-2] + (ny // 2, 2, nx // 2, 2))


def restrict(r):
    """R r: sum over aligned 2x2 blocks."""
    return _blocks(r).sum(axis=(-3, -1))


def prolong(e):
    """P e: piecewise-constant injection (repeat 2x2)."""
    e2 = jnp.repeat(e, 2, axis=-2)
    return jnp.repeat(e2, 2, axis=-1)


def coarsen(c: fvm.StencilCoeffs) -> fvm.StencilCoeffs:
    """Galerkin coarse operator R A P for aligned 2x2 aggregation (closed
    form; see module docstring)."""
    c = _pad_even(c)
    ae, as_ = c.a_e, c.a_s

    # conductances crossing coarse E faces: fine a_e at odd columns
    ae_b = _blocks(ae)                       # (..., I, 2, J, 2)
    a_e_c = ae_b[..., :, :, :, 1].sum(-2)    # sum the 2 rows at fine col 2j+1
    # crossing coarse S faces: fine a_s at odd rows
    as_b = _blocks(as_)
    a_s_c = as_b[..., :, 1, :, :].sum(-1)

    # internal couplings: fine a_e at even columns (within-block E faces) and
    # fine a_s at even rows (within-block S faces)
    internal = ae_b[..., :, :, :, 0].sum(-2) + as_b[..., :, 0, :, :].sum(-1)

    diag_c = restrict(c.diag) - 2.0 * internal
    b_c = restrict(c.b)

    # mirror couplings
    z_col = jnp.zeros_like(a_e_c[..., :, :1])
    z_row = jnp.zeros_like(a_s_c[..., :1, :])
    a_e_c = jnp.concatenate([a_e_c[..., :, :-1], z_col], axis=-1)
    a_w_c = jnp.concatenate([z_col, a_e_c[..., :, :-1]], axis=-1)
    a_s_c = jnp.concatenate([a_s_c[..., :-1, :], z_row], axis=-2)
    a_n_c = jnp.concatenate([z_row, a_s_c[..., :-1, :]], axis=-2)

    # Guard against catastrophic cancellation in low precision: the exact
    # coarse diagonal is >= the sum of crossing+boundary conductances > 0,
    # but fp32 rounding of (restrict(diag) - 2*internal) with contrast-1e6
    # media can produce tiny or negative values whose reciprocal blows up
    # the smoother.  Cells whose diagonal lost all significance are
    # decoupled (diag_inv = 0 -> never smoothed at this level).
    floor = jnp.asarray(1e-6, diag_c.dtype) * restrict(c.diag)
    ok = diag_c > floor
    diag_inv = jnp.where(ok, 1.0 / jnp.where(ok, diag_c, 1.0), 0.0)
    return fvm.StencilCoeffs(a_w_c, a_e_c, a_n_c, a_s_c, diag_c, diag_inv, b_c)


def build_hierarchy(c: fvm.StencilCoeffs, min_size: int = 8,
                    pad_levels: bool = False) -> List[fvm.StencilCoeffs]:
    """Fine-to-coarse operator list; stops when both dims <= min_size.

    ``pad_levels=True`` stores every level pre-padded to even dims (decoupled
    identity rows, same as the padding ``coarsen`` applies internally), which
    the fused Pallas V-cycle kernel requires; the XLA cycle accepts either.
    """
    if pad_levels:
        c = _pad_even(c)
    levels = [c]
    while min(c.diag.shape[-2], c.diag.shape[-1]) > min_size:
        c = coarsen(c)
        if pad_levels:
            c = _pad_even(c)
        levels.append(c)
    return levels


def _smooth(c: fvm.StencilCoeffs, x, b, omega):
    """One damped-Jacobi smoothing sweep against an arbitrary RHS."""
    num = b + fvm.neighbor_sum(c, x)
    return (1.0 - omega) * x + omega * num * c.diag_inv


def _pad_to(r, shape):
    """Zero-pad the trailing dims of r up to the (padded-even) level shape."""
    py = shape[-2] - r.shape[-2]
    px = shape[-1] - r.shape[-1]
    if py or px:
        lead = r.ndim - 2
        r = jnp.pad(r, [(0, 0)] * lead + [(0, py), (0, px)])
    return r


def v_cycle(levels: List[fvm.StencilCoeffs], r, *, nu1=1, nu2=1,
            omega=0.8, coarse_iters=32, level=0, over=1.8):
    """Apply one V(nu1, nu2) cycle to the residual equation A e = r.

    Returns the correction e on the finest level's (unpadded) shape.  The
    recursion is over a static Python list -> fully unrolled under jit.

    ``omega``: scalar damping, or a tuple of nu1 (== nu2) per-sweep
    factors (Chebyshev schedule; applied in order pre, reversed post —
    symmetry, see :func:`smoothing_schedule`).  The coarse solve always
    sweeps at the schedule's last (most-damped) factor.

    ``over`` is the coarse-grid over-correction factor: piecewise-constant
    aggregation systematically over-stiffens the Galerkin coarse operator
    (energy of the injected correction is underestimated ~2x per level for a
    5-point stencil), so the prolongated correction is scaled up.  Measured
    on correlated contrast-1e6 media: standalone cycle contraction improves
    0.94 -> 0.73 and MGCG iteration counts drop ~3x at over=1.8 vs 1.0.
    The scaling is a scalar on the P A_c^-1 P^T term, so the preconditioner
    stays symmetric positive definite.
    """
    c = levels[level]
    shp = c.diag.shape
    r_lvl = _pad_to(r, shp)
    om1 = smoothing_schedule(omega, nu1)
    om2 = smoothing_schedule(omega, nu2)

    if level == len(levels) - 1:
        e = jnp.zeros_like(r_lvl)
        for _ in range(coarse_iters):
            e = _smooth(c, e, r_lvl, om1[-1])
        return e[..., :r.shape[-2], :r.shape[-1]]

    e = jnp.zeros_like(r_lvl)
    for w in om1:
        e = _smooth(c, e, r_lvl, w)

    # residual of the correction equation, padded to the 2x coarse shape
    # (odd level dims get a zero-padded dummy row/col) and restricted
    res = r_lvl - (c.diag * e - fvm.neighbor_sum(c, e))
    next_shp = levels[level + 1].diag.shape
    res = _pad_to(res, res.shape[:-2] + (2 * next_shp[-2], 2 * next_shp[-1]))
    r_c = restrict(res)
    e_c = v_cycle(levels, r_c, nu1=nu1, nu2=nu2, omega=omega,
                  coarse_iters=coarse_iters, level=level + 1, over=over)
    e = e + over * prolong(e_c)[..., :shp[-2], :shp[-1]]

    for w in reversed(om2):
        e = _smooth(c, e, r_lvl, w)
    return e[..., :r.shape[-2], :r.shape[-1]]




def _run_mgcg_fused(coeffs, spec, x0, *, tol, max_iter, check_every,
                    criterion, nu, mg_omega, coarse_iters, min_size, over,
                    d_field=None, interpret=False,
                    engine="vmem", first_window=1) -> SolveResult:
    """Batched MGCG with a whole-iteration fused engine: k = check_every
    full PCG iterations per launch.  ``engine="vmem"`` keeps the CG state
    resident in VMEM (cgstep_vmem.py, fine grids that fit);
    ``engine="tiled"`` runs each iteration as three banded Pallas passes
    (cgstep_tiled.py, fine grids past the VMEM cap).  Check/restart/
    divergence/freeze semantics mirror ``pcg.run_pcg`` (chunked checks,
    true-residual refresh, best-iterate snapshot); monitors are evaluated
    on the physical (unpadded) cells.

    ``d_field`` (optional, (B, ny, nx), tiled engine only) switches the
    engine's level 0 matrix-free — only valid when ``coeffs`` is exactly
    the plain unmasked ``fvm_coefficients(d_field, cl, cr)``; see
    cg_steps_tiled.  Ignored by the vmem engine (its pyramid is
    VMEM-resident, so recomputing would trade nearly-free reads for VPU
    divisions).
    """
    bsz, ny, nx = coeffs.b.shape
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    if engine == "tiled":
        from ..ops.kernels.cgstep_tiled import cg_steps_tiled
        from ..ops.kernels.vcycle_tiled import (tiled_band, tiled_pad_shape,
                                                v_cycle_tiled)

        band = tiled_band(ny, nx, coeffs.diag.dtype.itemsize)
        py, px = tiled_pad_shape(ny, nx, band)
        levels = build_hierarchy(_pad_op(coeffs, py - ny, px - nx),
                                 min_size=min_size, pad_levels=True)
        if d_field is not None:
            d_p = jnp.pad(d_field.astype(dtype),
                          [(0, 0), (0, py - ny), (0, px - nx)])
            dx, dy = 1.0 / nx, 1.0 / ny
            geom = (dy / dx, dx / dy, dy / (dx / 2.0), nx)
        else:
            d_p, geom = None, None

        def cg_steps(x, r, p, rz, active, stop_s, hi_s, k):
            return cg_steps_tiled(
                levels, x, r, p, rz, active, stop_s, hi_s, k,
                omega=mg_omega, nu=nu, coarse_iters=coarse_iters, over=over,
                band=band, interpret=interpret, d_field=d_p, geom=geom)

        def cycle(r):
            return v_cycle_tiled(levels, r, omega=mg_omega,
                                 coarse_iters=coarse_iters, over=over,
                                 nu=nu, band=band, interpret=interpret)
    else:
        from ..ops.kernels.cgstep_vmem import cg_steps_pallas
        from ..ops.kernels.vcycle_vmem import v_cycle_pallas

        levels = build_hierarchy(coeffs, min_size=min_size, pad_levels=True)
        py, px = levels[0].diag.shape[-2], levels[0].diag.shape[-1]

        def cg_steps(x, r, p, rz, active, stop_s, hi_s, k):
            return cg_steps_pallas(
                levels, x, r, p, rz, active, stop_s, hi_s, k,
                omega=mg_omega, nu=nu, coarse_iters=coarse_iters, over=over,
                interpret=interpret, refresh=True)

        def cycle(r):
            return v_cycle_pallas(levels, r, omega=mg_omega,
                                  coarse_iters=coarse_iters, over=over,
                                  nu=nu, interpret=interpret)
    lvl0 = levels[0]
    pad = (py != ny) or (px != nx)

    def pad_to(a):
        return jnp.pad(a, [(0, 0), (0, py - ny), (0, px - nx)]) if pad else a

    def unpad(a):
        return a[..., :ny, :nx] if pad else a

    b_p = lvl0.b
    x_p = pad_to(x0)

    def matvec(v):
        return fvm.apply_operator(lvl0, v)

    def mean_abs(v):
        return jnp.mean(jnp.abs(unpad(v)), axis=(-2, -1))

    def dot(u, v):
        return jnp.sum(u * v, axis=(-2, -1))

    def expand(v):
        return v[:, None, None]

    bscale = mean_abs(b_p) if criterion == "relresidual" else None

    # In-kernel early-exit threshold: the kernel compares sum|r| (padded
    # cells carry exact zeros), the driver's criterion is mean|r| over the
    # physical cells — same test scaled by ny*nx.  criterion="deff" cannot
    # be evaluated in-kernel (flux monitor), so its stop is 0 (disabled);
    # the divergence tripwire (hi) is active for every criterion.
    npts = jnp.asarray(ny * nx, dtype)
    if criterion == "residual":
        stop_sum = jnp.full((bsz,), tol, dtype) * npts
    elif criterion == "relresidual":
        stop_sum = tol_ * bscale * npts
    else:
        stop_sum = jnp.zeros((bsz,), dtype)

    def deff_fn(xp):
        return boundary_deff(spec, unpad(xp))

    def fresh(xp):
        r = b_p - matvec(xp)
        z = cycle(r)
        return r, z, dot(r, z)

    def cond(c):
        pc, it = c[8], c[5]
        return jnp.any(tol_ < jnp.abs(pc)) & (it < max_iter)

    kernel_refresh = engine == "vmem"

    def body(c):
        (x, r, p, rz, _z, it, deff, deff_old, pc, conv, iters, x_best, best,
         bad) = c
        active = tol_ < jnp.abs(pc)
        k = jnp.where(it == 0, jnp.minimum(first_window, max_iter),
                      jnp.minimum(check_every, max_iter - it))
        hi_sum = 1e3 * best * npts    # in-kernel divergence tripwire
        out = cg_steps(
            x, r, p, rz[:, None], active.astype(dtype)[:, None],
            stop_sum[:, None], hi_sum[:, None], k)
        x, r, p, rz1, kdone = out[:5]
        rz = rz1[:, 0]
        it_new = it + k
        iters = iters + jnp.where(active, kdone[:, 0], 0)
        # a window truncated by max_iter (max_iter < first_window, or not a
        # multiple of check_every past it) would otherwise never land on the
        # modulo phase — force the final check so conv/deff are never
        # returned as their init sentinels
        do_check = (((it_new - first_window) % check_every) == 0) \
            | (it_new >= max_iter)

        if kernel_refresh:
            # the vmem engine refreshes + restarts in-kernel (active
            # images only; cgstep_vmem refresh=True): r = b - A x, p = z,
            # rz = <r, z> arrive restarted, sum|r_true| rides out[5]
            r_mean = out[5][:, 0] / npts
        else:
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
    # last iterate unless the divergence net fired (see pcg.run_pcg)
    x_out = jnp.where(expand(bad), x_best, x)
    deff_out = deff_fn(x_out)
    if criterion == "relresidual":
        conv = jnp.where(bad, best / bscale, conv)
    elif criterion != "deff":
        conv = jnp.where(bad, best, conv)
    return SolveResult(x=unpad(x_out), deff=deff_out, conv=conv,
                       iters=iters)


def _pallas_auto(coeffs, nu1, nu2, min_size):
    """Default kernel selection for TPU fp32 V(nu, nu): the whole-cycle VMEM
    kernel when the pyramid fits (True), else the row-tiled streaming kernel
    ("tiled", ops/kernels/vcycle_tiled.py) for large fine grids."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or nu1 != nu2 or nu1 > 4:
        return False
    if coeffs.diag.dtype != jnp.float32:
        return False
    from ..ops.kernels.vcycle_vmem import vcycle_fits_vmem

    ny, nx = coeffs.diag.shape[-2], coeffs.diag.shape[-1]
    if vcycle_fits_vmem(ny + ny % 2, nx + nx % 2):
        return True
    return "tiled"


def _mgcg_core(coeffs, spec, x0, *, tol, max_iter, check_every, criterion,
               batched, nu1, nu2, omega, coarse_iters, min_size, over,
               use_pallas=None, pallas_interpret=False, d_field=None,
               first_window=1):
    first_window = resolve_first_window(first_window, check_every, criterion,
                                        matrix_free=d_field is not None)
    if use_pallas is None:
        use_pallas = _pallas_auto(coeffs, nu1, nu2, min_size)
        if use_pallas is True:
            from ..ops.kernels.cgstep_vmem import cgstep_fits_vmem

            ny, nx = coeffs.diag.shape[-2], coeffs.diag.shape[-1]
            if cgstep_fits_vmem(ny + ny % 2, nx + nx % 2):
                use_pallas = "cgstep"

    if use_pallas in ("cgstep", "tiled"):
        # whole-iteration fusion: "cgstep" keeps the CG state + pyramid
        # resident in VMEM (cgstep_vmem.py); "tiled" runs each iteration as
        # three banded passes past the VMEM cap (cgstep_tiled.py)
        if nu1 != nu2:
            raise ValueError("the fused CG engines implement V(nu, nu)")
        hier_coeffs = coeffs if batched else jax.tree.map(
            lambda a: a[None], coeffs)
        hier_spec = spec if batched else jax.tree.map(
            lambda a: jnp.asarray(a)[None], spec)
        if d_field is not None and not batched:
            d_field = d_field[None]
        res = _run_mgcg_fused(
            hier_coeffs, hier_spec, x0 if batched else x0[None],
            tol=tol, max_iter=max_iter, check_every=check_every,
            criterion=criterion, nu=nu1, mg_omega=omega,
            coarse_iters=coarse_iters, min_size=min_size, over=over,
            d_field=d_field if use_pallas == "tiled" else None,
            interpret=pallas_interpret,
            engine="tiled" if use_pallas == "tiled" else "vmem",
            first_window=first_window)
        if not batched:
            res = jax.tree.map(lambda a: a[0], res)
        return res

    if use_pallas == "tiledcycle":
        # row-tiled streaming cycle as an XLA-CG preconditioner only
        # (ops/kernels/vcycle_tiled.py): kept for comparison/debugging —
        # production large grids ride the fully fused "tiled" engine above
        from ..ops.kernels.vcycle_tiled import (tiled_band, tiled_pad_shape,
                                                v_cycle_tiled)

        hier_coeffs = coeffs if batched else jax.tree.map(
            lambda a: a[None], coeffs)
        ny, nx = coeffs.diag.shape[-2], coeffs.diag.shape[-1]
        band = tiled_band(ny, nx, coeffs.diag.dtype.itemsize)
        py, px = tiled_pad_shape(ny, nx, band)
        levels = build_hierarchy(_pad_op(hier_coeffs, py - ny, px - nx),
                                 min_size=min_size, pad_levels=True)

        def precond(r):
            rb = r if batched else r[None]
            if (py, px) != (ny, nx):
                rb = jnp.pad(rb, [(0, 0), (0, py - ny), (0, px - nx)])
            z = v_cycle_tiled(levels, rb, omega=omega, nu=nu1,
                              coarse_iters=coarse_iters, over=over,
                              band=band, interpret=pallas_interpret)
            z = z[..., :ny, :nx]
            return z if batched else z[0]
    elif use_pallas:
        from ..ops.kernels.vcycle_vmem import v_cycle_pallas

        hier_coeffs = coeffs if batched else jax.tree.map(
            lambda a: a[None], coeffs)
        levels = build_hierarchy(hier_coeffs, min_size=min_size,
                                 pad_levels=True)
        ny, nx = coeffs.diag.shape[-2], coeffs.diag.shape[-1]
        py, px = levels[0].diag.shape[-2], levels[0].diag.shape[-1]

        def precond(r):
            rb = r if batched else r[None]
            if (py, px) != (ny, nx):
                rb = jnp.pad(rb, [(0, 0), (0, py - ny), (0, px - nx)])
            z = v_cycle_pallas(levels, rb, omega=omega,
                               coarse_iters=coarse_iters, over=over, nu=nu1,
                               interpret=pallas_interpret)
            z = z[..., :ny, :nx]
            return z if batched else z[0]
    else:
        levels = build_hierarchy(coeffs, min_size=min_size)

        def precond(r):
            return v_cycle(levels, r, nu1=nu1, nu2=nu2, omega=omega,
                           coarse_iters=coarse_iters, over=over)

    return run_pcg(
        matvec=lambda p: fvm.apply_operator(coeffs, p),
        precond=precond,
        b=coeffs.b,
        x0=x0,
        deff_fn=lambda x: boundary_deff(spec, x),
        tol=tol, max_iter=max_iter, check_every=check_every,
        criterion=criterion, grid_ndim=2, batched=batched,
    )


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "nu1", "nu2", "mg_omega", "coarse_iters", "min_size", "over",
                     "use_pallas", "pallas_interpret", "first_window"),
)
def solve_mgcg(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
               max_iter: int = 10_000, check_every: int = 0,
               criterion: str = "residual", nu1: int = 1, nu2: int = 1,
               mg_omega: float = 0.8, coarse_iters: int = 32,
               min_size: int = 8, over: float = 1.8,
               use_pallas=None, pallas_interpret: bool = False,
               d_field=None, first_window: int = 1) -> SolveResult:
    """Multigrid-preconditioned CG, single image.  ``omega`` ignored
    (signature parity).

    ``use_pallas``: None = auto (fused whole-V-cycle Pallas kernel on TPU
    fp32 V(1,1) when the hierarchy fits VMEM; ops/kernels/vcycle_vmem.py —
    requires the symmetric assembly, which every pipeline provides via
    needs_spd); True/False forces.  ``pallas_interpret`` runs the kernel in
    interpreter mode (CPU tests).

    ``d_field``: optionally the raw diffusivity field behind ``coeffs``.
    When ``coeffs`` is exactly the plain unmasked, unequilibrated
    ``fvm_coefficients(d_field, cl, cr)``, the banded fused engine (grids
    past the VMEM cap) recomputes its level-0 stencil in-kernel from D
    instead of streaming 3 stored coefficient fields (matrix-free; see
    cg_steps_tiled).  Ignored by the other engines.

    ``first_window``: iterations in the FIRST fused-kernel launch window
    (fused engines only; the XLA engine always checks after iteration 1).
    The default 1 checks early — right for warm-started pipeline stages
    that may already satisfy the criterion at x0.  Cold batched solves
    whose criterion supports the in-kernel early exit (residual/
    relresidual) can pass ``first_window=check_every`` to skip the
    1-iteration launch + refresh round entirely: converged images still
    stop in-kernel at the same threshold, and the bench-medium schedule
    (20, 20, ...) saves one full launch + true-residual refresh per batch.
    Avoid with criterion="deff" (no
    in-kernel stop: every image would run first_window blind
    iterations).  ``0`` = auto: check_every for residual/relresidual,
    1 for deff (what the pipelines pass — config.py ``FirstWindow:``).
    With ``d_field`` (the 2D matrix-free banded engine) keep
    ``first_window=1``: the mf engine degrades under a long blind opening
    window (measured at 2048² contrast 1e6: 111 iterations at
    first_window=10 vs 41 at 1, while the stored path improves 47 → 37
    — the early true-residual restart repairs the small level-0
    stencil mismatch between the in-kernel recompute and the stored
    refresh operator before CG amplifies it)."""
    return _mgcg_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                      check_every=resolve_check_every(check_every, 10),
                      criterion=criterion, batched=False, nu1=nu1, nu2=nu2, omega=mg_omega,
                      coarse_iters=coarse_iters, min_size=min_size, over=over,
                      use_pallas=use_pallas, pallas_interpret=pallas_interpret,
                      d_field=d_field, first_window=first_window)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "nu1", "nu2", "mg_omega", "coarse_iters", "min_size", "over",
                     "use_pallas", "pallas_interpret", "first_window"),
)
def solve_mgcg_batched(coeffs, spec, x0, *, omega: float = 0.0,
                       tol: float = 1e-8, max_iter: int = 10_000,
                       check_every: int = 0, criterion: str = "residual",
                       nu1: int = 1, nu2: int = 1, mg_omega: float = 0.8,
                       coarse_iters: int = 32, min_size: int = 8,
                       over: float = 1.8,
                       use_pallas=None, pallas_interpret: bool = False,
                       d_field=None, first_window: int = 1) -> SolveResult:
    """Batched :func:`solve_mgcg` (see it for ``d_field`` and
    ``first_window``)."""
    return _mgcg_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                      check_every=resolve_check_every(check_every, 10),
                      criterion=criterion, batched=True, nu1=nu1, nu2=nu2, omega=mg_omega,
                      coarse_iters=coarse_iters, min_size=min_size, over=over,
                      use_pallas=use_pallas, pallas_interpret=pallas_interpret,
                      d_field=d_field, first_window=first_window)

"""κ-robust solver for extreme-contrast multiphase media: deflated MGCG.

The shipped demo config (00042.jpg, Dg = 1,237,500 → κ ~ 1e11; see
docs/PERFORMANCE.md case study) defeats every single-idea solver measured in
round 1: multigrid alone stalls on the per-gas-component near-kernel
(aggregation coarse spaces mis-scale across 1e6 jumps), component deflation
alone (``dcg``) removes that near-kernel but leaves the fluid-bridge
ill-conditioning to a diagonal preconditioner, and fp32 anything floors
orders of magnitude short of the flux-converged regime.  The reference's
own answer is the DCG homotopy ladder (Deff2D.cuh:1492-1549) nursing a
Jacobi solver — protocol, not physics.

``dmg`` combines both subspace corrections in the numerically robust form,
established by three measured findings (debug history, round 2):

  1. The engine runs on the symmetric-equilibrated system A' = S A S
     (unit diagonal).  The deflation space transforms to W' = S^-1 W —
     still disjoint-support indicator-shaped, so the coarse apply stays a
     weighted segment-sum — and the coarse matrix is INVARIANT:
     E' = W'^T A' W' = W^T A W.
  2. Deflation is applied in the A-DEF2 form (Tang, Nabben, Vuik &
     Erlangga 2009): plain PCG with preconditioner
         M^-1 = (I - Q A) M_mg^-1 + Q,      Q = W E^-1 W^T
     and the special start x0 <- Q b + (I - Q A) x0.  The projected DEF1
     form measured ~4x slower on blob media and is the known-fragile
     variant under perturbation; A-DEF2 tolerates the engine's
     true-residual restarts at every convergence check.
  3. The iteration must run in f64 — ||Q|| ~ 1/lambda_min ~ 1e6, so fp32
     deflation arithmetic floors at ~1e-1 relative residual (measured;
     both DEF1 and A-DEF2) — but the V-cycle PRECONDITIONER runs in f32
     with zero measured loss of convergence rate: the hot plane traffic
     (smoothing sweeps) rides fp32 HBM bandwidth while the f64 work is
     two matvecs + vector algebra per iteration.

Measured on the full 00042.jpg f64 system: ~1 digit per ~10 iterations
through the plateaus that stop dcg (3.7e-4) and plain MGCG (~1e-5), down
to the classical f64 attainable-accuracy plateau ~6e-11; the
correction-form refinement (:func:`solve_dmg_refined`) continues through
that to relres 6e-12 with boundary/all-cuts flux agreement 4e-6
(docs/PERFORMANCE.md case study, parity_out/case_00042_dmg.json).

Accepts the gas ``member`` mask (host bool array) like ``dcg``; with no
components it degenerates to equilibrated MGCG (still a strong solver for
2-phase media).  Requires f64 inputs (``Dtype: float64``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fvm
from ..ops.flux import boundary_deff
from .deflation import (DeflationSpace, _coarse_apply, _pad_deflation,
                        build_component_deflation)
from .driver import SolveResult, resolve_check_every
from .multigrid import build_hierarchy, v_cycle
from .pcg import run_pcg

__all__ = ["solve_dmg", "solve_dmg_batched", "solve_dmg_refined"]


_MG_DEFAULTS = dict(nu=2, mg_omega=0.8, coarse_iters=32, min_size=16,
                    over=1.8)


def _mg_kw(kw):
    out = dict(_MG_DEFAULTS)
    out.update({k: kw[k] for k in _MG_DEFAULTS if k in kw})
    unknown = set(kw) - set(_MG_DEFAULTS)
    if unknown:
        raise TypeError(f"unknown dmg options: {sorted(unknown)}")
    return out


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "m", "nu", "mg_omega", "coarse_iters", "min_size",
                     "over", "precond_f32", "use_pallas", "pallas_interpret"),
)
def _solve_dmg_jit(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv, *, omega,
                   tol, max_iter, check_every, criterion, m, nu, mg_omega,
                   coarse_iters, min_size, over, precond_f32,
                   use_pallas=False, pallas_interpret=False):
    dtype = x0.dtype
    c_eq, s = fvm.equilibrate(coeffs)
    defl = (DeflationSpace(labels=labels, e_hat_inv=e_hat_inv,
                           dhalf_inv=dhalf_inv, m=m) if m > 0 else None)
    w = 1.0 / s                                  # = sqrt(diag): W' = S^-1 W

    pdt = jnp.float32 if precond_f32 else dtype
    # The hierarchy is built on the RAW operator, not the equilibrated one:
    # aggregation interpolation must follow the physical conductances.  On
    # A' = S A S the smooth modes are S^-1-scaled — they jump ~sqrt(contrast)
    # across phase interfaces, which piecewise-constant aggregation cannot
    # interpolate (measured on the 2007x1002 demo: eq-space hierarchy
    # contracts ~2.3x per 100 iterations; raw-space ~1 digit per ~10).  The
    # raw cycle plugs into the equilibrated engine by the similarity maps
    # r_raw = S^-1 r' = w.r' and z' = S^-1 e = w.e, so
    # M'_mg = S^-1 M_mg S^-1 — still SPD.
    raw = jax.tree.map(lambda a: a.astype(pdt), coeffs)
    if use_pallas == "tiled":
        # row-tiled streaming Pallas cycle (ops/kernels/vcycle_tiled.py) for
        # fine grids past the whole-VMEM cap — the shipped 2007x1002 demo
        # (Deff2D.cuh:1336) lands here on TPU
        from ..ops.kernels.vcycle_tiled import (tiled_band, tiled_pad_shape,
                                                v_cycle_tiled)
        from .multigrid import _pad_op

        ny, nx = x0.shape
        band = tiled_band(ny, nx, jnp.dtype(pdt).itemsize)
        py, px = tiled_pad_shape(ny, nx, band)
        levels = build_hierarchy(
            _pad_op(jax.tree.map(lambda a: a[None], raw), py - ny, px - nx),
            min_size=min_size, pad_levels=True)

        def cycle(rr):
            rp = jnp.pad(rr[None], [(0, 0), (0, py - ny), (0, px - nx)])
            z = v_cycle_tiled(levels, rp, omega=mg_omega, nu=nu,
                              coarse_iters=coarse_iters, over=over,
                              band=band, interpret=pallas_interpret)
            return z[0, :ny, :nx]
    elif use_pallas:
        from ..ops.kernels.vcycle_vmem import v_cycle_pallas

        levels = build_hierarchy(jax.tree.map(lambda a: a[None], raw),
                                 min_size=min_size, pad_levels=True)
        ny, nx = x0.shape
        py, px = levels[0].diag.shape[-2], levels[0].diag.shape[-1]

        def cycle(rr):
            rp = rr[None]
            if (py, px) != (ny, nx):
                rp = jnp.pad(rp, [(0, 0), (0, py - ny), (0, px - nx)])
            z = v_cycle_pallas(levels, rp, omega=mg_omega, nu=nu,
                               coarse_iters=coarse_iters, over=over,
                               interpret=pallas_interpret)
            return z[0, :ny, :nx]
    else:
        levels = build_hierarchy(raw, min_size=min_size)

        def cycle(rr):
            return v_cycle(levels, rr, nu1=nu, nu2=nu, omega=mg_omega,
                           coarse_iters=coarse_iters, over=over)

    def matvec(p):
        return fvm.apply_operator(c_eq, p)

    if defl is not None:
        def q_apply(v):
            return _coarse_apply(defl, v, w)
    else:
        def q_apply(v):
            return jnp.zeros_like(v)

    def precond(r):
        z = w * cycle((w * r).astype(pdt)).astype(dtype)
        # A-DEF2: M^-1 r = (I - Q A) z + Q r.  Deliberately NOT folded to
        # the one-apply z + Q(r - A z): algebraically identical, but the
        # folded form floors the refined demo-image solve at 3.5e-11 where
        # this form keeps contracting to 6e-12 (measured on the chip, 3581
        # vs 1901 iterations; the ~1e6 coarse-space amplification makes the
        # two forms' rounding paths genuinely different).
        return z - q_apply(matvec(z)) + q_apply(r)

    x0e = x0 / s
    x0h = q_apply(c_eq.b) + x0e - q_apply(matvec(x0e))   # deflated start

    res = run_pcg(
        matvec=matvec, precond=precond, b=c_eq.b, x0=x0h,
        deff_fn=lambda xh: boundary_deff(spec, s * xh),
        tol=tol, max_iter=max_iter,
        check_every=resolve_check_every(check_every, 10),
        criterion=criterion, grid_ndim=2, batched=False,
    )
    return res._replace(x=s * res.x)


def _dmg_pallas_auto(shape, precond_f32, nu):
    """Default cycle-kernel selection for the f32 preconditioner on TPU:
    whole-VMEM kernel when the pyramid fits, row-tiled streaming kernel
    beyond (mirrors multigrid._pallas_auto)."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or not precond_f32 or nu > 4:
        return False
    from ..ops.kernels.vcycle_vmem import vcycle_fits_vmem

    ny, nx = shape[-2], shape[-1]
    return True if vcycle_fits_vmem(ny + ny % 2, nx + nx % 2) else "tiled"


def _space_or_empty(defl, shape, dtype):
    if defl is None:
        return (jnp.full(shape, -1, jnp.int32), jnp.zeros((0, 0), dtype),
                jnp.zeros((0,), dtype), 0)
    return defl.labels, defl.e_hat_inv, defl.dhalf_inv, defl.m


def solve_dmg(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-10,
              max_iter: int = 2_000, check_every: int = 0,
              criterion: str = "relresidual",
              member: Optional[np.ndarray] = None,
              defl: Optional[DeflationSpace] = None,
              precond_f32: bool = True, use_pallas=None,
              pallas_interpret: bool = False, **mg) -> SolveResult:
    """Deflated multigrid-PCG (A-DEF2), single image, f64 in/out.

    ``criterion="residual"/"relresidual"`` are measured on the equilibrated
    system (scale-free by construction); ``"deff"`` applies the reference's
    percent-change rule on the recovered field.  MG knobs
    (``nu/mg_omega/coarse_iters/min_size/over``) pass through;
    ``precond_f32=False`` forces the V-cycle to f64 (no measured benefit).
    ``use_pallas``: None = auto on TPU (whole-VMEM fused cycle when the f32
    pyramid fits, the row-tiled streaming cycle beyond — the shipped
    2007x1002 demo case); True/False/"tiled" force.  ``omega`` is signature
    parity.
    """
    if x0.dtype != jnp.float64:
        raise ValueError("solve_dmg needs f64 inputs (jax_enable_x64; "
                         "set Dtype: float64)")
    if defl is None and member is not None:
        defl = build_component_deflation(coeffs, member)
    labels, e_hat_inv, dhalf_inv, m = _space_or_empty(defl, x0.shape, x0.dtype)
    mg_kw = _mg_kw(mg)
    if use_pallas is None:
        use_pallas = _dmg_pallas_auto(x0.shape, precond_f32, mg_kw["nu"])
    return _solve_dmg_jit(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv,
                          omega=omega, tol=tol, max_iter=max_iter,
                          check_every=check_every, criterion=criterion, m=m,
                          precond_f32=precond_f32, use_pallas=use_pallas,
                          pallas_interpret=pallas_interpret, **mg_kw)


def solve_dmg_batched(coeffs, spec, x0, *, omega: float = 0.0,
                      tol: float = 1e-10, max_iter: int = 2_000,
                      check_every: int = 0, criterion: str = "relresidual",
                      members: Optional[np.ndarray] = None,
                      defls: Optional[list] = None,
                      precond_f32: bool = True, **mg) -> SolveResult:
    """Batched deflated MGCG: per-image deflation spaces zero-padded to the
    batch-wide maximum component count, one vmapped solve (JAX's while_loop
    batching masks each image's carry by its own stopping predicate, so
    results match solo runs at the same check schedule)."""
    if x0.dtype != jnp.float64:
        raise ValueError("solve_dmg_batched needs f64 inputs "
                         "(jax_enable_x64; set Dtype: float64)")
    bsz = x0.shape[0]
    if defls is None:
        defls = [
            build_component_deflation(
                jax.tree.map(lambda a, k=k: a[k], coeffs),
                np.asarray(members[k]))
            for k in range(bsz)
        ] if members is not None else [None] * bsz
    m_max = max((d.m for d in defls if d is not None), default=0)

    if m_max == 0:
        labels = jnp.full(x0.shape, -1, jnp.int32)
        e_hat_inv = jnp.zeros((bsz, 0, 0), x0.dtype)
        dhalf_inv = jnp.zeros((bsz, 0), x0.dtype)
    else:
        np_dtype = np.dtype(str(x0.dtype))
        padded = [_pad_deflation(d, x0.shape[1:], np_dtype, m_max)
                  for d in defls]
        labels = jnp.asarray(np.stack([p[0] for p in padded]))
        e_hat_inv = jnp.asarray(np.stack([p[1] for p in padded]))
        dhalf_inv = jnp.asarray(np.stack([p[2] for p in padded]))

    solve_one = functools.partial(
        _solve_dmg_jit, omega=omega, tol=tol, max_iter=max_iter,
        check_every=check_every, criterion=criterion, m=m_max,
        precond_f32=precond_f32, **_mg_kw(mg))
    return jax.vmap(solve_one)(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv)


def solve_dmg_refined(coeffs, spec, x0, *, tol: float = 1e-12,
                      max_outers: int = 12, inner_iters: int = 120,
                      inner_tol: float = 1e-4, check_every: int = 0,
                      member: Optional[np.ndarray] = None,
                      defl: Optional[DeflationSpace] = None,
                      precond_f32: bool = True, use_pallas=None,
                      pallas_interpret: bool = False, **mg) -> SolveResult:
    """Correction-form refinement around ``solve_dmg`` — the deepest-accuracy
    driver for extreme-contrast single images.

    Iterating PCG on x directly floors at the classical f64 attainable
    accuracy, eps·||A'||·||x'|| (measured on the 2007x1002 demo: relres
    plateau ~6e-11, with the plateau residual sitting entirely on
    gas-interior faces as ~2e-12 x-jitter; neither an f64 V-cycle, the
    factored coarse solve, nor longer unrestarted Krylov chains moved it).
    Refinement solves the CORRECTION system A d = r from a zero guess each
    outer — the attainable accuracy then scales with ||d||, which shrinks
    with every outer, so the true residual keeps contracting to the
    representation floor.  Host-level outer loop doubles as relay-safe
    segmentation (each inner solve is a bounded device program).

    ``iters`` in the result counts TOTAL inner iterations; ``conv`` is the
    true f64 relative residual of the accumulated solution.
    """
    if defl is None and member is not None:
        defl = build_component_deflation(coeffs, member)
    bmean = jnp.mean(jnp.abs(coeffs.b))
    x = x0
    total = 0
    rel = float(jnp.mean(jnp.abs(coeffs.b - fvm.apply_operator(coeffs, x)))
                / bmean)
    deff = None
    for _ in range(max_outers):
        if rel <= tol:
            break
        r = coeffs.b - fvm.apply_operator(coeffs, x)
        c_corr = coeffs._replace(b=r)
        res = solve_dmg(c_corr, spec, jnp.zeros_like(x), tol=inner_tol,
                        max_iter=inner_iters, check_every=check_every,
                        criterion="relresidual", defl=defl,
                        precond_f32=precond_f32, use_pallas=use_pallas,
                        pallas_interpret=pallas_interpret, **mg)
        x = x + res.x
        total += int(res.iters)
        rel = float(jnp.mean(jnp.abs(coeffs.b - fvm.apply_operator(coeffs, x)))
                    / bmean)
    from ..ops.flux import boundary_deff as _bd

    return SolveResult(x=x, deff=_bd(spec, x), conv=jnp.asarray(rel),
                       iters=jnp.asarray(total, jnp.int32))

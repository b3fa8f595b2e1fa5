"""Jacobi-preconditioned conjugate gradients (BASELINE.json config 3).

Matrix-free PCG on the structured 5-point operator: the matvec is
:func:`~..ops.fvm.apply_operator` (one fused HBM pass over the coefficient
planes), the preconditioner is the reciprocal diagonal already carried in
:class:`StencilCoeffs`, and the dot products are on-device reductions — the
whole iteration lives in one ``lax.while_loop`` like the sweep solvers.

This is the tight-tolerance solver: weighted Jacobi needs O(n^2) sweeps and
stalls near machine precision on high-contrast media, while PCG reaches 1e-8
residuals in O(sqrt(kappa)) iterations.  The reference has no Krylov solver;
this is a capability extension motivated by its own dead-code ``Residual``
convergence monitor (Deff2D.cuh:451-494).

Notes:
  * CG requires symmetry.  3-phase masked systems must be assembled with
    ``fvm_coefficients(..., symmetric=True)`` (identical exact solution; see
    that docstring).  The plain 2-phase assembly is symmetric already.
  * The true residual ``r = b - A x`` is recomputed at every convergence
    check, killing the recurrence drift that otherwise limits fp32 accuracy.
  * Stopping mirrors the framework-wide semantics: checks at iteration
    indices 0, N, 2N, ...; ``criterion="residual"`` stops on
    ``mean(|r|) < tol`` (same metric as ``fvm.residual``),
    ``criterion="deff"`` on the reference's Deff percent-change rule.
    For CG a much smaller ``check_every`` (e.g. 25) than the sweep solvers'
    10,000 is appropriate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from .driver import SolveResult

__all__ = ["solve_cg", "solve_cg_batched"]


def _dot(a, b):
    return jnp.sum(a * b, axis=(-2, -1))


def _mean_abs(a):
    return jnp.mean(jnp.abs(a), axis=(-2, -1))


def _cg_core(coeffs, spec, x0, *, tol, max_iter, check_every, criterion, batched):
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    bshape = x0.shape[:-2]          # () or (B,)

    def expand(v):
        # broadcast per-image scalars over the trailing grid dims
        return v[..., None, None] if batched else v

    def matvec(p):
        return fvm.apply_operator(coeffs, p)

    minv = coeffs.diag_inv

    def fresh(x):
        r = coeffs.b - matvec(x)
        z = minv * r
        return r, z, _dot(r, z)

    def cg_iter(x, r, z, p, rz, active):
        ap = matvec(p)
        pap = _dot(p, ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        a_e = expand(jnp.where(active, alpha, 0.0) if batched else alpha)
        x = x + a_e * p
        r = r - a_e * ap
        z_new = minv * r
        rz_new = _dot(r, z_new)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z_new + expand(beta) * p
        return x, r, z_new, p, rz_new

    def cond(c):
        x, r, z, p, rz, it, deff, deff_old, pc, conv, iters = c
        alive = tol_ < jnp.abs(pc)
        if batched:
            return jnp.any(alive & (it < max_iter)) & (it < max_iter)
        return (it < max_iter) & alive

    def body(c):
        x, r, z, p, rz, it, deff, deff_old, pc, conv, iters = c
        active = (tol_ < jnp.abs(pc)) if batched else None
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))

        def one(_, s):
            xs, rs, zs, ps, rzs = s
            if batched:
                xn, rn, zn, pn, rzn = cg_iter(xs, rs, zs, ps, rzs, active)
                keep = expand(active)
                xn = jnp.where(keep, xn, xs)
                rn = jnp.where(keep, rn, rs)
                zn = jnp.where(keep, zn, zs)
                pn = jnp.where(keep, pn, ps)
                rzn = jnp.where(active, rzn, rzs)
                return (xn, rn, zn, pn, rzn)
            return cg_iter(xs, rs, zs, ps, rzs, None)

        x, r, z, p, rz = jax.lax.fori_loop(0, k, one, (x, r, z, p, rz))
        it_new = it + k
        if batched:
            iters = iters + jnp.where(active, k, 0)
        else:
            iters = it_new
        do_check = ((it_new - 1) % check_every) == 0

        # true residual refresh at checks (and restart the recurrence on it)
        r_true, z_true, rz_true = fresh(x)
        refresh = do_check if not batched else expand(do_check & active)
        r = jnp.where(refresh, r_true, r)
        z = jnp.where(refresh, z_true, z)
        p = jnp.where(refresh, z_true, p)
        rz = jnp.where(do_check & active if batched else do_check, rz_true, rz)

        deff_new = boundary_deff(spec, x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        else:
            pc_new = _mean_abs(r_true)

        upd = (do_check & active) if batched else do_check
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        conv = jnp.where(upd, pc_new, conv)
        return (x, r, z, p, rz, it_new, deff, deff_old, pc, conv, iters)

    r0, z0, rz0 = fresh(x0)
    scal = (lambda v: jnp.full(bshape, v, dtype)) if batched else (lambda v: jnp.asarray(v, dtype))
    it0 = jnp.asarray(0, jnp.int32)
    iters0 = jnp.zeros(bshape, jnp.int32) if batched else it0
    init = (x0, r0, z0, r0 * 0 + z0, rz0, it0,
            scal(1.0), scal(5.0), scal(100.0), scal(100.0), iters0)
    out = jax.lax.while_loop(cond, body, init)
    x, _, _, _, _, it, deff, _, _, conv, iters = out
    return SolveResult(x=x, deff=deff, conv=conv, iters=iters)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
             max_iter: int = 100_000, check_every: int = 10_000,
             criterion: str = "residual") -> SolveResult:
    """PCG solve of one image.  ``omega`` is accepted for signature parity
    with the sweep solvers and ignored."""
    return _cg_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                    check_every=min(check_every, 100), criterion=criterion,
                    batched=False)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg_batched(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                     max_iter: int = 100_000, check_every: int = 10_000,
                     criterion: str = "residual") -> SolveResult:
    """Batched PCG with per-image freezing (same semantics as the batched
    sweep drivers)."""
    return _cg_core(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                    check_every=min(check_every, 100), criterion=criterion,
                    batched=True)

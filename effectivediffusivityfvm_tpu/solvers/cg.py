"""Jacobi-preconditioned conjugate gradients (BASELINE.json config 3).

Matrix-free PCG on the structured 5-point operator: the matvec is
:func:`~..ops.fvm.apply_operator` (one fused HBM pass over the coefficient
planes), the preconditioner is the reciprocal diagonal already carried in
:class:`StencilCoeffs`, and the dot products are on-device reductions — the
whole iteration lives in one ``lax.while_loop`` (see solvers/pcg.py for the
shared engine and its stopping semantics).

This is the tight-tolerance workhorse the reference lacks (its only solver is
weighted Jacobi, nursed through high contrast by homotopy); for large or
high-contrast media prefer ``mgcg`` (solvers/multigrid.py), which wraps the
same engine with a V-cycle preconditioner.

CG requires symmetry: 3-phase masked systems must be assembled with
``fvm_coefficients(..., symmetric=True)`` (identical exact solution — see
that docstring); plain 2-phase assembly is symmetric already.
"""

from __future__ import annotations

import functools

import jax

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from .driver import SolveResult, resolve_check_every
from .pcg import run_pcg

__all__ = ["solve_cg", "solve_cg_batched"]


def _run(coeffs, spec, x0, batched, *, tol, max_iter, check_every, criterion):
    check_every = resolve_check_every(check_every, 100)
    return run_pcg(
        matvec=lambda p: fvm.apply_operator(coeffs, p),
        precond=lambda r: coeffs.diag_inv * r,
        b=coeffs.b,
        x0=x0,
        deff_fn=lambda x: boundary_deff(spec, x),
        tol=tol, max_iter=max_iter, check_every=check_every,
        criterion=criterion, grid_ndim=2, batched=batched,
    )


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
             max_iter: int = 100_000, check_every: int = 0,
             criterion: str = "residual") -> SolveResult:
    """PCG solve of one image.  ``omega`` is accepted for signature parity
    with the sweep solvers and ignored."""
    return _run(coeffs, spec, x0, False, tol=tol, max_iter=max_iter,
                check_every=check_every, criterion=criterion)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_cg_batched(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                     max_iter: int = 100_000, check_every: int = 0,
                     criterion: str = "residual") -> SolveResult:
    """Batched PCG with per-image freezing (same semantics as the batched
    sweep drivers)."""
    return _run(coeffs, spec, x0, True, tol=tol, max_iter=max_iter,
                check_every=check_every, criterion=criterion)

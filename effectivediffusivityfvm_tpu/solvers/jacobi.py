"""Weighted-Jacobi solve drivers (single-image and vmapped-batch).

TPU-native re-design of the reference host drivers ``JacobiGPU``
(Deff2D.cuh:1163-1314) and ``JacobiGPUPreCond`` (Deff2D.cuh:1024-1160): the
whole iteration runs inside one ``lax.while_loop`` under ``jit`` — no
per-sweep host synchronization (the reference calls
``cudaDeviceSynchronize`` + a D2D ping-pong copy every iteration,
Deff2D.cuh:1239/1281) and no D2H copies for the convergence monitor
(Deff2D.cuh:1243-1264).  Stopping semantics are reference-exact; see
``solvers/driver.py``.

The sweep itself is the reference's hot kernel ``updateX_SOR``
(Deff2D.cuh:69-92 — weighted Jacobi despite the name) expressed as fused
whole-array arithmetic; XLA emits a single bandwidth-bound loop over the
five coefficient planes.
"""

from __future__ import annotations

import functools

import jax

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec
from . import driver
from .driver import SolveResult

__all__ = ["SolveResult", "solve_jacobi", "solve_jacobi_batched"]


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi(
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    *,
    omega: float = 2.0 / 3.0,
    tol: float = 1e-5,
    max_iter: int = 500_000,
    check_every: int = 0,
    criterion: str = "deff",
    it0: int = 0,
    deff0: float = 1.0,
    deff_old0: float = 5.0,
) -> SolveResult:
    """Solve one image to the reference stopping rule; fully on-device.

    ``it0``/``deff0``/``deff_old0``: protocol carry for segmented solves
    (see driver.run_single) — defaults reproduce the reference's fresh-start
    init (Deff2D.cuh:1171-1173)."""
    omega = omega or 2.0 / 3.0
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_single(
        lambda x: fvm.jacobi_sweep(coeffs, x, omega),
        coeffs, spec, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        it0=it0, deff0=deff0, deff_old0=deff_old0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi_batched(
    coeffs: fvm.StencilCoeffs,       # arrays (B, ny, nx)
    spec: BoundaryFluxSpec,          # arrays (B, ny)
    x0: jax.Array,                   # (B, ny, nx)
    *,
    omega: float = 2.0 / 3.0,
    tol: float = 1e-5,
    max_iter: int = 500_000,
    check_every: int = 0,
    criterion: str = "deff",
    it0: int = 0,
    deff0: float = 1.0,
    deff_old0: float = 5.0,
) -> SolveResult:
    """Batched solve with per-image convergence (the ML-datagen mode).

    The reference processes batch images serially (BatchSim while-loop,
    Deff2D.cuh:1867); here the whole batch advances in one fused sweep and
    each image freezes at exactly the sweep count where the serial reference
    would have stopped it.
    """
    omega = omega or 2.0 / 3.0
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_batched(
        lambda x: fvm.jacobi_sweep(coeffs, x, omega),
        coeffs, spec, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
        it0=it0, deff0=deff0, deff_old0=deff_old0,
    )

"""Red-black SOR solver (BASELINE.json config 2).

True successive over-relaxation via two-color Gauss-Seidel: cells are colored
by (i+j) parity; the red half-sweep uses the current black values, the black
half-sweep the freshly updated reds.  Unlike the reference's "SOR" kernel
(which is weighted Jacobi — it reads only the old vector, Deff2D.cuh:69-92),
this is genuine GS/SOR and converges ~2x faster per sweep at the same
bandwidth; with a tuned ``omega`` in (1, 2) it is asymptotically far faster
(O(n) vs O(n^2) sweeps for grid diameter n).

``omega_opt`` estimates the optimal relaxation factor from the Jacobi
spectral radius of the Laplace problem on the same grid — a good default for
moderate-contrast media; heterogeneous extreme-contrast media may need a
slightly smaller value.

Array form: both half-sweeps compute a full-grid Jacobi-style update and
keep only their color (2x the FLOPs of a pointwise GS, but identical HBM
traffic, which is what TPU sweeps are bound by; the VPU eats the extra
arithmetic).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec
from . import driver
from .driver import SolveResult

__all__ = ["solve_rbsor", "solve_rbsor_batched", "rb_sweep", "omega_opt"]


def omega_opt(ny: int, nx: int) -> float:
    """SOR-optimal relaxation for the Laplace model problem on (ny, nx):
    ``2 / (1 + sqrt(1 - rho_J^2))`` with ``rho_J = cos(pi/n)``, n the larger
    grid dimension."""
    rho = math.cos(math.pi / max(ny, nx, 2))
    return 2.0 / (1.0 + math.sqrt(1.0 - rho * rho))


def _color_masks(shape, dtype):
    ny, nx = shape[-2], shape[-1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    red = ((ii + jj) % 2) == 0
    return red


def rb_sweep(coeffs: fvm.StencilCoeffs, x: jax.Array, omega: float) -> jax.Array:
    """One full red-black SOR sweep (red half then black half)."""
    red = _color_masks(x.shape, x.dtype)

    def half(xc, mask):
        gs = (coeffs.b + fvm.neighbor_sum(coeffs, xc)) * coeffs.diag_inv
        upd = xc + omega * (gs - xc)
        return jnp.where(mask, upd, xc)

    x = half(x, red)
    return half(x, ~red)


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_rbsor(
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    *,
    omega: float = 0.0,          # 0 or None -> auto (omega_opt of the grid)
    tol: float = 1e-5,
    max_iter: int = 500_000,
    check_every: int = 0,
    criterion: str = "deff",
) -> SolveResult:
    if not omega:
        omega = omega_opt(x0.shape[-2], x0.shape[-1])
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_single(
        lambda x: rb_sweep(coeffs, x, omega),
        coeffs, spec, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
    )


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_rbsor_batched(
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    *,
    omega: float = 0.0,
    tol: float = 1e-5,
    max_iter: int = 500_000,
    check_every: int = 0,
    criterion: str = "deff",
) -> SolveResult:
    if not omega:
        omega = omega_opt(x0.shape[-2], x0.shape[-1])
    check_every = driver.resolve_check_every(check_every, 10_000)
    return driver.run_batched(
        lambda x: rb_sweep(coeffs, x, omega),
        coeffs, spec, x0,
        tol=tol, max_iter=max_iter, check_every=check_every, criterion=criterion,
    )

"""Weighted-Jacobi solve drivers (single-image and vmapped-batch).

TPU-native re-design of the reference host drivers ``JacobiGPU``
(Deff2D.cuh:1163-1314) and ``JacobiGPUPreCond`` (Deff2D.cuh:1024-1160):

* the whole iteration runs inside one ``lax.while_loop`` under ``jit`` — no
  per-sweep host synchronization (the reference calls
  ``cudaDeviceSynchronize`` + a D2D ping-pong copy every iteration,
  Deff2D.cuh:1239/1281);
* the Deff convergence monitor is an on-device reduction inside the loop
  carry (the reference D2H-copies the field every 10,000 iterations and
  reduces on the CPU, Deff2D.cuh:1243-1264);
* ping-ponging is value semantics — XLA double-buffers automatically.

Stopping semantics reproduce the reference exactly:
  - sweeps are indexed 0,1,2,...; a convergence check runs on every sweep
    whose index is a multiple of ``check_every`` (reference
    ``iterCount % iterToCheck == 0``, Deff2D.cuh:1243 — i.e. after sweeps
    1, 10001, 20001, ... have run);
  - ``deff_old`` starts at 5.0 and ``deff`` at 1.0, ``percent_change`` at
    100.0 (Deff2D.cuh:1171-1173);
  - ``percent_change = (deff_old - deff_new) / deff_old`` (Deff2D.cuh:1265);
  - loop continues while ``iter < max_iter and tol < |percent_change|``
    (Deff2D.cuh:1232);
  - ``conv`` reported is the last computed ``percent_change``
    (Deff2D.cuh:1275), ``deff`` the last checked value (not normalized; the
    pipeline divides by DCF, Deff2D.cuh:1802/1601).

The optional ``criterion="residual"`` mode instead stops on the mean absolute
flux imbalance (the reference's principled-but-dead ``Residual``,
Deff2D.cuh:451-494) dropping below ``tol``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff

__all__ = ["SolveResult", "solve_jacobi", "solve_jacobi_batched"]


class SolveResult(NamedTuple):
    x: jax.Array        # final concentration field(s)
    deff: jax.Array     # Deff at the last convergence check (raw, unnormalized)
    conv: jax.Array     # last percent-change (or residual) observed
    iters: jax.Array    # sweeps executed (per image in batched mode)


def _criterion_value(criterion, coeffs, spec, x):
    if criterion == "deff":
        return boundary_deff(spec, x)
    return fvm.residual(coeffs, x)


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
    check_every: int = 10_000,
    criterion: str = "deff",
) -> SolveResult:
    """Solve one image to the reference stopping rule; fully on-device."""
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)

    def sweep_n(x, k):
        return jax.lax.fori_loop(
            0, k, lambda _, xc: fvm.jacobi_sweep(coeffs, xc, omega), x
        )

    def cond(c):
        x, it, deff, deff_old, pc, conv = c
        return (it < max_iter) & (tol_ < jnp.abs(pc))

    def body(c):
        x, it, deff, deff_old, pc, conv = c
        # Chunk of sweeps ending on a check-aligned sweep index: the first
        # chunk is the single sweep at index 0 (which the reference checks),
        # later chunks are `check_every` sweeps (possibly truncated at
        # max_iter, in which case no check runs — same as the reference).
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))
        x = sweep_n(x, k)
        it_new = it + k
        do_check = ((it_new - 1) % check_every) == 0

        if criterion == "deff":
            val = boundary_deff(spec, x)
            pc_new = (deff_old - val) / deff_old
        else:
            val = fvm.residual(coeffs, x)
            pc_new = val  # stop on |residual| < tol

        deff_new = boundary_deff(spec, x) if criterion != "deff" else val
        deff = jnp.where(do_check, deff_new, deff)
        deff_old = jnp.where(do_check & (criterion == "deff"), val, deff_old)
        pc = jnp.where(do_check, pc_new, pc)
        conv = jnp.where(do_check, pc_new, conv)
        return (x, it_new, deff, deff_old, pc, conv)

    init = (
        x0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(1.0, dtype),    # deffNew init (Deff2D.cuh:1171)
        jnp.asarray(5.0, dtype),    # deffOld init (Deff2D.cuh:1172)
        jnp.asarray(100.0, dtype),  # percentChange init (Deff2D.cuh:1173)
        jnp.asarray(100.0, dtype),
    )
    x, it, deff, _, _, conv = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=x, deff=deff, conv=conv, iters=it)


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
    check_every: int = 10_000,
    criterion: str = "deff",
) -> SolveResult:
    """Batched solve with per-image convergence (the ML-datagen mode).

    The reference processes batch images serially (BatchSim while-loop,
    Deff2D.cuh:1867); here the whole batch advances in one fused sweep and
    each image freezes at exactly the sweep count where the serial reference
    would have stopped it (updates are masked out once an image's
    percent-change criterion is met, so its final field, Deff, and conv are
    bit-identical to a solo run at the same sweep schedule).
    """
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    bsz = x0.shape[0]

    def active_of(pc, it):
        return (tol_ < jnp.abs(pc)) & (it < max_iter)

    def cond(c):
        x, it, deff, deff_old, pc, conv, iters = c
        return jnp.any(active_of(pc, it)) & (it < max_iter)

    def body(c):
        x, it, deff, deff_old, pc, conv, iters = c
        active = active_of(pc, it)
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))

        def one(_, xc):
            xn = fvm.jacobi_sweep(coeffs, xc, omega)
            return jnp.where(active[:, None, None], xn, xc)

        x = jax.lax.fori_loop(0, k, one, x)
        it_new = it + k
        iters = iters + jnp.where(active, k, 0)
        do_check = ((it_new - 1) % check_every) == 0

        if criterion == "deff":
            val = boundary_deff(spec, x)           # (B,)
            pc_new = (deff_old - val) / deff_old
        else:
            val = fvm.residual(coeffs, x)
            pc_new = val

        deff_new = boundary_deff(spec, x) if criterion != "deff" else val
        upd = do_check & active
        deff = jnp.where(upd, deff_new, deff)
        deff_old = jnp.where(upd & (criterion == "deff"), val, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        conv = jnp.where(upd, pc_new, conv)
        return (x, it_new, deff, deff_old, pc, conv, iters)

    init = (
        x0,
        jnp.asarray(0, jnp.int32),
        jnp.full((bsz,), 1.0, dtype),
        jnp.full((bsz,), 5.0, dtype),
        jnp.full((bsz,), 100.0, dtype),
        jnp.full((bsz,), 100.0, dtype),
        jnp.zeros((bsz,), jnp.int32),
    )
    x, _, deff, _, _, conv, iters = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=x, deff=deff, conv=conv, iters=iters)

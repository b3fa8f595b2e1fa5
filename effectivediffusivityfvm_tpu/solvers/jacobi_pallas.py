"""Jacobi solver driven through the fused VMEM Pallas kernel.

Same reference-exact stopping semantics as ``solve_jacobi`` (see
solvers/driver.py), but each check-aligned chunk of sweeps executes as ONE
``pallas_call`` that keeps the image and all coefficient planes VMEM-resident
(ops/kernels/jacobi_vmem.py) — HBM traffic per chunk drops from
8 planes x chunk_sweeps to ~9 planes total.

Falls back to interpreter mode automatically off-TPU (CPU tests), so results
are platform-independent; the batched variant preserves per-image freezing by
masking the chunk output (a frozen image's chunk is computed and discarded —
acceptable: chunks are bandwidth-, not compute-, bound and freezing exists
for semantics, not speed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from .driver import SolveResult

__all__ = ["solve_jacobi_pallas", "solve_jacobi_pallas_batched"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi_pallas(coeffs, spec, x0, *, omega: float = 2.0 / 3.0,
                        tol: float = 1e-5, max_iter: int = 500_000,
                        check_every: int = 0,
                        criterion: str = "deff") -> SolveResult:
    omega = omega or 2.0 / 3.0
    batched_coeffs = jax.tree.map(lambda a: a[None], coeffs)
    res = solve_jacobi_pallas_batched(
        batched_coeffs,
        jax.tree.map(lambda a: jnp.asarray(a)[None], spec),
        x0[None],
        omega=omega, tol=tol, max_iter=max_iter,
        check_every=check_every, criterion=criterion)
    return SolveResult(x=res.x[0], deff=res.deff[0], conv=res.conv[0],
                       iters=res.iters[0])


@functools.partial(
    jax.jit, static_argnames=("omega", "tol", "max_iter", "check_every", "criterion"),
)
def solve_jacobi_pallas_batched(coeffs, spec, x0, *, omega: float = 2.0 / 3.0,
                                tol: float = 1e-5, max_iter: int = 500_000,
                                check_every: int = 0,
                                criterion: str = "deff") -> SolveResult:
    from ..ops.kernels.jacobi_vmem import jacobi_fits_vmem, jacobi_sweeps_pallas

    if criterion not in ("deff", "residual", "relresidual"):
        raise ValueError(f"unknown criterion {criterion!r}")
    if not jacobi_fits_vmem(x0.shape[-2], x0.shape[-1]):
        # size guard (round-1 verdict #3c): images beyond the VMEM budget
        # fall back to the fused XLA sweep instead of failing to compile
        from .jacobi import solve_jacobi_batched

        return solve_jacobi_batched(coeffs, spec, x0, omega=omega, tol=tol,
                                    max_iter=max_iter, check_every=check_every,
                                    criterion=criterion)
    from .driver import resolve_check_every
    check_every = resolve_check_every(check_every, 10_000)
    omega = omega or 2.0 / 3.0
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    bsz = x0.shape[0]
    interp = _interpret()
    bscale = (jnp.mean(jnp.abs(coeffs.b), axis=(1, 2))
              if criterion == "relresidual" else None)

    def active_of(pc, it):
        return (tol_ < jnp.abs(pc)) & (it < max_iter)

    def cond(c):
        x, it, deff, deff_old, pc, conv, iters = c
        return jnp.any(active_of(pc, it)) & (it < max_iter)

    def body(c):
        x, it, deff, deff_old, pc, conv, iters = c
        active = active_of(pc, it)
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))
        x_new = jacobi_sweeps_pallas(coeffs, x, k, omega=omega, interpret=interp)
        x = jnp.where(active[:, None, None], x_new, x)
        it_new = it + k
        iters = iters + jnp.where(active, k, 0)
        do_check = ((it_new - 1) % check_every) == 0

        deff_new = boundary_deff(spec, x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = fvm.residual(coeffs, x) / bscale
        else:
            pc_new = fvm.residual(coeffs, x)

        upd = do_check & active
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
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

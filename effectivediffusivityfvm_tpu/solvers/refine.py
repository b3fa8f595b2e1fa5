"""Mixed-precision iterative refinement: f64 residuals, f32 inner solves.

The hard part flagged in SURVEY.md §7: extreme diffusivity contrasts (the
shipped input.txt runs Dg = 1,237,500) defeat fp32 Krylov solvers outright —
measured on the bundled 00042.jpg, raw fp32 CG cannot reduce the relative
residual below 2.4e0, and even with symmetric equilibration it floors at
~2e-4 while the Deff functional needs ~1e-8 (the physical flux is ~6e-6 of
the gas-phase coefficient scale).  Full f64 works but costs emulated-f64
bandwidth everywhere.

Iterative refinement gets f64-quality answers with the hot loop in f32:

  x_64 ∈ f64
  repeat:
    r_64 = b_64 - A_64 x_64                  (one f64 matvec per outer)
    if mean|r_64| / mean|b_64| < tol: stop
    r_hat = (r_64 / s)  cast to f32          (s = max|r_64|: O(1) RHS)
    solve  A_32' delta = r_hat'  in f32      (equilibrated inner CG)
    x_64 += s * delta_64

Each outer multiplies the true residual by the inner's achieved reduction
(~1e-3..2e-4 here), so 2-4 outers reach 1e-8 relative — the f32
representation error of A only bounds the per-outer factor, not the final
accuracy, because the outer residual is exact in f64.

Requires f64 inputs (enable ``jax_enable_x64``; the pipeline builds f64
fields when ``solver="cgir"``).  Registered as solver name ``cgir``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from .driver import SolveResult
from .pcg import run_pcg

__all__ = ["solve_cgir", "solve_cgir_batched"]


def _mean_abs(a):
    return jnp.mean(jnp.abs(a), axis=(-2, -1))


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "inner_iters", "inner_tol"),
)
def solve_cgir(
    coeffs: fvm.StencilCoeffs,       # f64
    spec: BoundaryFluxSpec,
    x0: jax.Array,                   # f64
    *,
    omega: float = 0.0,              # signature parity; unused
    tol: float = 1e-8,               # outer relative-residual target
    max_iter: int = 8,               # outer refinement steps
    check_every: int = 0,            # signature parity; unused
    criterion: str = "relresidual",  # outer criterion is always relresidual
    inner_iters: int = 8_000,
    inner_tol: float = 1e-6,
) -> SolveResult:
    """Iteratively refined CG solve of one image (single-image, f64 in/out)."""
    if x0.dtype != jnp.float64:
        raise ValueError("solve_cgir needs f64 inputs (jax_enable_x64)")

    # f32 equilibrated inner operator (built once)
    c32 = jax.tree.map(lambda a: a.astype(jnp.float32), coeffs)
    c32_eq, s_eq = fvm.equilibrate(c32)
    bscale64 = _mean_abs(coeffs.b)

    def inner_solve(rhat32):
        # solve A' y = S rhat, delta = S y, from zero initial guess
        b_eq = rhat32 * s_eq
        zero = jnp.zeros_like(rhat32)
        res = run_pcg(
            matvec=lambda p: fvm.apply_operator(c32_eq, p),
            precond=lambda r: r,
            b=b_eq, x0=zero,
            deff_fn=lambda y: _mean_abs(y),   # placeholder monitor (unused)
            tol=inner_tol, max_iter=inner_iters, check_every=100,
            criterion="relresidual", grid_ndim=2, batched=False,
        )
        return res.x * s_eq

    def cond(c):
        x, it, rel = c
        return (it < max_iter) & (rel > tol)

    def body(c):
        x, it, rel = c
        r64 = coeffs.b - fvm.apply_operator(coeffs, x)
        scale = jnp.max(jnp.abs(r64))
        safe = jnp.where(scale > 0, scale, 1.0)
        rhat32 = (r64 / safe).astype(jnp.float32)
        delta = inner_solve(rhat32).astype(jnp.float64)
        x = x + safe * delta
        rel_new = _mean_abs(coeffs.b - fvm.apply_operator(coeffs, x)) / bscale64
        return (x, it + 1, rel_new)

    rel0 = _mean_abs(coeffs.b - fvm.apply_operator(coeffs, x0)) / bscale64
    x, outers, rel = jax.lax.while_loop(cond, body, (x0, jnp.int32(0), rel0))
    return SolveResult(x=x, deff=boundary_deff(spec, x), conv=rel, iters=outers)


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "inner_iters", "inner_tol"),
)
def solve_cgir_batched(
    coeffs: fvm.StencilCoeffs,       # f64, arrays (B, ny, nx)
    spec: BoundaryFluxSpec,
    x0: jax.Array,                   # (B, ny, nx) f64
    *,
    omega: float = 0.0,              # signature parity; unused
    tol: float = 1e-8,
    max_iter: int = 8,               # outer refinement steps
    check_every: int = 0,            # signature parity; unused
    criterion: str = "relresidual",  # outer criterion is always relresidual
    inner_iters: int = 8_000,
    inner_tol: float = 1e-6,
) -> SolveResult:
    """Batched iterative refinement: the whole image stack shares each outer
    step (one fused f64 matvec + one batched f32 inner PCG with per-image
    freezing); converged images stop updating (masked outer correction).

    All helper ops (equilibrate, apply_operator, run_pcg) operate on the
    trailing two dims, so the structure mirrors :func:`solve_cgir` with
    per-image scales.
    """
    if x0.dtype != jnp.float64:
        raise ValueError("solve_cgir_batched needs f64 inputs (jax_enable_x64)")

    c32 = jax.tree.map(lambda a: a.astype(jnp.float32), coeffs)
    c32_eq, s_eq = fvm.equilibrate(c32)
    bscale64 = _mean_abs(coeffs.b)                  # (B,)

    def inner_solve(rhat32):
        b_eq = rhat32 * s_eq
        zero = jnp.zeros_like(rhat32)
        res = run_pcg(
            matvec=lambda p: fvm.apply_operator(c32_eq, p),
            precond=lambda r: r,
            b=b_eq, x0=zero,
            deff_fn=lambda y: _mean_abs(y),         # placeholder monitor (unused)
            tol=inner_tol, max_iter=inner_iters, check_every=100,
            criterion="relresidual", grid_ndim=2, batched=True,
        )
        return res.x * s_eq

    def cond(c):
        x, it, rel, outers = c
        return (it < max_iter) & jnp.any(rel > tol)

    def body(c):
        x, it, rel, outers = c
        active = rel > tol                          # (B,)
        r64 = coeffs.b - fvm.apply_operator(coeffs, x)
        scale = jnp.max(jnp.abs(r64), axis=(-2, -1))
        safe = jnp.where(scale > 0, scale, 1.0)[:, None, None]
        rhat32 = (r64 / safe).astype(jnp.float32)
        delta = inner_solve(rhat32).astype(jnp.float64)
        x = jnp.where(active[:, None, None], x + safe * delta, x)
        rel_new = _mean_abs(coeffs.b - fvm.apply_operator(coeffs, x)) / bscale64
        rel = jnp.where(active, rel_new, rel)
        outers = outers + jnp.where(active, 1, 0)
        return (x, it + 1, rel, outers)

    rel0 = _mean_abs(coeffs.b - fvm.apply_operator(coeffs, x0)) / bscale64
    outers0 = jnp.zeros((x0.shape[0],), jnp.int32)
    x, _, rel, outers = jax.lax.while_loop(
        cond, body, (x0, jnp.int32(0), rel0, outers0))
    return SolveResult(x=x, deff=boundary_deff(spec, x), conv=rel, iters=outers)

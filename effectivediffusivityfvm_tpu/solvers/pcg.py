"""Generic preconditioned-CG engine shared by all Krylov solvers.

Parameterized over the matvec, the preconditioner application, the Deff
monitor, and the grid rank, so the same fused ``lax.while_loop`` core serves:
  * 2D diagonal-PCG           (solvers/cg.py)
  * 2D multigrid-PCG          (solvers/multigrid.py)
  * 3D diagonal-/multigrid-PCG (solvers/solvers3d.py)
  * sharded variants (monitors psum over the mesh; ``reduce_any_fn`` keeps
    batched trip counts globally uniform, see parallel/halo.py)

Semantics match the framework-wide driver (solvers/driver.py): chunked
checks at iteration indices 0, N, 2N, ...; ``criterion="residual"`` stops on
``mean(|r_true|) < tol`` with the true residual recomputed (and the
recurrence restarted on it) at every check, killing fp32 drift;
``criterion="deff"`` applies the reference's percent-change rule
(Deff2D.cuh:1265); ``criterion="relresidual"`` divides the mean residual by
``mean(|b|)``, making the tolerance scale-free (absolute tolerances are
unreachable in fp32 when the coefficients are O(1e6), e.g. the shipped
input.txt's Dg=1,237,500).  Batched mode freezes converged images.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .driver import SolveResult

__all__ = ["run_pcg"]


def run_pcg(
    matvec: Callable,
    precond: Callable,
    b: jax.Array,
    x0: jax.Array,
    deff_fn: Callable,
    *,
    tol: float,
    max_iter: int,
    check_every: int,
    criterion: str,
    grid_ndim: int,
    batched: bool,
    reduce_any_fn=None,
    mean_abs_fn=None,
    dot_fn=None,
) -> SolveResult:
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    axes = tuple(range(-grid_ndim, 0))
    reduce_any_fn = reduce_any_fn or jnp.any
    bshape = x0.shape[:-grid_ndim]

    def _dot(u, v):
        return dot_fn(u, v) if dot_fn else jnp.sum(u * v, axis=axes)

    def _mean_abs(u):
        return mean_abs_fn(u) if mean_abs_fn else jnp.mean(jnp.abs(u), axis=axes)

    def expand(v):
        return v.reshape(v.shape + (1,) * grid_ndim) if batched else v

    bscale = _mean_abs(b) if criterion == "relresidual" else None

    def fresh(x):
        r = b - matvec(x)
        z = precond(r)
        return r, z, _dot(r, z)

    def cg_iter(s, active):
        x, r, z, p, rz = s
        ap = matvec(p)
        pap = _dot(p, ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        if batched:
            alpha = jnp.where(active, alpha, 0.0)
        x = x + expand(alpha) * p
        r = r - expand(alpha) * ap
        z_new = precond(r)
        rz_new = _dot(r, z_new)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        if batched:
            beta = jnp.where(active, beta, 0.0)
            rz_new = jnp.where(active, rz_new, rz)
        p = z_new + expand(beta) * p
        return (x, r, z_new, p, rz_new)

    def cond(c):
        pc = c[8]
        it = c[5]
        alive = tol_ < jnp.abs(pc)
        if batched:
            return reduce_any_fn(alive) & (it < max_iter)
        return (it < max_iter) & alive

    def body(c):
        (x, r, z, p, rz, it, deff, deff_old, pc, conv, iters, x_best, best,
         bad) = c
        active = (tol_ < jnp.abs(pc)) if batched else None
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))
        x, r, z, p, rz = jax.lax.fori_loop(
            0, k, lambda _, s: cg_iter(s, active), (x, r, z, p, rz))
        it_new = it + k
        if batched:
            iters = iters + jnp.where(active, k, 0)
        else:
            iters = it_new
        do_check = ((it_new - 1) % check_every) == 0

        r_true, z_true, rz_true = fresh(x)
        refresh = expand(do_check & active) if batched else do_check
        r = jnp.where(refresh, r_true, r)
        z = jnp.where(refresh, z_true, z)
        p = jnp.where(refresh, z_true, p)
        rz = jnp.where((do_check & active) if batched else do_check, rz_true, rz)

        # Stagnation/divergence safety net: low-precision PCG that keeps
        # running below its rounding floor eventually blows up (tiny noisy
        # rz -> exploding beta).  Track the best-true-residual iterate; when
        # the current residual is non-finite or has grown far beyond the
        # best seen, stop this image (pc := 0) and fall back to x_best.
        r_mean = _mean_abs(r_true)
        improved = (do_check & (r_mean < best)) if not batched else (
            do_check & active & (r_mean < best))
        x_best = jnp.where(expand(improved) if batched else improved, x, x_best)
        best = jnp.where(improved, r_mean, best)
        diverged = do_check & (~jnp.isfinite(r_mean) | (r_mean > 1e3 * best))
        if batched:
            diverged = diverged & active

        deff_new = deff_fn(x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = r_mean / bscale
        else:
            pc_new = r_mean

        upd = (do_check & active) if batched else do_check
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        pc = jnp.where(diverged, jnp.zeros_like(pc), pc)   # forces stop
        conv = jnp.where(upd, pc_new, conv)
        bad = bad | diverged
        return (x, r, z, p, rz, it_new, deff, deff_old, pc, conv, iters,
                x_best, best, bad)

    r0, z0, rz0 = fresh(x0)
    scal = (lambda v: jnp.full(bshape, v, dtype)) if batched else (lambda v: jnp.asarray(v, dtype))
    it0 = jnp.asarray(0, jnp.int32)
    iters0 = jnp.zeros(bshape, jnp.int32) if batched else it0
    bad0 = (jnp.zeros(bshape, bool) if batched else jnp.asarray(False))
    init = (x0, r0, z0, z0, rz0, it0,
            scal(1.0), scal(5.0), scal(100.0), scal(100.0), iters0,
            x0, _mean_abs(r0), bad0)
    out = jax.lax.while_loop(cond, body, init)
    (x, r, z, p, rz, it, deff, deff_old, pc, conv, iters, x_best, best,
     bad) = out
    # Healthy images return their LAST iterate (best for warm
    # restarts/continuation — repeatedly restarting a solve from the
    # best-residual snapshot can limit-cycle, measured in
    # solvers/compact.py); images whose divergence safety net fired return
    # the pre-divergence best, with conv reporting that iterate's residual.
    x_out = jnp.where(expand(bad) if batched else bad, x_best, x)
    deff_out = deff_fn(x_out)
    if criterion == "relresidual":
        conv = jnp.where(bad, best / bscale, conv)
    elif criterion != "deff":
        conv = jnp.where(bad, best, conv)
    return SolveResult(x=x_out, deff=deff_out, conv=conv, iters=iters)

"""Shared solve-loop driver with reference-exact stopping semantics.

Every sweep-based solver (weighted Jacobi, red-black SOR, the Pallas-fused
variants) shares the same outer control flow, which reproduces the reference
drivers JacobiGPU/JacobiGPUPreCond (Deff2D.cuh:1163-1314 / 1024-1160):

  * sweeps indexed 0,1,2,...; a convergence check runs on every sweep whose
    index is a multiple of ``check_every`` (``iterCount % iterToCheck == 0``,
    Deff2D.cuh:1243 — i.e. after sweeps 1, N+1, 2N+1, ... have run);
  * ``deff_old=5``, ``deff=1``, ``percent_change=100`` initial values
    (Deff2D.cuh:1171-1173);
  * ``percent_change = (deff_old - deff_new)/deff_old`` (Deff2D.cuh:1265);
  * loop while ``iter < max_iter and tol < |percent_change|``
    (Deff2D.cuh:1232); ``conv`` = last computed value (Deff2D.cuh:1275).

The loop is a chunked ``lax.while_loop``: each body iteration runs a
check-aligned chunk of sweeps in a ``fori_loop`` and evaluates the on-device
Deff (or residual) monitor once — no host synchronization anywhere.

``criterion="residual"`` swaps the monitor for the mean absolute flux
imbalance (the reference's principled-but-dead Residual, Deff2D.cuh:451-494);
``criterion="relresidual"`` divides it by ``mean(|b|)`` for a scale-free
tolerance.

The batched driver advances a whole (B, ny, nx) stack in fused sweeps with
per-image freezing: once an image meets the criterion its field stops
updating, so its final state matches a solo run at the same sweep schedule
exactly (the reference's serial BatchSim semantics, vmapped).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff

__all__ = ["SolveResult", "run_single", "run_batched", "resolve_check_every",
           "resolve_first_window"]


def resolve_first_window(first_window: int, check_every: int, criterion: str,
                         matrix_free: bool = False) -> int:
    """Resolve the fused-MGCG opening-window length (config.py FirstWindow).

    ``0`` = auto: ``check_every`` under the residual criteria (the
    in-kernel early exit makes a full-size first window free for
    converged/warm images), 1 for ``criterion="deff"`` (no in-kernel
    stop — a large first window would run blind) and for the 2D
    matrix-free banded engine (``matrix_free=True``: a long blind
    opening window lets CG amplify the small level-0 recompute/stored-
    refresh stencil mismatch — measured 41 → 111 iterations at 2048²,
    see solve_mgcg).  Explicit positive values are honored as-is.
    Shared by the 2D, 3D, and sharded fused drivers so their auto
    schedules cannot drift apart.
    """
    if first_window != 0:
        return first_window
    if matrix_free or criterion not in ("residual", "relresidual"):
        return 1
    return check_every


def resolve_check_every(check_every: int, default: int) -> int:
    """Resolve the convergence-check cadence.

    ``check_every <= 0`` means "use the solver's default": 10,000 sweeps for
    the sweep solvers (the reference's hardcoded iterToCheck, Deff2D.cuh:1174),
    100 for CG-family solvers, 10 for MGCG (a V-cycle does the work of many
    sweeps, so checks must be proportionally denser).  An explicit positive
    value is honored exactly — never silently clamped (round-1 verdict #9).
    """
    return default if check_every is None or check_every <= 0 else check_every


class SolveResult(NamedTuple):
    x: jax.Array        # final concentration field(s)
    deff: jax.Array     # Deff at the last convergence check (raw, unnormalized)
    conv: jax.Array     # last percent-change (or residual) observed
    iters: jax.Array    # sweeps executed (per image in batched mode)


SweepFn = Callable[[jax.Array], jax.Array]


def run_single(
    sweep: SweepFn,
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    *,
    tol: float,
    max_iter: int,
    check_every: int,
    criterion: str,
    deff_fn=None,
    resid_fn=None,
    it0: int = 0,
    deff0: float = 1.0,
    deff_old0: float = 5.0,
) -> SolveResult:
    """``deff_fn``/``resid_fn`` override the convergence monitors (used by the
    sharded solvers, whose reductions need a ``psum`` over the device mesh).

    Protocol carry (segmented solves): ``it0`` is the GLOBAL sweep count
    already executed before this call; checks stay on the global schedule
    (sweeps 1, 1+N, 1+2N, ...), and ``deff0``/``deff_old0`` carry the monitor
    state of the previous segment, so a run split into segments stops at
    exactly the sweep where one continuous reference-protocol run would
    (Deff2D.cuh:1171-1173 init dance + 1232-1275 window updates).  Valid when
    each segment ends on a check boundary (every segment that executes at
    least one full window does); ``max_iter`` is this call's sweep budget.
    """
    deff_fn = deff_fn or (lambda x: boundary_deff(spec, x))
    resid_fn = resid_fn or (lambda x: fvm.residual(coeffs, x))
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    bscale = jnp.mean(jnp.abs(coeffs.b)) if criterion == "relresidual" else None
    end = it0 + max_iter

    def cond(c):
        x, it, deff, deff_old, pc, conv = c
        return (it < end) & (tol_ < jnp.abs(pc))

    def body(c):
        x, it, deff, deff_old, pc, conv = c
        # distance to the next global check (== 1 at it == 0, == check_every
        # on every later check boundary), clamped to this call's budget
        k = jnp.minimum(check_every - ((it - 1) % check_every), end - it)
        x = jax.lax.fori_loop(0, k, lambda _, xc: sweep(xc), x)
        it_new = it + k
        do_check = ((it_new - 1) % check_every) == 0

        deff_new = deff_fn(x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = resid_fn(x) / bscale
        else:
            pc_new = resid_fn(x)

        deff = jnp.where(do_check, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(do_check, deff_new, deff_old)
        pc = jnp.where(do_check, pc_new, pc)
        conv = jnp.where(do_check, pc_new, conv)
        return (x, it_new, deff, deff_old, pc, conv)

    init = (
        x0,
        jnp.asarray(it0, jnp.int32),
        jnp.asarray(deff0, dtype),
        jnp.asarray(deff_old0, dtype),
        jnp.asarray(100.0, dtype),
        jnp.asarray(100.0, dtype),
    )
    x, it, deff, _, _, conv = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=x, deff=deff, conv=conv, iters=it - it0)


def run_batched(
    sweep: SweepFn,
    coeffs: fvm.StencilCoeffs,
    spec: BoundaryFluxSpec,
    x0: jax.Array,
    *,
    tol: float,
    max_iter: int,
    check_every: int,
    criterion: str,
    deff_fn=None,
    resid_fn=None,
    reduce_any_fn=None,
    it0: int = 0,
    deff0: float = 1.0,
    deff_old0: float = 5.0,
) -> SolveResult:
    """``reduce_any_fn`` all-reduces the "any image still active" bool across
    a device mesh (sharded batches must keep a globally uniform trip count so
    the halo collectives stay in lockstep); default is a local ``jnp.any``.
    ``it0``/``deff0``/``deff_old0`` are the segmented-solve protocol carry
    (see run_single; ``deff0``/``deff_old0`` may be (B,) arrays)."""
    deff_fn = deff_fn or (lambda x: boundary_deff(spec, x))
    resid_fn = resid_fn or (lambda x: fvm.residual(coeffs, x))
    reduce_any_fn = reduce_any_fn or jnp.any
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    bsz = x0.shape[0]
    grid_axes = tuple(range(1, x0.ndim))
    bscale = (jnp.mean(jnp.abs(coeffs.b), axis=grid_axes)
              if criterion == "relresidual" else None)
    end = it0 + max_iter

    def active_of(pc, it):
        return (tol_ < jnp.abs(pc)) & (it < end)

    def cond(c):
        x, it, deff, deff_old, pc, conv, iters = c
        return reduce_any_fn(active_of(pc, it)) & (it < end)

    def body(c):
        x, it, deff, deff_old, pc, conv, iters = c
        active = active_of(pc, it)
        k = jnp.minimum(check_every - ((it - 1) % check_every), end - it)

        def one(_, xc):
            # expand (B,) activity over however many grid dims follow (2D/3D)
            keep = active.reshape(active.shape + (1,) * (xc.ndim - 1))
            return jnp.where(keep, sweep(xc), xc)

        x = jax.lax.fori_loop(0, k, one, x)
        it_new = it + k
        iters = iters + jnp.where(active, k, 0)
        do_check = ((it_new - 1) % check_every) == 0

        deff_new = deff_fn(x)                    # (B,)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = resid_fn(x) / bscale
        else:
            pc_new = resid_fn(x)

        upd = do_check & active
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        conv = jnp.where(upd, pc_new, conv)
        return (x, it_new, deff, deff_old, pc, conv, iters)

    init = (
        x0,
        jnp.asarray(it0, jnp.int32),
        jnp.broadcast_to(jnp.asarray(deff0, dtype), (bsz,)),
        jnp.broadcast_to(jnp.asarray(deff_old0, dtype), (bsz,)),
        jnp.full((bsz,), 100.0, dtype),
        jnp.full((bsz,), 100.0, dtype),
        jnp.zeros((bsz,), jnp.int32),
    )
    x, _, deff, _, _, conv, iters = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=x, deff=deff, conv=conv, iters=iters)

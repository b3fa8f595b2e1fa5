"""Batch compaction: stop paying for converged images (aux throughput).

The batched solvers freeze converged images (masked updates — exact serial
semantics) but still COMPUTE them every iteration; with the fused CG
kernel being VPU-bound, a long-tail batch wastes its frozen members' lanes.
This wrapper advances the batch in segments and re-packs the still-active
images between segments, so late segments run on shrinking sub-batches.

Mechanics:
  * each segment runs ``segment`` iterations of the wrapped batched solver
    on the active subset, warm-started from the current fields;
  * sub-batches are padded up to power-of-two buckets (min 8) so XLA
    compiles at most log2(B) shapes, each cached after first use;
  * an image leaves the active set when it stopped inside its segment
    (iters < segment) or its convergence monitor met tol.

Semantics note: each segment warm-starts from the previous segment's
returned field, which for the PCG engine is its BEST-residual iterate
(the fp32 safety-net semantics of run_pcg).  With a strong preconditioner
(mgcg — the datagen solver this exists for) restarts re-descend
immediately and converged results match the unsegmented run (tested);
weakly-preconditioned CG on a pathological image can limit-cycle on the
repeated best-iterate restart — measured with diagonal-CG at segment=50 on
a contrast-1e5 image — so pair compaction with mgcg, and use
``utils.checkpoint.checkpointed_solve`` (protocol carry) for sweep-solver
protocols.

The limit-cycle hazard is also guarded at runtime (not just by the
pipeline's cg/mgcg gate): ``stall_segments`` consecutive FULL segments in
which an image's conv never beats the best value seen so far retire that
image with a ``ConvergenceWarning``-style ``RuntimeWarning`` and its honest
conv (> tol) in the returned SolveResult.  Two deliberate limits on the
guard (it is a heuristic, not an invariant):

  * conv is NOT monotone across segments — ``run_pcg`` returns the LAST
    iterate for healthy images (solvers/pcg.py; best-iterate restarts are
    themselves the limit-cycle cause), so the guard compares against the
    best conv EVER seen and only counts segments that fail to improve it;
  * the guard applies only to ``criterion="residual"/"relresidual"``.
    The reference-protocol ``"deff"`` monitor is a percent-CHANGE of the
    flux functional — it oscillates by construction near convergence and
    says nothing about distance to the solution, so "no new best" there
    would retire slowly-but-genuinely-converging images.  Under
    ``criterion="deff"`` (the pipeline default) the guard is inert.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .driver import SolveResult

__all__ = ["solve_batched_compacted"]


def _bucket(n: int, min_bucket: int = 8) -> int:
    b = min_bucket
    while b < n:
        b *= 2
    return b


def solve_batched_compacted(
    solve_fn: Callable,
    coeffs,
    spec,
    x0: jax.Array,
    *,
    tol: float,
    max_iter: int,
    segment: int = 0,
    check_every: int = 0,
    criterion: str = "residual",
    min_bucket: int = 8,
    stall_segments: int = 3,
    **kw,
) -> SolveResult:
    """Run ``solve_fn`` (any batched framework solver) with inter-segment
    compaction.  ``segment=0`` picks ``8 x check_every`` (or 80).
    Returns the full-batch SolveResult in original image order.

    ``stall_segments``: retire (with a RuntimeWarning) any image whose conv
    never improves on its best seen value over this many consecutive FULL
    segments — the warm-restart limit cycle documented above.  0 disables
    the guard; it is also inert unless ``criterion`` is ``"residual"`` or
    ``"relresidual"`` (the ``"deff"`` percent-change monitor oscillates by
    construction and would false-positive; see module docstring)."""
    bsz = x0.shape[0]
    ck = check_every or 10
    segment = segment or 8 * ck
    guard_on = bool(stall_segments) and criterion in ("residual", "relresidual")

    # fields stay ON DEVICE for the whole run: only the per-image scalars
    # (iters/conv/deff) cross to the host between segments — fetching the
    # (B, ny, nx) stack through the relay per segment measured ~17x slower
    # than the plain solve it was meant to beat
    x_store = x0
    deff = np.zeros((bsz,), np.float64)
    conv = np.full((bsz,), np.inf)
    iters = np.zeros((bsz,), np.int64)
    best_conv = np.full((bsz,), np.inf)
    stalled = np.zeros((bsz,), np.int64)
    n_retired = 0
    active = list(range(bsz))

    while active and int(iters[active].min(initial=0)) < max_iter:
        seg = int(min(segment, max_iter - iters[active].min()))
        nb = _bucket(len(active), min_bucket)
        n_act = len(active)
        idx = np.asarray(active + [active[0]] * (nb - n_act), np.int64)
        idx_j = jnp.asarray(idx)
        sub_coeffs = jax.tree.map(lambda a: jnp.take(a, idx_j, axis=0), coeffs)
        sub_spec = jax.tree.map(
            lambda a: jnp.take(jnp.asarray(a), idx_j, axis=0), spec)
        sub_x = jnp.take(x_store, idx_j, axis=0)
        res = solve_fn(sub_coeffs, sub_spec, sub_x, tol=tol, max_iter=seg,
                       check_every=ck, criterion=criterion, **kw)
        x_store = x_store.at[idx_j[:n_act]].set(res.x[:n_act])
        sub_iters = np.asarray(res.iters)
        sub_conv = np.asarray(res.conv)
        sub_deff = np.asarray(res.deff)

        still = []
        for k, i in enumerate(active):
            iters[i] += int(sub_iters[k])
            conv[i] = float(sub_conv[k])
            deff[i] = float(sub_deff[k])
            done = (int(sub_iters[k]) < seg) or (
                np.isfinite(sub_conv[k]) and abs(sub_conv[k]) <= tol)
            # stall bookkeeping only on FULL segments: a truncated final
            # segment (seg < segment near max_iter) stopping early is the
            # iteration budget, not the limit cycle
            if not done and int(sub_iters[k]) >= seg and guard_on and seg == segment:
                c = abs(conv[i])
                if np.isfinite(c) and c < best_conv[i]:
                    best_conv[i] = c
                    stalled[i] = 0
                else:
                    stalled[i] += 1
                    if stalled[i] >= stall_segments:
                        n_retired += 1
                        done = True
            if not done and iters[i] < max_iter:
                still.append(i)
        active = still

    if n_retired:
        warnings.warn(
            f"solve_batched_compacted retired {n_retired} image(s) whose conv "
            f"showed no improvement over {stall_segments} consecutive segments "
            "— the warm-restart limit cycle of weakly-preconditioned solvers "
            "(see solvers/compact.py docstring); their conv in the returned "
            "SolveResult is honest (> tol). Use mgcg, or "
            "utils.checkpoint.checkpointed_solve for sweep-solver protocols.",
            RuntimeWarning, stacklevel=2)

    return SolveResult(
        x=x_store,
        deff=jnp.asarray(deff),
        conv=jnp.asarray(conv),
        iters=jnp.asarray(iters, jnp.int32),
    )

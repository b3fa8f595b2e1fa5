"""Fused whole-CG-iteration Pallas kernel: k MGCG iterations per VMEM
residency.

With the V-cycle already fused (vcycle_vmem.py), the CG vector algebra
around it became the dominant HBM cost: per iteration the XLA loop streams
~x/r/p/q updates, two dot products, and the cycle's in/out — ~14
fine-plane round trips on top of the cycle's ~7.  This kernel keeps the CG
state (x, r, p) AND the whole coefficient pyramid resident and runs
``k = check_every`` full PCG iterations per launch:

    per-launch HBM traffic = read pyramid + x,r,p + write x,r,p
                           ~ 10 fine-plane equivalents
    per-ITERATION traffic  ~ 10 / k  planes  (k ~ 10: one plane-pass!)

Everything else — the fine matvec, both dot products, the alpha/beta
updates, and the entire V(nu, nu) cycle — is VPU/MXU work on VMEM data
(measured ~70 Gcell/s once resident, vcycle_vmem.py).

Per-image convergence freezing matches the batched XLA engine
(solvers/pcg.run_pcg): the ``active`` scalar gates alpha/beta/p/rz, so a
converged image's state is bit-frozen while the batch keeps iterating.
``rz`` (the PCG recurrence scalar) is carried across launches in SMEM.

The kernel operates on the PADDED-EVEN system (build_hierarchy(
pad_levels=True)); padded rows are decoupled identity cells whose r/p stay
exactly zero, so dots and updates are unaffected.  Reference hot-kernel
analog: updateX_SOR (Deff2D.cuh:69-92) — one sweep of the reference's
solver vs a full Krylov+multigrid iteration here.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm import StencilCoeffs
from .vcycle_vmem import (_build_sels, _cycle_value, _load_levels, _nbsum,
                          x32_kernel)

__all__ = ["cg_steps_pallas", "cgstep_fits_vmem"]


def cgstep_fits_vmem(ny: int, nx: int, itemsize: int = 4) -> bool:
    """Pyramid (~4 planes) + x/r/p in+out (x2 double-buffered) + b + cycle
    temporaries — ~28 fine-plane equivalents must fit the raised VMEM
    budget."""
    return 28 * ny * nx * itemsize < 100 * 1024 * 1024


def _kernel(k_ref, active_ref, rz_ref, stop_ref, hi_ref, x_ref, r_ref, p_ref,
            *rest, shapes, omega, nu, coarse_iters, over, refresh):
    n_levels = len(shapes)
    if refresh:
        b_ref, rest = rest[0], rest[1:]
    coef_refs = rest[:3 * n_levels]
    if refresh:
        xo_ref, ro_ref, po_ref, rzo_ref, ko_ref, sro_ref = rest[3 * n_levels:]
    else:
        xo_ref, ro_ref, po_ref, rzo_ref, ko_ref = rest[3 * n_levels:]
    # scalars ride SMEM as full (1, B) arrays (Mosaic's block divisibility
    # rule rejects (1, 1) blocks).  ROW-major layout matters: SMEM windows
    # pad each row to 512 B, so (B, 1) costs 512 B/image — 6 such windows
    # SMEM-OOM at B = 512 (1.5 MB > the 1 MB scoped budget) — while (1, B)
    # is one padded row regardless of B.  The TPU grid is sequential, so
    # indexing by program id is race-free for both reads and the rz
    # write-back.
    pid = pl.program_id(0)
    act = active_ref[0, pid]

    # The TPU grid is SEQUENTIAL: total kernel time is the sum of per-image
    # work, so predicating the whole body on the freeze flag makes frozen
    # images cost only their (pipelined) block DMA — the batched engine's
    # per-image freezing stops COSTING, not just mutating.  This is the
    # in-kernel form of batch compaction (solvers/compact.py) without the
    # host-loop dispatch overhead.
    @pl.when(act > 0)
    def _run():
        lvl = _load_levels(coef_refs, n_levels, omega, nu)
        aw0, an0 = lvl[0][0], lvl[0][1]
        diag0 = lvl[0][3]
        # loop-invariant values built ONCE per launch (the while_loop closes
        # over them): selection operators and the omega-folded inverses
        sels = _build_sels(shapes, x_ref.dtype)
        # per-image EARLY EXIT: the recurrence residual's |.|-sum is free in
        # VMEM, so the loop stops the moment an image reaches its stop
        # threshold (sum-form of the driver's mean-|r| tolerance) instead of
        # sweeping blind to the window edge — and the divergence guard fires
        # in-kernel (hi threshold) instead of waiting for the next true-
        # residual check.  The outer driver's check stays authoritative:
        # it refreshes r from the true residual, so an optimistic recurrence
        # exit is re-opened on the next launch with >= 1 iteration of
        # progress (no livelock).
        stop = stop_ref[0, pid]
        hi = hi_ref[0, pid]

        def matvec(v):
            return diag0 * v - _nbsum(aw0, an0, v)

        def cond(s):
            i, _x, _r, _p, _rz, sr = s
            return (i < k_ref[0]) & (sr > stop) & (sr < hi)

        def one(s):
            i, x, r, p, rz, _sr = s
            q = matvec(p)
            pap = jnp.sum(p * q)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * q
            z = _cycle_value(r, lvl, shapes, omega, nu, coarse_iters, over,
                             sels)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z + beta * p
            return (i + 1, x, r, p, rz_new, jnp.sum(jnp.abs(r)))

        r0 = r_ref[0]
        init = (jnp.asarray(0, jnp.int32), x_ref[0], r0, p_ref[0],
                rz_ref[0, pid], jnp.sum(jnp.abs(r0)))
        i, x, r, p, rz, _sr = jax.lax.while_loop(cond, one, init)
        xo_ref[0] = x
        ko_ref[0, pid] = i
        if refresh:
            # IN-KERNEL true-residual refresh + restart: the driver's
            # per-check r = b - A x, z = M r, <r, z> used to run as XLA ops
            # over the full batch every launch round (~16 ms/round at
            # batch 256x512^2, frozen images included).  Computing it here
            # costs ~0.7 iteration-equivalents of in-VMEM work, is
            # predicated off for frozen images, and returns the restarted
            # (r, p=z, rz) directly — the driver keeps only the scalar
            # monitors.  sum|r_true| is returned for the driver's mean-|r|
            # checks (padded cells carry exact zeros).
            r_t = b_ref[0] - matvec(x)
            z_t = _cycle_value(r_t, lvl, shapes, omega, nu, coarse_iters,
                               over, sels)
            ro_ref[0] = r_t
            po_ref[0] = z_t
            rzo_ref[0, pid] = jnp.sum(r_t * z_t)
            sro_ref[0, pid] = jnp.sum(jnp.abs(r_t))
        else:
            ro_ref[0] = r
            po_ref[0] = p
            rzo_ref[0, pid] = rz

    @pl.when(act <= 0)
    def _skip():
        xo_ref[0] = x_ref[0]
        ro_ref[0] = r_ref[0]
        po_ref[0] = p_ref[0]
        rzo_ref[0, pid] = rz_ref[0, pid]
        ko_ref[0, pid] = 0
        if refresh:
            # the driver only reads sum|r_true| under active masks — skip
            # the full-plane reduction for frozen images
            sro_ref[0, pid] = jnp.zeros((), r_ref.dtype)


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "interpret", "refresh"))
@x32_kernel
def cg_steps_pallas(levels: List[StencilCoeffs], x: jax.Array, r: jax.Array,
                    p: jax.Array, rz: jax.Array, active: jax.Array,
                    stop: jax.Array, hi: jax.Array,
                    k: jax.Array, *, omega: float = 0.8, nu: int = 2,
                    coarse_iters: int = 32, over: float = 1.8,
                    interpret: bool = False, refresh: bool = False):
    """Run up to ``k`` fused MGCG iterations on a (B, py, px) padded batch.

    Args:
      levels: pre-padded hierarchy (build_hierarchy(..., pad_levels=True)),
        arrays (B, ny_l, nx_l); level 0 is the padded fine operator.
      x, r, p: CG state, (B, py, px).
      rz: recurrence scalar <r, z>, (B, 1).
      active: 1.0 = iterate, 0.0 = frozen, (B, 1).
      stop: per-image early-exit threshold on sum|r| (0 disables), (B, 1).
      hi: per-image divergence threshold on sum|r| (pass a huge value to
        disable), (B, 1).
      k: traced int32 iteration cap (scalar prefetch).
      refresh: fuse the per-check true-residual refresh + restart into the
        kernel tail (active images only): returns r = b - A x, p = z =
        M r, rz = <r, z> already restarted, plus sum|r_true| per image.
    Returns:
      (x, r, p, rz, k_done) — k_done (B, 1) int32 iterations executed —
      plus sum|r_true| (B, 1) when ``refresh``.
    """
    bsz, py, px = x.shape
    shapes = tuple((c.diag.shape[-2], c.diag.shape[-1]) for c in levels)
    assert shapes[0] == (py, px), (shapes[0], (py, px))

    img = pl.BlockSpec((1, py, px), lambda b, kk: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    # (1, B) row layout: SMEM windows pad rows to 512 B, so the transposed
    # (B, 1) form costs 512 B/image and OOMs the 1 MB scoped SMEM budget at
    # B = 512 across the 6 scalar windows; one row is B-independent.
    scal = pl.BlockSpec((1, bsz), lambda b, kk: (0, 0),
                        memory_space=pltpu.SMEM)
    row = lambda a: a.reshape(1, bsz)

    in_specs = [scal, scal, scal, scal, img, img, img]
    operands = [row(active), row(rz.astype(x.dtype)),
                row(stop.astype(x.dtype)), row(hi.astype(x.dtype)), x, r, p]
    if refresh:
        in_specs.append(img)
        operands.append(levels[0].b)
    for c, (sy, sx) in zip(levels, shapes):
        spec_l = pl.BlockSpec((1, sy, sx), lambda b, kk: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        for plane in (c.a_w, c.a_n, c.diag_inv):
            in_specs.append(spec_l)
            operands.append(plane)

    n_scal_out = 3 if refresh else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=[img, img, img] + [scal] * n_scal_out,
    )
    pyramid = sum(sy * sx for sy, sx in shapes)
    nplane = 7 if refresh else 6           # x/r/p in+out (+ b when refresh)
    limit = int(4.6 * (2 * (3 * pyramid + nplane * py * px) + 2 * pyramid
                       + 8 * py * px))     # 1.15x headroom on the estimate
    # Mosaic schedules WITHIN the budget (double-buffering adapts), but a
    # marginal budget fails at some batch counts (measured: batch 64 fit a
    # 37 MB budget, batch 128 needed ~400 KB more).  Physical VMEM is
    # ~128 MB; grant 2x the estimate up to 112 MB.
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(2 * limit, 48 << 20), 112 << 20))}

    kernel = functools.partial(_kernel, shapes=shapes, omega=omega, nu=nu,
                               coarse_iters=coarse_iters, over=over,
                               refresh=refresh)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 3
        + [jax.ShapeDtypeStruct((1, bsz), x.dtype),
           jax.ShapeDtypeStruct((1, bsz), jnp.int32)]
        + ([jax.ShapeDtypeStruct((1, bsz), x.dtype)] if refresh else []),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(jnp.asarray(k, jnp.int32).reshape(1), *operands)
    xo, ro, po, rzo, ko = out[:5]
    res = (xo, ro, po, rzo.reshape(bsz, 1), ko.reshape(bsz, 1))
    if refresh:
        res = res + (out[5].reshape(bsz, 1),)
    return res

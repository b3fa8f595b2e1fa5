"""Banded whole-CG-iteration engine: the >VMEM analog of cgstep_vmem.py.

For fine grids past the whole-VMEM cap (~1449^2 fp32), the fused-iteration
kernel cannot hold the CG state resident — but the XLA vector algebra
around the tiled V-cycle streams HBM at the XLA sweep rate (~56 GB/s
measured at 2048^2: ~7.3 ms/iteration where ~0.5 ms of traffic exists).
This engine runs each PCG iteration as THREE banded Pallas passes with
scalar reductions carried in SMEM between them, all inside one jitted
while_loop (same contract as :func:`cgstep_vmem.cg_steps_pallas`):

  A  p = z + beta*p_old (windowed, halos exact), q = A p in-window,
     accumulate pap = <p, q> across the sequential band grid
  B  x += alpha*p, r -= alpha*q (q recomputed in-window from p — cheaper
     than storing it), then the tiled V-cycle's T1 (pre-smooth + residual
     + restriction) on the fresh r, accumulating sum|r| for the per-image
     early exit
  C  coarse tail (vcycle_tiled.coarse_tail) + T2 (prolong + add +
     post-smooth) producing z, accumulating rz = <r, z>

alpha/beta are O(B) scalar work between passes; the iteration loop is a
``lax.while_loop`` whose per-image live mask implements the same early
exit / divergence-tripwire / freeze semantics as the in-VMEM kernel's
while_loop (a live image leaves the loop the moment its recurrence
sum|r| crosses stop or hi; frozen images pass their bands through).

Window-validity: q needs one neighbor row; nu smoothing sweeps + the
level residual need nu+1 more — HALO = 8 rows cover nu <= 4 with margin
(see vcycle_tiled.py's invariant).

HBM traffic per iteration ~22 fine-plane passes (A: 6, B: 9.25, C: 6.25
+ the 4x-smaller coarse tail) vs ~24 streamed by XLA at a fraction of the
bandwidth.  Reference hot-kernel analog: updateX_SOR (Deff2D.cuh:69-92)
at its shipped demo-image scale, one full Krylov+multigrid iteration per
three plane passes.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm import StencilCoeffs
from .vcycle_vmem import (_dg, _diag_of, _nbsum, _sel, smoothing_schedule,
                          x32_kernel)
from .vcycle_tiled import (HALO, _band_specs, _banded, _smooth_w, _win,
                           coarse_tail)

__all__ = ["cg_steps_tiled"]


def _scal_spec(bsz):
    return pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                        memory_space=pltpu.SMEM)


def _pass_a(beta_ref, live_ref, zb, zn, zs, pb, pn, ps, awb, awn, aws,
            anb, ann, ans, dib, din, dis, p_out, pap_ref, *, H):
    """p = z + beta*p_old on the full window; q = A p on the interior;
    accumulate pap."""
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        pap_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        beta = beta_ref[b, 0]
        pw = _win(zn, zb, zs) + beta * _win(pn, pb, ps)
        aww = _win(awn, awb, aws)
        anw = _win(ann, anb, ans)
        dgw = _diag_of(_win(din, dib, dis))
        q = dgw * pw - _nbsum(aww, anw, pw)       # valid off the window edge
        pbnd = pw[h:h + H]
        p_out[0, 0] = pbnd
        pap_ref[b, 0] += jnp.sum(pbnd * q[h:h + H])

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        p_out[0, 0] = pb[0, 0]


def _pass_b(alpha_ref, live_ref, xb, pb, pn, ps, rb, rn, rs, awb, awn, aws,
            anb, ann, ans, dib, din, dis, x_out, r_out, e_out, rc_out,
            sr_ref, *, H, omega, nu):
    """x += alpha p; r -= alpha q (q recomputed in-window); T1 of the tiled
    cycle on the fresh r; accumulate sum|r|."""
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        sr_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        alpha = alpha_ref[b, 0]
        pw = _win(pn, pb, ps)
        aww = _win(awn, awb, aws)
        anw = _win(ann, anb, ans)
        diw = _win(din, dib, dis)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum(aww, anw, pw)       # valid margin 1
        rw = _win(rn, rb, rs) - alpha * q         # valid margin 1
        x_out[0, 0] = xb[0, 0] + alpha * pb[0, 0]

        ws = smoothing_schedule(omega, nu)
        e = ws[0] * diw * rw
        for w in ws[1:]:
            e = _smooth_w(aww, anw, diw, e, rw, w)
        res = rw - (dgw * e - _nbsum(aww, anw, e))  # valid margin nu+2 <= HALO

        rbnd = rw[h:h + H]
        r_out[0, 0] = rbnd
        e_out[0, 0] = e[h:h + H]
        sr_ref[b, 0] += jnp.sum(jnp.abs(rbnd))
        resb = res[h:h + H]
        ry = _sel(H // 2, H, res.dtype)
        rx = _sel(resb.shape[1] // 2, resb.shape[1], res.dtype)
        t = _dg(ry, resb, (((1,), (0,)), ((), ())), split="b")
        rc_out[0, 0] = _dg(t, rx, (((1,), (1,)), ((), ())), split="a")

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        x_out[0, 0] = xb[0, 0]
        r_out[0, 0] = rb[0, 0]
        e_out[0, 0] = jnp.zeros_like(e_out[0, 0])
        rc_out[0, 0] = jnp.zeros_like(rc_out[0, 0])


def _pass_c(live_ref, eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
            dib, din, dis, ec_ref, z_out, rz_ref, *, H, omega, nu, over):
    """T2 of the tiled cycle (prolong + add + post-smooth) producing z;
    accumulate rz = <r, z> (same prolongation as vcycle_tiled._post_kernel)."""
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        rz_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        ew = _win(en, eb, es_)
        rw = _win(rn, rb, rs)
        aww = _win(awn, awb, aws)
        anw = _win(ann, anb, ans)
        diw = _win(din, dib, dis)

        ec = ec_ref[0]
        nyc, nxc = ec.shape
        wy = H + 2 * h
        row0 = g * H - h
        rows = jax.lax.broadcasted_iota(jnp.int32, (wy, nyc), 0) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, (wy, nyc), 1)
        sy = jnp.where(rows >= 0, rows // 2, -1)
        sel_y = (sy == cols).astype(ec.dtype)
        t = _dg(sel_y, ec, (((1,), (0,)), ((), ())), split="b")
        nx = ew.shape[1]
        fcols = jax.lax.broadcasted_iota(jnp.int32, (nx, nxc), 0) // 2
        ccols = jax.lax.broadcasted_iota(jnp.int32, (nx, nxc), 1)
        sel_x = (fcols == ccols).astype(ec.dtype)
        ecw = _dg(t, sel_x, (((1,), (1,)), ((), ())), split="a")

        e = ew + over * ecw
        for w in reversed(smoothing_schedule(omega, nu)):
            e = _smooth_w(aww, anw, diw, e, rw, w)
        zb = e[h:h + H]
        z_out[0, 0] = zb
        rz_ref[b, 0] += jnp.sum(rb[0, 0] * zb)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        z_out[0, 0] = jnp.zeros_like(z_out[0, 0])


def _halos(xb):
    """Banded (B, G, band, nx) -> (north, south) (B, G, HALO, nx) halo
    arrays (zeros beyond the global edges)."""
    bsz, g, band, nx = xb.shape
    zero = jnp.zeros((bsz, 1, HALO, nx), xb.dtype)
    north = jnp.concatenate([zero, xb[:, :-1, band - HALO:]], axis=1)
    south = jnp.concatenate([xb[:, 1:, :HALO], zero], axis=1)
    return north, south


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "band", "interpret"))
@x32_kernel
def cg_steps_tiled(levels: List[StencilCoeffs], x: jax.Array, r: jax.Array,
                   p: jax.Array, rz: jax.Array, active: jax.Array,
                   stop: jax.Array, hi: jax.Array, k: jax.Array, *,
                   omega: float = 0.8, nu: int = 2, coarse_iters: int = 32,
                   over: float = 1.8, band: int = 256,
                   interpret: bool = False):
    """Run up to ``k`` banded MGCG iterations on a (B, py, px) padded batch.

    Same contract as :func:`cgstep_vmem.cg_steps_pallas` (levels from
    ``build_hierarchy(pad_levels=True)`` on an operator padded to
    ``tiled_pad_shape``; py % band == 0): returns (x, r, p, rz, k_done).
    A live image leaves the iteration loop when its recurrence sum|r|
    crosses ``stop`` (early exit) or ``hi`` (divergence tripwire); frozen
    (``active`` = 0) images pass through untouched.
    """
    bsz, py, px = x.shape
    if py % band or band % 2 or nu > HALO - 2:
        raise ValueError(f"cg_steps_tiled: py={py} % band={band}, band even,"
                         f" nu<={HALO - 2} required")
    c0 = levels[0]
    g_total = py // band
    dtype = x.dtype

    awb, awn, aws = _banded(c0.a_w, band)
    anb, ann, ans = _banded(c0.a_n, band)
    dib, din, dis = _banded(c0.diag_inv, band)
    coef_ops = [awb, awn, aws, anb, ann, ans, dib, din, dis]

    body, halo = _band_specs(g_total, band, px)
    coef_specs = [body, halo, halo] * 3
    scal = _scal_spec(bsz)
    win_bytes = (band + 2 * HALO) * px * dtype.itemsize
    py1, px1 = levels[1].diag.shape[-2], levels[1].diag.shape[-1]

    def params(extra=0):
        if interpret:
            return {}
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=int(26 * win_bytes + extra))}

    scal_shape = jax.ShapeDtypeStruct((bsz, 1), dtype)
    band_shape = jax.ShapeDtypeStruct((bsz, g_total, band, px), dtype)
    rc_shape = jax.ShapeDtypeStruct((bsz, g_total, band // 2, px // 2), dtype)
    rc_spec = pl.BlockSpec((1, 1, band // 2, px // 2),
                           lambda b, g: (b, g, 0, 0),
                           memory_space=pltpu.VMEM)
    ec_spec = pl.BlockSpec((1, py1, px1), lambda b, g: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    scal_out = pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                            memory_space=pltpu.SMEM)

    pa = pl.pallas_call(
        functools.partial(_pass_a, H=band),
        grid=(bsz, g_total),
        in_specs=[scal, scal] + [body, halo, halo] * 2 + coef_specs,
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(),
    )
    pb_ = pl.pallas_call(
        functools.partial(_pass_b, H=band, omega=omega, nu=nu),
        grid=(bsz, g_total),
        in_specs=[scal, scal, body] + [body, halo, halo] * 2 + coef_specs,
        out_shape=[band_shape, band_shape, band_shape, rc_shape, scal_shape],
        out_specs=[body, body, body, rc_spec, scal_out],
        interpret=interpret,
        **params(),
    )
    pc = pl.pallas_call(
        functools.partial(_pass_c, H=band, omega=omega, nu=nu, over=over),
        grid=(bsz, g_total),
        in_specs=[scal] + [body, halo, halo] * 2 + coef_specs + [ec_spec],
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(extra=4 * py1 * px1 * dtype.itemsize),
    )

    stop_ = stop[:, 0]
    hi_ = hi[:, 0]
    zeros_s = jnp.zeros((), dtype)

    def to_b(a):
        return a.reshape(bsz, g_total, band, px)

    sr0 = jnp.sum(jnp.abs(r), axis=(-2, -1))
    live0 = (active[:, 0] > 0) & (sr0 > stop_) & (sr0 < hi_)

    def cond(c):
        return (c[0] < k) & jnp.any(c[-1])

    def body_fn(c):
        (i, xb, rb, pb, zb, rz_p, rz_c, kdone, sr, live) = c
        livef = live.astype(dtype)[:, None]
        beta = jnp.where((i > 0) & live & (rz_p > 0),
                         rz_c / jnp.where(rz_p > 0, rz_p, 1.0), zeros_s)
        zn, zs = _halos(zb)
        pn, ps = _halos(pb)
        p_new, pap = pa(beta[:, None].astype(dtype), livef,
                        zb, zn, zs, pb, pn, ps, *coef_ops)
        pap = pap[:, 0]
        alpha = jnp.where(live & (pap > 0),
                          rz_c / jnp.where(pap > 0, pap, 1.0), zeros_s)
        pn2, ps2 = _halos(p_new)
        rn, rs = _halos(rb)
        x_new, r_new, e_b, rc_b, sr_out = pb_(
            alpha[:, None].astype(dtype), livef, xb,
            p_new, pn2, ps2, rb, rn, rs, *coef_ops)
        e_c = coarse_tail(levels, rc_b, omega=omega, nu=nu,
                          coarse_iters=coarse_iters, over=over,
                          interpret=interpret)
        en, es_ = _halos(e_b)
        rn2, rs2 = _halos(r_new)
        z_new, rz_out = pc(livef, e_b, en, es_, r_new, rn2, rs2,
                           *coef_ops, e_c)
        sr_new = jnp.where(live, sr_out[:, 0], sr)
        rz_new = jnp.where(live, rz_out[:, 0], rz_c)
        rz_p_new = jnp.where(live, rz_c, rz_p)
        z_keep = jnp.where(live[:, None, None, None], z_new, zb)
        kdone = kdone + live.astype(jnp.int32)
        live = live & (sr_new > stop_) & (sr_new < hi_)
        return (i + 1, x_new, r_new, p_new, z_keep, rz_p_new, rz_new,
                kdone, sr_new, live)

    init = (jnp.asarray(0, jnp.int32), to_b(x), to_b(r), to_b(p), to_b(p),
            rz[:, 0].astype(dtype), rz[:, 0].astype(dtype),
            jnp.zeros((bsz,), jnp.int32), sr0, live0)
    out = jax.lax.while_loop(cond, body_fn, init)
    (_i, xb, rb, pb, _zb, _rzp, rz_c, kdone, _sr, _live) = out

    def flat(a):
        return a.reshape(bsz, py, px)

    return (flat(xb), flat(rb), flat(pb), rz_c[:, None], kdone[:, None])

"""Fused sharded whole-CG-iteration engine: the shard_map analog of
ops/kernels/cgstep_tiled.py.

The sharded MGCG (parallel/halo.py) with the fused T1/T2 cycle
(parallel/fused2d.py) still runs its CG vector algebra — the fine matvec,
both dot products, and the x/r/p updates — as HBM-streaming XLA ops:
measured at 1024^2 on one chip the fused cycle is 0.23 ms of a 0.85 ms
iteration, i.e. ~70% of the time is the un-fused algebra.  This engine runs
each PCG iteration as THREE per-shard Pallas passes with ``psum``'d scalar
reductions between them (the cross-shard reduction is the only reason the
iteration cannot be one kernel), all inside one ``lax.while_loop`` in the
shard_map:

  A  p = z + beta*p_old on the HALO-row window, q = A p in-window,
     partial pap = <p, q>  ->  psum(pap) -> alpha
  B  x += alpha*p, r -= alpha*q (q recomputed in-window — cheaper than
     storing it, as in cgstep_tiled), then the fused cycle's T1
     (pre-smooth + residual + restrict) on the fresh r, partial sum|r|
     ->  psum -> per-image early exit / divergence tripwire
  C  coarse levels via the existing fused sharded recursion
     (fused2d._v_cycle_sharded_fused_impl from level 1), then T2
     (prolong + add + post-smooth) producing z, partial rz = <r, z>
     ->  psum -> beta

Halo traffic per iteration: HALO-row strips of z, r and e plus a
HALO/2-row strip of the coarse correction (4 ppermutes + the level>=1
recursion's own), vs one 1-row ppermute per sweep/matvec on the XLA path.
The p window is maintained ANALYTICALLY (p_strips = z_strips +
beta*p_strips — the update is pointwise), saving one exchange.

Window-validity: the strips are true neighbor rows, q costs one margin
row, nu pre-smooths + the residual cost nu+1 more — nu + 2 <= HALO = 8.

Per-image early exit / divergence tripwire / freeze semantics and the
outer chunked-check protocol mirror solvers/multigrid._run_mgcg_fused
(true-residual refresh every ``check_every``, best-iterate snapshot,
last-iterate return); monitors psum over the spatial axis and the batched
trip count reduces over the dp axis so the mesh stays in lockstep.

Local blocks that fit a whole-shard VMEM window run the whole-block
passes; LARGER blocks run the in-shard BANDED passes
(_cg_steps_sharded_banded — the banded-engine kernels of
ops/kernels/cgstep_tiled.py at grid (B, G) with shard-edge halos from the
ring neighbors and the band-offset T2 coarse mapping of
fused2d._t2b_kernel), so the engine covers every local size with a usable
even band >= HALO (sharded_fused_cg_ok); deeper levels band or fall back
inside the cycle recursion.  Reference hot-kernel analog: updateX_SOR
(Deff2D.cuh:69-92) x SURVEY §2.6's SP row, one Krylov+multigrid iteration
per three plane passes per shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.kernels.vcycle_vmem import (_dg, _diag_of, _nbsum, _sel,
                                       smoothing_schedule)
from ..ops.kernels.vcycle_tiled import HALO, _smooth_w
from . import fused2d
from .fused2d import (_band_from_windows, _banded_shard, _coef_windows,
                      _halo_strips, _v_cycle_sharded_fused_impl, _win2)

__all__ = ["run_mgcg_sharded_fused", "sharded_fused_cg_ok"]


def sharded_fused_cg_ok(ny_local: int, nx: int, itemsize: int = 4) -> bool:
    """Whether the fused whole-CG-iteration engine can run on this local
    block: whole-window residency (~16 planes in VMEM) runs the
    whole-block passes; larger blocks run the in-shard BANDED passes
    (_cg_steps_sharded_banded) as long as a usable even band exists.
    Deeper levels may band or fall back inside the cycle recursion."""
    band = fused2d.shard_band(ny_local, nx, itemsize)
    return band >= HALO and band % 2 == 0 and ny_local >= HALO


def _pa_cg(beta_ref, live_ref, zb, zn, zs, pb, pn, ps, awb, awn, aws,
           anb, ann, ans, dib, din, dis, p_out, pap_ref, *, H):
    """p = z + beta*p_old on the window; q = A p in-window; partial pap."""
    h = HALO
    b = pl.program_id(0)

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        beta = beta_ref[b, 0]
        pw = _win2(zn, zb, zs) + beta * _win2(pn, pb, ps)
        aww = _win2(awn, awb, aws)
        anw = _win2(ann, anb, ans)
        dgw = _diag_of(_win2(din, dib, dis))
        q = dgw * pw - _nbsum(aww, anw, pw)      # valid off the window edge
        pbnd = pw[h:h + H]
        p_out[0] = pbnd
        pap_ref[b, 0] = jnp.sum(pbnd * q[h:h + H])

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        p_out[0] = pb[0]
        pap_ref[b, 0] = 0.0


def _pb_cg(alpha_ref, live_ref, xb, pb, pn, ps, rb, rn, rs, awb, awn, aws,
           anb, ann, ans, dib, din, dis, x_out, r_out, e_out, rc_out,
           sr_ref, *, H, omega, nu):
    """x += alpha p; r -= alpha q (recomputed); T1 on the fresh r;
    partial sum|r|."""
    h = HALO
    b = pl.program_id(0)

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        alpha = alpha_ref[b, 0]
        pw = _win2(pn, pb, ps)
        aww = _win2(awn, awb, aws)
        anw = _win2(ann, anb, ans)
        diw = _win2(din, dib, dis)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum(aww, anw, pw)      # valid margin 1
        rw = _win2(rn, rb, rs) - alpha * q       # valid margin 1
        x_out[0] = xb[0] + alpha * pb[0]

        ws = smoothing_schedule(omega, nu)
        e = ws[0] * diw * rw
        for w in ws[1:]:
            e = _smooth_w(aww, anw, diw, e, rw, w)
        res = rw - (dgw * e - _nbsum(aww, anw, e))   # margin nu+2 <= HALO

        rbnd = rw[h:h + H]
        r_out[0] = rbnd
        e_out[0] = e[h:h + H]
        sr_ref[b, 0] = jnp.sum(jnp.abs(rbnd))
        resb = res[h:h + H]
        ry = _sel(H // 2, H, res.dtype)
        rx = _sel(resb.shape[1] // 2, resb.shape[1], res.dtype)
        t = _dg(ry, resb, (((1,), (0,)), ((), ())), split="b")
        rc_out[0] = _dg(t, rx, (((1,), (1,)), ((), ())), split="a")

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        x_out[0] = xb[0]
        r_out[0] = rb[0]
        e_out[0] = jnp.zeros_like(e_out[0])
        rc_out[0] = jnp.zeros_like(rc_out[0])
        sr_ref[b, 0] = 0.0


def _pc_cg(live_ref, eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
           dib, din, dis, ecb, ecn, ecs, z_out, rz_ref, *, H, omega, nu,
           over):
    """T2 (prolong + add + post-smooth) producing z; partial rz = <r, z>.
    Same window->coarse-window row mapping as fused2d._t2s_kernel (fine
    window row j maps to coarse window row j // 2: HALO is even and every
    shard starts on an even global row)."""
    h = HALO
    b = pl.program_id(0)

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        ew = _win2(en, eb, es_)
        rw = _win2(rn, rb, rs)
        aww = _win2(awn, awb, aws)
        anw = _win2(ann, anb, ans)
        diw = _win2(din, dib, dis)

        ec = jnp.concatenate([ecn[0], ecb[0], ecs[0]], axis=0)
        wy = H + 2 * h
        ry = _sel(ec.shape[0], wy, ec.dtype)
        t = _dg(ry, ec, (((0,), (0,)), ((), ())), split="b")
        nx = ew.shape[1]
        px = _sel(ec.shape[1], nx, ec.dtype)
        ecw = _dg(t, px, (((1,), (0,)), ((), ())), split="a")

        e = ew + over * ecw
        for w in reversed(smoothing_schedule(omega, nu)):
            e = _smooth_w(aww, anw, diw, e, rw, w)
        zb = e[h:h + H]
        z_out[0] = zb
        rz_ref[b, 0] = jnp.sum(rb[0] * zb)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        z_out[0] = jnp.zeros_like(z_out[0])
        rz_ref[b, 0] = 0.0


def _pc_cg_banded(live_ref, eb, en, es_, rb, rn, rs, awb, awn, aws, anb,
                  ann, ans, dib, din, dis, ec_ref, z_out, rz_ref, *, H,
                  omega, nu, over):
    """In-shard BANDED pass C: T2 with the band-offset coarse mapping of
    fused2d._t2b_kernel (band g's fine window row j maps to row
    (g*H + j) // 2 of the halo-AUGMENTED local coarse plane) + the <r, z>
    partial accumulated across the band grid."""
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        rz_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        ew = jnp.concatenate([en[0, 0], eb[0, 0], es_[0, 0]], axis=0)
        rw = jnp.concatenate([rn[0, 0], rb[0, 0], rs[0, 0]], axis=0)
        aww = jnp.concatenate([awn[0, 0], awb[0, 0], aws[0, 0]], axis=0)
        anw = jnp.concatenate([ann[0, 0], anb[0, 0], ans[0, 0]], axis=0)
        diw = jnp.concatenate([din[0, 0], dib[0, 0], dis[0, 0]], axis=0)

        ec = ec_ref[0]                           # (ny_l//2 + HALO, nxc)
        wy = H + 2 * h
        rows = jax.lax.broadcasted_iota(jnp.int32, (wy, ec.shape[0]), 0) \
            + g * H
        cols = jax.lax.broadcasted_iota(jnp.int32, (wy, ec.shape[0]), 1)
        sel_y = ((rows // 2) == cols).astype(ec.dtype)
        t = _dg(sel_y, ec, (((1,), (0,)), ((), ())), split="b")
        nx = ew.shape[1]
        px = _sel(ec.shape[1], nx, ec.dtype)
        ecw = _dg(t, px, (((1,), (0,)), ((), ())), split="a")

        e = ew + over * ecw
        for w in reversed(smoothing_schedule(omega, nu)):
            e = _smooth_w(aww, anw, diw, e, rw, w)
        zb = e[h:h + H]
        z_out[0, 0] = zb
        rz_ref[b, 0] += jnp.sum(rb[0, 0] * zb)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        z_out[0, 0] = jnp.zeros_like(z_out[0, 0])


def _cg_steps_sharded_banded(sharded_levels, replicated_levels, coef_wins,
                             x, r, p, rz, active, stop_sum, hi_sum, k, *,
                             band, nu, omega, coarse_iters, over, axis_name,
                             reduce_any, interpret, tail=None):
    """In-shard BANDED fused sharded CG iterations: local blocks past the
    whole-window VMEM cap run each PCG iteration as the banded-engine
    passes of ops/kernels/cgstep_tiled.py (grid (B, G), partials
    accumulated across bands in SMEM) with shard-edge halos from the ring
    neighbors (_banded_shard's ppermute) instead of zeros, and the coarse
    correction from the sharded fused cycle recursion at level 1.  Same
    contract as :func:`_cg_steps_sharded`; p's halo strips are maintained
    analytically (pointwise update), so an iteration costs 5 HALO-strip
    ppermutes (z, r@B, e, r@C, ec)."""
    from ..ops.kernels.cgstep_tiled import _pass_a, _pass_b
    from ..ops.kernels.vcycle_tiled import _band_specs

    bsz, ny_l, nx = x.shape
    g_total = ny_l // band
    dtype = x.dtype
    coefs = coef_wins[0]
    cb = []
    for i in range(0, 9, 3):
        cb.extend(_band_from_windows(coefs[i], coefs[i + 1], coefs[i + 2],
                                     band))

    body, halo = _band_specs(g_total, band, nx)
    cspec = [body, halo, halo]
    scal_in = pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                           memory_space=pltpu.SMEM)
    scal_out = scal_in
    win_bytes = (band + 2 * HALO) * nx * dtype.itemsize
    nxc = nx // 2
    aug_rows = ny_l // 2 + HALO

    def params(extra=0):
        if interpret:
            return {}
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(40 * win_bytes + extra), 16 << 20),
                                 112 << 20))}

    scal_shape = jax.ShapeDtypeStruct((bsz, 1), dtype)
    band_shape = jax.ShapeDtypeStruct((bsz, g_total, band, nx), dtype)
    rc_shape = jax.ShapeDtypeStruct((bsz, g_total, band // 2, nxc), dtype)
    rc_spec = pl.BlockSpec((1, 1, band // 2, nxc),
                           lambda b, g: (b, g, 0, 0),
                           memory_space=pltpu.VMEM)
    ec_spec = pl.BlockSpec((1, aug_rows, nxc), lambda b, g: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    pa = pl.pallas_call(
        functools.partial(_pass_a, H=band),
        grid=(bsz, g_total),
        in_specs=[scal_in, scal_in] + cspec * 2 + cspec * 3,
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret, **params())
    pb_ = pl.pallas_call(
        functools.partial(_pass_b, H=band, omega=omega, nu=nu),
        grid=(bsz, g_total),
        in_specs=[scal_in, scal_in, body] + cspec * 2 + cspec * 3,
        out_shape=[band_shape, band_shape, band_shape, rc_shape, scal_shape],
        out_specs=[body, body, body, rc_spec, scal_out],
        interpret=interpret, **params())
    pc = pl.pallas_call(
        functools.partial(_pc_cg_banded, H=band, omega=omega, nu=nu,
                          over=over),
        grid=(bsz, g_total),
        in_specs=[scal_in] + cspec * 2 + cspec * 3 + [ec_spec],
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(extra=4 * aug_rows * nxc * dtype.itemsize))

    def psum_s(v):
        return jax.lax.psum(v, axis_name)

    def bandit(a):
        return _banded_shard(a, band, axis_name)

    def flat(a):
        return a.reshape(bsz, ny_l, nx)

    sr0 = psum_s(jnp.sum(jnp.abs(r), axis=(-2, -1)))
    live0 = (active > 0) & (sr0 > stop_sum) & (sr0 < hi_sum)
    zeros_s = jnp.zeros((), dtype)

    def cond(c):
        return (c[0] < k) & reduce_any(c[-1])

    def body_fn(c):
        (i, x, r, z, p, rz_p, rz_c, kdone, sr, live) = c
        livef = live.astype(dtype)[:, None]
        lv4 = live[:, None, None, None]
        beta = jnp.where((i > 0) & live & (rz_p > 0),
                         rz_c / jnp.where(rz_p > 0, rz_p, 1.0), zeros_s)
        zb, zn, zs = bandit(z)
        pb, pn, ps = bandit(p)
        p_new_b, pap_l = pa(beta[:, None].astype(dtype), livef,
                            zb, zn, zs, pb, pn, ps, *cb)
        # p's halo strips update pointwise — no second exchange needed
        bxp = beta[:, None, None, None]
        pn2 = jnp.where(lv4, zn + bxp * pn, pn)
        ps2 = jnp.where(lv4, zs + bxp * ps, ps)
        pap = psum_s(pap_l[:, 0])
        alpha = jnp.where(live & (pap > 0),
                          rz_c / jnp.where(pap > 0, pap, 1.0), zeros_s)

        rb, rn, rs = bandit(r)
        x_new_b, r_new_b, e_bb, rc_b, sr_l = pb_(
            alpha[:, None].astype(dtype), livef,
            x.reshape(bsz, g_total, band, nx),
            p_new_b, pn2, ps2, rb, rn, rs, *cb)

        rc = rc_b.reshape(bsz, ny_l // 2, nxc)
        e_c = _v_cycle_sharded_fused_impl(
            sharded_levels, replicated_levels, coef_wins, rc, nu=nu,
            omega=omega, coarse_iters=coarse_iters, over=over,
            axis_name=axis_name, level=1, interpret=interpret, tail=tail)
        ecn, ecs = _halo_strips(e_c, axis_name, HALO // 2)
        ec_aug = jnp.concatenate([ecn, e_c, ecs], axis=1)

        eb, en, es_ = bandit(flat(e_bb))
        r_new = flat(r_new_b)
        rb2, rn2, rs2 = bandit(r_new)
        z_new_b, rz_l = pc(livef, eb, en, es_, rb2, rn2, rs2, *cb, ec_aug)
        rz_out = psum_s(rz_l[:, 0])
        sr_out = psum_s(sr_l[:, 0])

        sr_new = jnp.where(live, sr_out, sr)
        rz_new = jnp.where(live, rz_out, rz_c)
        rz_p_new = jnp.where(live, rz_c, rz_p)
        z_keep = jnp.where(live[:, None, None], flat(z_new_b), z)
        kdone = kdone + live.astype(jnp.int32)
        live = live & (sr_new > stop_sum) & (sr_new < hi_sum)
        return (i + 1, flat(x_new_b), r_new, z_keep, flat(p_new_b),
                rz_p_new, rz_new, kdone, sr_new, live)

    init = (jnp.asarray(0, jnp.int32), x, r, p, p,
            rz.astype(dtype), rz.astype(dtype),
            jnp.zeros((bsz,), jnp.int32), sr0, live0)
    out = jax.lax.while_loop(cond, body_fn, init)
    (_i, x, r, _z, p, _rzp, rz_c, kdone, _sr, _live) = out
    return x, r, p, rz_c, kdone


def _spec(rows, nx):
    return pl.BlockSpec((1, rows, nx), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _sspec(bsz):
    return pl.BlockSpec((bsz, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)


def _cg_steps_sharded(sharded_levels, replicated_levels, coef_wins, x, r, p,
                      rz, active, stop_sum, hi_sum, k, *, nu, omega,
                      coarse_iters, over, axis_name, reduce_any, interpret,
                      tail=None):
    """Up to ``k`` fused sharded MGCG iterations; same contract as
    cgstep_vmem.cg_steps_pallas per local (B, ny_l, nx) batch, scalars
    psum'd over ``axis_name``.  Returns (x, r, p, rz, kdone)."""
    bsz, ny_l, nx = x.shape
    dtype = x.dtype
    coefs = coef_wins[0]

    body, halo = _spec(ny_l, nx), _spec(HALO, nx)
    cspec = [body, halo, halo]
    scal_in = _sspec(bsz)
    scal_out = pl.BlockSpec((bsz, 1), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)
    win_bytes = (ny_l + 2 * HALO) * nx * dtype.itemsize
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(40 * win_bytes), 112 << 20))}
    scal_shape = jax.ShapeDtypeStruct((bsz, 1), dtype)
    plane_shape = jax.ShapeDtypeStruct((bsz, ny_l, nx), dtype)
    rc_shape = jax.ShapeDtypeStruct((bsz, ny_l // 2, nx // 2), dtype)

    pa = pl.pallas_call(
        functools.partial(_pa_cg, H=ny_l),
        grid=(bsz,),
        in_specs=[scal_in, scal_in] + cspec * 2 + cspec * 3,
        out_shape=[plane_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret, **params)
    pb_ = pl.pallas_call(
        functools.partial(_pb_cg, H=ny_l, omega=omega, nu=nu),
        grid=(bsz,),
        in_specs=[scal_in, scal_in, body] + cspec * 2 + cspec * 3,
        out_shape=[plane_shape, plane_shape, plane_shape, rc_shape,
                   scal_shape],
        out_specs=[body, body, body, _spec(ny_l // 2, nx // 2), scal_out],
        interpret=interpret, **params)
    hc = _spec(HALO // 2, nx // 2)
    pc = pl.pallas_call(
        functools.partial(_pc_cg, H=ny_l, omega=omega, nu=nu, over=over),
        grid=(bsz,),
        in_specs=[scal_in] + cspec * 2 + cspec * 3
        + [_spec(ny_l // 2, nx // 2), hc, hc],
        out_shape=[plane_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret, **params)

    def psum_s(v):
        return jax.lax.psum(v, axis_name)

    sr0 = psum_s(jnp.sum(jnp.abs(r), axis=(-2, -1)))
    live0 = (active > 0) & (sr0 > stop_sum) & (sr0 < hi_sum)
    pn0, ps0 = _halo_strips(p, axis_name, HALO)
    zeros_s = jnp.zeros((), dtype)

    def cond(c):
        return (c[0] < k) & reduce_any(c[-1])

    def body_fn(c):
        (i, x, r, z, p, pn, ps, rz_p, rz_c, kdone, sr, live) = c
        livef = live.astype(dtype)[:, None]
        beta = jnp.where((i > 0) & live & (rz_p > 0),
                         rz_c / jnp.where(rz_p > 0, rz_p, 1.0), zeros_s)
        zn, zs = _halo_strips(z, axis_name, HALO)
        p_new, pap_l = pa(beta[:, None].astype(dtype), livef,
                          z, zn, zs, p, pn, ps, *coefs)
        # the p window is maintained analytically (pointwise update)
        bxp = beta[:, None, None]
        pn_new = jnp.where(live[:, None, None], zn + bxp * pn, pn)
        ps_new = jnp.where(live[:, None, None], zs + bxp * ps, ps)
        pap = psum_s(pap_l[:, 0])
        alpha = jnp.where(live & (pap > 0),
                          rz_c / jnp.where(pap > 0, pap, 1.0), zeros_s)

        rn, rs = _halo_strips(r, axis_name, HALO)
        x_new, r_new, e_b, rc, sr_l = pb_(
            alpha[:, None].astype(dtype), livef, x,
            p_new, pn_new, ps_new, r, rn, rs, *coefs)

        e_c = _v_cycle_sharded_fused_impl(
            sharded_levels, replicated_levels, coef_wins, rc, nu=nu,
            omega=omega, coarse_iters=coarse_iters, over=over,
            axis_name=axis_name, level=1, interpret=interpret, tail=tail)
        ecn, ecs = _halo_strips(e_c, axis_name, HALO // 2)
        en, es_ = _halo_strips(e_b, axis_name, HALO)
        rn2, rs2 = _halo_strips(r_new, axis_name, HALO)
        z_new, rz_l = pc(livef, e_b, en, es_, r_new, rn2, rs2, *coefs,
                         e_c, ecn, ecs)
        rz_out = psum_s(rz_l[:, 0])
        sr_out = psum_s(sr_l[:, 0])

        sr_new = jnp.where(live, sr_out, sr)
        rz_new = jnp.where(live, rz_out, rz_c)
        rz_p_new = jnp.where(live, rz_c, rz_p)
        z_keep = jnp.where(live[:, None, None], z_new, z)
        kdone = kdone + live.astype(jnp.int32)
        live = live & (sr_new > stop_sum) & (sr_new < hi_sum)
        return (i + 1, x_new, r_new, z_keep, p_new, pn_new, ps_new,
                rz_p_new, rz_new, kdone, sr_new, live)

    init = (jnp.asarray(0, jnp.int32), x, r, p, p, pn0, ps0,
            rz.astype(dtype), rz.astype(dtype),
            jnp.zeros((bsz,), jnp.int32), sr0, live0)
    out = jax.lax.while_loop(cond, body_fn, init)
    (_i, x, r, _z, p, _pn, _ps, _rzp, rz_c, kdone, _sr, _live) = out
    return x, r, p, rz_c, kdone


def run_mgcg_sharded_fused(c_l, s_l, x0_l, *, tol, max_iter, check_every,
                           criterion, nu, mg_omega, coarse_iters, min_size,
                           over, axis_name, batch_axis=None,
                           interpret=False, first_window=1):
    """Sharded MGCG with the fused whole-CG-iteration engine: the sharded
    twin of solvers/multigrid._run_mgcg_fused (chunked checks, true-residual
    refresh + CG restart, best-iterate divergence net, last-iterate
    return), with every monitor psum'd over ``axis_name`` and the batched
    trip count reduced over ``batch_axis``.  Runs INSIDE shard_map on the
    local blocks; the caller (parallel/halo._mgcg_runner) owns the mesh and
    the solver-selection guard (sharded_fused_cg_ok)."""
    from .halo import (_build_sharded_hierarchy_2d, _deff_local,
                       _neighbor_sum_2d_local)
    from ..solvers.driver import SolveResult

    if x0_l.dtype == jnp.float32:
        ctx = jax.enable_x64(False)         # Mosaic cannot lower weak-i64
    else:                                   # literals from an x64 trace
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        return _run_impl(c_l, s_l, x0_l, _build_sharded_hierarchy_2d,
                         _deff_local, _neighbor_sum_2d_local, SolveResult,
                         tol=tol, max_iter=max_iter, check_every=check_every,
                         criterion=criterion, nu=nu, mg_omega=mg_omega,
                         coarse_iters=coarse_iters, min_size=min_size,
                         over=over, axis_name=axis_name,
                         batch_axis=batch_axis, interpret=interpret,
                         first_window=first_window)


def _run_impl(c_l, s_l, x0_l, build_hier, deff_local, nbsum_local,
              SolveResult, *, tol, max_iter, check_every, criterion, nu,
              mg_omega, coarse_iters, min_size, over, axis_name, batch_axis,
              interpret, first_window=1):
    batched = x0_l.ndim == 3
    xb = x0_l if batched else x0_l[None]
    cb = jax.tree.map(lambda a: a if batched else a[None], c_l)
    bsz, ny_l, nx = xb.shape
    dtype = xb.dtype
    tol_ = jnp.asarray(tol, dtype)

    sharded_levels, replicated_levels = build_hier(
        cb, ny_l, axis_name, min_size=min_size)
    coef_wins = _coef_windows(sharded_levels, axis_name)
    tail = fused2d.build_fused_tail(sharded_levels, axis_name, min_size)

    def psum_s(v):
        return jax.lax.psum(v, axis_name)

    if batched and batch_axis is not None:
        def reduce_any(flags):
            return jax.lax.psum(jnp.any(flags).astype(jnp.int32),
                                batch_axis) > 0
    else:
        def reduce_any(flags):
            return jnp.any(flags)

    def matvec(v):
        return cb.diag * v - nbsum_local(cb, v, axis_name)

    def dot(u, v):
        return psum_s(jnp.sum(u * v, axis=(-2, -1)))

    npts = jnp.asarray(ny_l * nx, dtype) * jax.lax.axis_size(axis_name)

    def mean_abs(v):
        return psum_s(jnp.sum(jnp.abs(v), axis=(-2, -1))) / npts

    def deff_fn(x):
        d = deff_local(s_l, x if batched else x[0], axis_name)
        return d if batched else d[None]

    def cycle(r):
        return _v_cycle_sharded_fused_impl(
            sharded_levels, replicated_levels, coef_wins, r, nu=nu,
            omega=mg_omega, coarse_iters=coarse_iters, over=over,
            axis_name=axis_name, level=0, interpret=interpret, tail=tail)

    band = fused2d.shard_band(ny_l, nx, dtype.itemsize)

    def cg_steps(x, r, p, rz, active, stop_s, hi_s, k):
        if band == ny_l:
            return _cg_steps_sharded(
                sharded_levels, replicated_levels, coef_wins, x, r, p, rz,
                active, stop_s, hi_s, k, nu=nu, omega=mg_omega,
                coarse_iters=coarse_iters, over=over, axis_name=axis_name,
                reduce_any=reduce_any, interpret=interpret, tail=tail)
        return _cg_steps_sharded_banded(
            sharded_levels, replicated_levels, coef_wins, x, r, p, rz,
            active, stop_s, hi_s, k, band=band, nu=nu, omega=mg_omega,
            coarse_iters=coarse_iters, over=over, axis_name=axis_name,
            reduce_any=reduce_any, interpret=interpret, tail=tail)

    b_p = cb.b
    bscale = mean_abs(b_p) if criterion == "relresidual" else None
    if criterion == "residual":
        stop_sum = jnp.full((bsz,), tol, dtype) * npts
    elif criterion == "relresidual":
        stop_sum = tol_ * bscale * npts
    else:
        stop_sum = jnp.zeros((bsz,), dtype)

    def expand(v):
        return v[:, None, None]

    def fresh(xp):
        r = b_p - matvec(xp)
        z = cycle(r)
        return r, z, dot(r, z)

    def cond(c):
        pc, it = c[8], c[5]
        return reduce_any(tol_ < jnp.abs(pc)) & (it < max_iter)

    def body(c):
        (x, r, p, rz, _z, it, deff, deff_old, pc, conv, iters, x_best, best,
         bad) = c
        active = tol_ < jnp.abs(pc)
        k = jnp.where(it == 0, jnp.minimum(first_window, max_iter),
                      jnp.minimum(check_every, max_iter - it))
        hi_sum = 1e3 * best * npts
        x, r, p, rz, kdone = cg_steps(x, r, p, rz, active.astype(dtype),
                                      stop_sum, hi_sum, k)
        it_new = it + k
        iters = iters + jnp.where(active, kdone, 0)
        # force the final check on a max_iter-truncated window — see
        # solvers/multigrid._run_mgcg_fused
        do_check = (((it_new - first_window) % check_every) == 0) \
            | (it_new >= max_iter)

        r_true, z_true, rz_true = fresh(x)
        refresh = expand(do_check & active)
        r = jnp.where(refresh, r_true, r)
        p = jnp.where(refresh, z_true, p)
        rz = jnp.where(do_check & active, rz_true, rz)

        r_mean = mean_abs(r_true)
        improved = do_check & active & (r_mean < best)
        x_best = jnp.where(expand(improved), x, x_best)
        best = jnp.where(improved, r_mean, best)
        diverged = do_check & active & (
            ~jnp.isfinite(r_mean) | (r_mean > 1e3 * best))

        deff_new = deff_fn(x)
        if criterion == "deff":
            pc_new = (deff_old - deff_new) / deff_old
        elif criterion == "relresidual":
            pc_new = r_mean / bscale
        else:
            pc_new = r_mean

        upd = do_check & active
        deff = jnp.where(upd, deff_new, deff)
        if criterion == "deff":
            deff_old = jnp.where(upd, deff_new, deff_old)
        pc = jnp.where(upd, pc_new, pc)
        pc = jnp.where(diverged, jnp.zeros_like(pc), pc)
        conv = jnp.where(upd, pc_new, conv)
        bad = bad | diverged
        return (x, r, p, rz, _z, it_new, deff, deff_old, pc, conv, iters,
                x_best, best, bad)

    r0, z0, rz0 = fresh(xb)
    scal = lambda v: jnp.full((bsz,), v, dtype)
    init = (xb, r0, z0, rz0, jnp.zeros((), dtype), jnp.asarray(0, jnp.int32),
            scal(1.0), scal(5.0), scal(100.0), scal(100.0),
            jnp.zeros((bsz,), jnp.int32), xb, mean_abs(r0),
            jnp.zeros((bsz,), bool))
    out = jax.lax.while_loop(cond, body, init)
    (x, r, p, rz, _z, it, deff, deff_old, pc, conv, iters, x_best, best,
     bad) = out
    x_out = jnp.where(expand(bad), x_best, x)
    deff_out = deff_fn(x_out)
    if criterion == "relresidual":
        conv = jnp.where(bad, best / bscale, conv)
    elif criterion != "deff":
        conv = jnp.where(bad, best, conv)
    if not batched:
        return SolveResult(x=x_out[0], deff=deff_out[0], conv=conv[0],
                           iters=iters[0])
    return SolveResult(x=x_out, deff=deff_out, conv=conv, iters=iters)

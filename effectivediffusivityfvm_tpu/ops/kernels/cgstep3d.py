"""Banded 3D whole-CG-iteration engine: the voxel twin of cgstep_tiled.py.

Each MGCG iteration on a (B, nz, ny, nx) batch runs as THREE z-slab Pallas
passes with scalar reductions carried in SMEM between them, the whole
iteration loop one ``lax.while_loop`` with the same per-image early exit /
divergence-tripwire / freeze contract as the 2D engines:

  A  p = z + beta*p_old (windowed, halos exact), q = A p in-window,
     accumulate pap = <p, q> across the sequential slab grid
  B  x += alpha*p, r -= alpha*q (q recomputed in-window), then T1 of the
     banded 3D cycle (pre-smooth + residual + 2x2x2 restriction) on the
     fresh r, accumulating sum|r| for the early exit
  C  coarse tail (vcycle3d.coarse_tail3 — recursive: at 256^3 the 128^3
     level bands again) + T2 (prolong + add + post-smooth) producing z,
     accumulating rz = <r, z>

Window-validity: q needs one neighbor slice; nu smoothing sweeps + the
level residual need nu+1 more — HALO_Z = 4 covers nu <= 3 (see
vcycle3d.py's invariant).

The 3D solvers previously ran all of this as XLA ops (~38 ms/iteration at
256^3); reference analog: the reference is strictly 2D — this is the
framework's scale axis (SURVEY §6, BASELINE config 5).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm3d import StencilCoeffs3D
from .vcycle_vmem import _diag_of, smoothing_schedule, x32_kernel
from .vcycle3d import (HALO_Z, _coarse_specs3, _coeffs_from_dwin,
                       _d_halo_specs3, _dwin5, _edge_flags, _hwin3,
                       _mf_flags, _nbsum3, _prolong3_yx, _restrict3_yx,
                       _smooth3, _specs3, banded3, coarse_tail3)

__all__ = ["cg_steps3d_tiled"]


def _scal_spec(bsz):
    return pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                        memory_space=pltpu.SMEM)


def _cwins(crefs, flags, *, mf, geom):
    """Level-0 stencil windows (aw, an, au, diag_inv), each
    (BZ + 2*HALO_Z, ny, nx): stored-coefficient ``_hwin3`` loads (12 refs),
    or the MATRIX-FREE recompute from a double-halo D window (5 refs of the
    same flattened D array; ``geom = (fx, fy, fz, bcf, nxr)`` — the
    assembly factors for the UNPADDED domain).  The recompute is ulp-equal
    to the stored windows on real voxels (tests/test_kernels3d.py) and cuts
    the per-pass coefficient HBM reads 4 windows -> ~1.3 window-equivalents
    of D."""
    f1, l1, f2, l2 = flags
    if mf:
        db, dn2, dn1, ds1, ds2 = crefs
        dw = _dwin5(db, dn2, dn1, ds1, ds2, f1=f1, l1=l1, f2=f2, l2=l2)
        fx, fy, fz, bcf, nxr = geom
        return _coeffs_from_dwin(dw, fx=fx, fy=fy, fz=fz, bcf=bcf, nxr=nxr)
    awb, awn, aws, anb, ann, ans, aub, aun, aus, dib, din, dis = crefs
    return (_hwin3(awn, awb, aws, f1, l1), _hwin3(ann, anb, ans, f1, l1),
            _hwin3(aun, aub, aus, f1, l1), _hwin3(din, dib, dis, f1, l1))


def _all_flags(qblk, g_total):
    fst, lst = _edge_flags(g_total)
    f2, l2 = _mf_flags(qblk, g_total)
    return fst, lst, f2, l2


def _pass_a3(beta_ref, live_ref, zb, zn, zs, pb, pn, ps, *rest,
             BZ, g_total, qblk, mf, geom):
    crefs, (p_out, pap_ref) = rest[:-2], rest[-2:]
    h = HALO_Z
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags(qblk, g_total)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        pap_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        beta = beta_ref[b, 0]
        pw = (_hwin3(zn, zb, zs, fst, lst)
              + beta * _hwin3(pn, pb, ps, fst, lst))
        aww, anw, auw, diw = _cwins(crefs, flags, mf=mf, geom=geom)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum3(aww, anw, auw, pw)     # valid margin 1
        pbnd = pw[h:h + BZ]
        p_out[...] = pbnd
        pap_ref[b, 0] += jnp.sum(pbnd * q[h:h + BZ])

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        p_out[...] = pb[...]


def _pass_b3(alpha_ref, live_ref, xb, pb, pn, ps, rb, rn, rs, *rest,
             BZ, nyc, nxc, omega, nu, g_total, qblk, mf, geom):
    crefs = rest[:-5]
    x_out, r_out, e_out, rc_out, sr_ref = rest[-5:]
    h = HALO_Z
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags(qblk, g_total)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        sr_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        alpha = alpha_ref[b, 0]
        pw = _hwin3(pn, pb, ps, fst, lst)
        aww, anw, auw, diw = _cwins(crefs, flags, mf=mf, geom=geom)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum3(aww, anw, auw, pw)     # valid margin 1
        rw = _hwin3(rn, rb, rs, fst, lst) - alpha * q   # valid margin 1
        x_out[...] = xb[...] + alpha * pb[...]

        ws = smoothing_schedule(omega, nu)
        e = ws[0] * diw * rw
        for w in ws[1:]:
            e = _smooth3(aww, anw, auw, diw, e, rw, w)
        res = rw - (dgw * e - _nbsum3(aww, anw, auw, e))  # margin nu+2 <= HZ

        rbnd = rw[h:h + BZ]
        r_out[...] = rbnd
        e_out[...] = e[h:h + BZ]
        sr_ref[b, 0] += jnp.sum(jnp.abs(rbnd))
        resb = res[h:h + BZ]
        t = resb.reshape(BZ // 2, 2, resb.shape[1], resb.shape[2]).sum(axis=1)
        rc_out[...] = _restrict3_yx(t, nyc, nxc)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        x_out[...] = xb[...]
        r_out[...] = rb[...]
        e_out[...] = jnp.zeros_like(e_out[...])
        rc_out[...] = jnp.zeros_like(rc_out[...])


def _pass_c3(live_ref, eb, en, es_, rb, rn, rs, *rest,
             BZ, omega, nu, over, g_total, qblk, mf, geom):
    crefs = rest[:-5]
    ecb, ecn, ecs, z_out, rz_ref = rest[-5:]
    h = HALO_Z
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags(qblk, g_total)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        rz_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        ew = _hwin3(en, eb, es_, fst, lst)
        rw = _hwin3(rn, rb, rs, fst, lst)
        aww, anw, auw, diw = _cwins(crefs, flags, mf=mf, geom=geom)

        ecw = _hwin3(ecn, ecb, ecs, fst, lst)
        ny, nx = ew.shape[1], ew.shape[2]
        t = _prolong3_yx(ecw, ny, nx)
        nzh = t.shape[0]
        t = jnp.broadcast_to(t[:, None], (nzh, 2, ny, nx)).reshape(
            2 * nzh, ny, nx)

        e = ew + over * t
        for w in reversed(smoothing_schedule(omega, nu)):
            e = _smooth3(aww, anw, auw, diw, e, rw, w)
        zb = e[h:h + BZ]
        if mf:
            # matrix-free pads carry diag 0 (not the stored identity), so
            # the prolongated correction at D == 0 voxels would never decay
            # and p/x would drift there; pin z to 0 on non-physical voxels
            # (their r is 0 identically, so rz is unaffected)
            zb = jnp.where(crefs[0][...] > 0, zb, jnp.zeros_like(zb))
        z_out[...] = zb
        rz_ref[b, 0] += jnp.sum(rb[...] * zb)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        z_out[...] = jnp.zeros_like(z_out[...])


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "band", "interpret",
                                             "geom"))
@x32_kernel
def cg_steps3d_tiled(levels: List[StencilCoeffs3D], x: jax.Array,
                     r: jax.Array, p: jax.Array, rz: jax.Array,
                     active: jax.Array, stop: jax.Array, hi: jax.Array,
                     k: jax.Array, *, omega: float = 0.8, nu: int = 2,
                     coarse_iters: int = 32, over: float = 1.8,
                     band: int = 16, interpret: bool = False,
                     d_field=None, geom=None):
    """Run up to ``k`` banded 3D MGCG iterations on a (B, nz, ny, nx) batch.

    Same contract as :func:`cgstep_vmem.cg_steps_pallas` / 2D
    ``cg_steps_tiled`` (levels from ``build_hierarchy_3d(pad_levels=True)``
    on an operator padded to ``pad_shape_3d``; nz % band == 0): returns
    (x, r, p, rz, k_done).

    MATRIX-FREE level 0: pass ``d_field`` (the PADDED (B, nz, ny, nx)
    diffusivity volume, zero in the pads, strictly positive on real voxels)
    + static ``geom = (fx, fy, fz, bcf, nxr)`` (assembly factors for the
    UNPADDED shape, see vcycle3d._coeffs_from_dwin) and the three passes
    recompute the level-0 stencil windows in-VMEM from a double-halo D
    window instead of streaming 4 stored coefficient fields — level-0
    coefficient HBM reads drop 12 -> ~3.9 window-equivalents per iteration.
    Only valid for the plain unmasked, unequilibrated operator
    ``fvm_coefficients_3d(d, cl, cr)`` (levels[0] must be exactly that,
    padded); levels[1:] stay stored."""
    bsz, nz, ny, nx = x.shape
    if nz % band or band % HALO_Z or nu > HALO_Z - 1:
        raise ValueError(f"cg_steps3d_tiled: nz={nz} % band={band}, band % "
                         f"{HALO_Z} == 0, nu<={HALO_Z - 1} required")
    c0 = levels[0]
    g_total = nz // band
    dtype = x.dtype
    ny1, nx1 = levels[1].diag.shape[-2:]
    mf = d_field is not None
    if mf and geom is None:
        raise ValueError("cg_steps3d_tiled: d_field requires geom")

    body, north, south = _specs3(bsz, g_total, band, ny, nx)
    if mf:
        db = banded3(d_field.astype(dtype), band)
        north2, south2 = _d_halo_specs3(bsz, g_total, band, ny, nx)
        coef_ops = [db, db, db, db, db]
        coef_specs = [body, north2, north, south, south2]
        # pin the non-physical (D == 0) pad voxels of the incoming state to
        # 0: the initial p comes from the stored-coefficient refresh cycle,
        # whose identity pad rows leak prolongated corrections there (see
        # _pass_c3's matching in-loop pin)
        ind = (d_field > 0).astype(dtype)
        x, r, p = x * ind, r * ind, p * ind
    else:
        coef_ops = []
        for plane in (c0.a_w, c0.a_n, c0.a_u, c0.diag_inv):
            pf = banded3(plane.reshape(x.shape), band)
            coef_ops.extend((pf, pf, pf))
        coef_specs = None

    cspec = [body, north, south]
    scal = _scal_spec(bsz)
    scal_out = pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                            memory_space=pltpu.SMEM)
    win_bytes = (band + 2 * HALO_Z) * ny * nx * dtype.itemsize

    def params(extra=0):
        if interpret:
            return {}
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(40 * win_bytes + extra), 16 << 20),
                                 112 << 20))}

    scal_shape = jax.ShapeDtypeStruct((bsz, 1), dtype)
    band_shape = jax.ShapeDtypeStruct((bsz * nz, ny, nx), dtype)
    rc_shape = jax.ShapeDtypeStruct((bsz * g_total * (band // 2), ny1, nx1),
                                    dtype)
    ecb_spec, ecn_spec, ecs_spec = _coarse_specs3(bsz, g_total, band,
                                                  ny1, nx1)
    cf_specs = coef_specs if mf else cspec * 4
    kargs = dict(g_total=g_total, qblk=band // HALO_Z, mf=mf, geom=geom)

    pa = pl.pallas_call(
        functools.partial(_pass_a3, BZ=band, **kargs),
        grid=(bsz, g_total),
        in_specs=[scal, scal] + cspec * 2 + cf_specs,
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(),
    )
    pb_ = pl.pallas_call(
        functools.partial(_pass_b3, BZ=band, nyc=ny1, nxc=nx1, omega=omega,
                          nu=nu, **kargs),
        grid=(bsz, g_total),
        in_specs=[scal, scal, body] + cspec * 2 + cf_specs,
        out_shape=[band_shape, band_shape, band_shape, rc_shape, scal_shape],
        out_specs=[body, body, body, ecb_spec, scal_out],
        interpret=interpret,
        **params(),
    )
    pc = pl.pallas_call(
        functools.partial(_pass_c3, BZ=band, omega=omega, nu=nu, over=over,
                          **kargs),
        grid=(bsz, g_total),
        in_specs=[scal] + cspec * 2 + cf_specs + [ecb_spec, ecn_spec,
                                                  ecs_spec],
        out_shape=[band_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(extra=3 * (band // 2 + HALO_Z) * ny1 * nx1
                 * dtype.itemsize),
    )

    stop_ = stop[:, 0]
    hi_ = hi[:, 0]
    zeros_s = jnp.zeros((), dtype)

    def to_b(a):
        return a.reshape(bsz * nz, ny, nx)

    sr0 = jnp.sum(jnp.abs(r), axis=(-3, -2, -1))
    live0 = (active[:, 0] > 0) & (sr0 > stop_) & (sr0 < hi_)

    def cond(c):
        return (c[0] < k) & jnp.any(c[-1])

    def body_fn(c):
        (i, xb, rb, pb, zb, rz_p, rz_c, kdone, sr, live) = c
        livef = live.astype(dtype)[:, None]
        beta = jnp.where((i > 0) & live & (rz_p > 0),
                         rz_c / jnp.where(rz_p > 0, rz_p, 1.0), zeros_s)
        p_new, pap = pa(beta[:, None].astype(dtype), livef,
                        zb, zb, zb, pb, pb, pb, *coef_ops)
        pap = pap[:, 0]
        alpha = jnp.where(live & (pap > 0),
                          rz_c / jnp.where(pap > 0, pap, 1.0), zeros_s)
        x_new, r_new, e_b, rc_b, sr_out = pb_(
            alpha[:, None].astype(dtype), livef, xb,
            p_new, p_new, p_new, rb, rb, rb, *coef_ops)
        e_c = coarse_tail3(levels, rc_b, bsz, omega=omega, nu=nu,
                           coarse_iters=coarse_iters, over=over,
                           interpret=interpret)
        ecf = e_c[:, : nz // 2].reshape((-1, ny1, nx1))
        z_new, rz_out = pc(livef, e_b, e_b, e_b, r_new, r_new, r_new,
                           *coef_ops, ecf, ecf, ecf)
        sr_new = jnp.where(live, sr_out[:, 0], sr)
        rz_new = jnp.where(live, rz_out[:, 0], rz_c)
        rz_p_new = jnp.where(live, rz_c, rz_p)
        z_keep = jnp.where(live.reshape(bsz, 1, 1, 1),
                           z_new.reshape(bsz, nz, ny, nx),
                           zb.reshape(bsz, nz, ny, nx)).reshape(
                               bsz * nz, ny, nx)
        kdone = kdone + live.astype(jnp.int32)
        live = live & (sr_new > stop_) & (sr_new < hi_)
        return (i + 1, x_new, r_new, p_new, z_keep, rz_p_new, rz_new,
                kdone, sr_new, live)

    init = (jnp.asarray(0, jnp.int32), to_b(x), to_b(r), to_b(p), to_b(p),
            rz[:, 0].astype(dtype), rz[:, 0].astype(dtype),
            jnp.zeros((bsz,), jnp.int32), sr0, live0)
    out = jax.lax.while_loop(cond, body_fn, init)
    (_i, xb, rb, pb, _zb, _rzp, rz_c, kdone, _sr, _live) = out

    def unflat(a):
        return a.reshape(bsz, nz, ny, nx)

    return (unflat(xb), unflat(rb), unflat(pb), rz_c[:, None],
            kdone[:, None])

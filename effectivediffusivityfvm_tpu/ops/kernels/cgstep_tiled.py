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

Halo reads are IN-ARRAY (the 2D twin of vcycle3d's banded specs): fields
stay flattened (B*G*band, nx) and the north/south halo BlockSpecs alias
the same array with clamped index maps — the last HALO rows of band g-1
and the first HALO rows of band g+1.  Global-edge bands zero-mask their
(arbitrarily aliased) halo blocks in-kernel (:func:`_hwin2`).  No halo
strips are materialized between passes: the old per-iteration XLA concat
glue (6 field-halo set builds per CG iteration) is gone.  The sharded
engine (parallel/fused2d_cg.py) reuses these kernels with SEPARATE halo
arrays carrying real ppermute'd neighbor-shard rows — it passes
``g_total=None`` (the default) so no edge masking is applied.

Window-validity: q needs one neighbor row; nu smoothing sweeps + the
level residual need nu+1 more — HALO = 8 rows cover nu <= 4 with margin
(see vcycle_tiled.py's invariant).

HBM traffic per iteration ~21 fine-plane passes (A: 6, B: 8.5, C: 6.25
+ the 4x-smaller coarse tail) vs ~24 streamed by XLA at a fraction of the
bandwidth.  MATRIX-FREE level 0 (``d_field=`` + static ``geom=``, plain
unmasked operators only) recomputes the aw/an/diag_inv windows in-VMEM
from a double-halo window of the raw diffusivity field instead of
streaming the 3 stored coefficient fields: ~21 -> ~15 plane passes per
iteration (the 2D twin of cgstep3d's mf mode; recompute ulp-equal to the
stored windows, tests/test_pallas_kernel.py).  Reference hot-kernel
analog: updateX_SOR (Deff2D.cuh:69-92) at its shipped demo-image scale,
one full Krylov+multigrid iteration per three plane passes.
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
from .vcycle_tiled import HALO, _smooth_w, coarse_tail

__all__ = ["cg_steps_tiled"]


def _scal_spec(bsz):
    return pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                        memory_space=pltpu.SMEM)


def _rd(ref):
    """Shape-agnostic band read: (1, 1, H, nx) or (H, nx) ref -> (H, nx)."""
    a = ref[...]
    return a.reshape(a.shape[-2], a.shape[-1])


def _edges2(g_total):
    """Edge flags for the in-array halo masking, or (None, None) for the
    separate-halo-array mode (``g_total=None`` — the sharded engine's real
    ppermute'd neighbor-shard rows pass through unmasked).  Must be called
    at the TOP level of a kernel body: ``pl.program_id`` inside a
    ``pl.when`` branch is not substituted by the interpret-mode HLO
    interpreter (it only rewrites top-level kernel primitives)."""
    if g_total is None:
        return None, None
    g = pl.program_id(1)
    return g == 0, g == g_total - 1


def _hwin2(n_ref, b_ref, s_ref, first, last):
    """Masked window builder.  With edge flags set (in-array halo specs),
    the north/south blocks of global-edge bands alias arbitrary in-array
    rows (clamped index maps in :func:`_specs2`) and must read as the zero
    fill the old separate halo arrays carried; ``jnp.where`` (not a 0/1
    multiply) so an aliased Inf cannot poison the window as NaN."""
    nb, sb = _rd(n_ref), _rd(s_ref)
    if first is not None:
        nb = jnp.where(first, jnp.zeros_like(nb), nb)
        sb = jnp.where(last, jnp.zeros_like(sb), sb)
    return jnp.concatenate([nb, _rd(b_ref), sb], axis=0)


def _all_flags2(g_total, q, mf):
    """First-ring (:func:`_edges2`) + second-ring edge flags, computed at
    the TOP level of the kernel body (``pl.program_id`` inside a
    ``pl.when`` branch does not lower in interpret mode).  The second ring
    exists only in matrix-free mode: the n2/s2 D blocks of near-edge bands
    alias rows outside this image's y-extent and must read as zero."""
    fst, lst = _edges2(g_total)
    if not mf:
        return fst, lst, None, None
    g = pl.program_id(1)
    return fst, lst, g * q < 2, (g + 1) * q + 1 > g_total * q - 1


def _dwin2(db, dn2, dn1, ds1, ds2, *, f1, l1, f2, l2):
    """Double-halo D window (band + 4*HALO, nx) from five in-array blocks,
    zero-masking the blocks that fall outside this image's y-extent (D
    outside the domain is 0, so the recomputed face conductances vanish at
    the global y edges exactly like assembly's zero-row concatenate,
    fvm.fvm_coefficients).  The 2D twin of vcycle3d._dwin5."""

    def m(flag, ref):
        v = _rd(ref)
        return jnp.where(flag, jnp.zeros_like(v), v)

    return jnp.concatenate(
        [m(f2, dn2), m(f1, dn1), _rd(db), m(l1, ds1), m(l2, ds2)], axis=0)


def _coeffs_from_dwin2(dw, *, fx, fy, bcf, nxr):
    """Recompute the level-0 stencil windows (aw, an, diag_inv), each
    (band + 2*HALO, nx), from a double-halo D window — term-for-term the
    assembly of fvm.fvm_coefficients (a zero D on either side blocks the
    face exactly, see the harmonic-mean note below), with the
    Dirichlet diag add at the REAL x-boundary columns 0 and ``nxr - 1``
    (trailing x padding carries D = 0 -> zero coefficients, i.e. fully
    decoupled rows; their diag is 0 instead of _pad_op's stored identity 1,
    which is equivalent because every field is pinned to 0 there).
    fx/fy/bcf are the assembly's dy/dx-style Python-float factors for the
    UNPADDED domain shape.  The 2D twin of vcycle3d._coeffs_from_dwin.

    The harmonic mean uses the guarded PRODUCT form ``2ab/(a+b)`` (one VPU
    divide) instead of assembly's reciprocal form ``2/(1/a+1/b)`` (three):
    identical zero structure (either side 0 -> exactly 0; both 0, the pads,
    guarded to 0), ~1-2 ulp apart on positive faces — measured at 2048^2
    the reciprocal form's divides cost more than the streamed reads they
    replace (1.12 vs 1.02 ms/iter stored)."""
    h = HALO

    def hm(a, b):
        s = a + b
        return jnp.where(s > 0, (2.0 * a) * b / jnp.where(s > 0, s, 1.0),
                         jnp.zeros_like(s))

    hx = hm(dw[:, :-1], dw[:, 1:]) * fx
    hy = hm(dw[:-1], dw[1:]) * fy

    zx = jnp.zeros_like(dw[:, :1])
    zy = jnp.zeros_like(dw[:1])
    aw = jnp.concatenate([zx, hx], axis=-1)
    ae = jnp.concatenate([hx, zx], axis=-1)
    an = jnp.concatenate([zy, hy], axis=0)
    as_ = jnp.concatenate([hy, zy], axis=0)

    diag = aw + ae + an + as_
    col = jax.lax.broadcasted_iota(jnp.int32, diag.shape, 1)
    diag = diag + jnp.where((col == 0) | (col == nxr - 1), dw * bcf,
                            jnp.zeros_like(dw))
    di = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0)

    sl = slice(h, dw.shape[0] - h)
    return aw[sl], an[sl], di[sl]


def _cwins2(crefs, flags, *, mf, geom):
    """Level-0 stencil windows (aw, an, diag_inv), each (band + 2*HALO,
    nx): stored-coefficient :func:`_hwin2` loads (9 refs), or the
    MATRIX-FREE recompute from a double-halo D window (5 refs of the same
    flattened D array; ``geom = (fx, fy, bcf, nxr)``).  The recompute is
    ulp-equal to the stored windows on real pixels
    (tests/test_pallas_kernel.py) and cuts the per-pass coefficient HBM
    reads 3 fields -> ~1.2 field-equivalents of D."""
    f1, l1, f2, l2 = flags
    if mf:
        db, dn2, dn1, ds1, ds2 = crefs
        dw = _dwin2(db, dn2, dn1, ds1, ds2, f1=f1, l1=l1, f2=f2, l2=l2)
        fx, fy, bcf, nxr = geom
        return _coeffs_from_dwin2(dw, fx=fx, fy=fy, bcf=bcf, nxr=nxr)
    awb, awn, aws, anb, ann, ans, dib, din, dis = crefs
    return (_hwin2(awn, awb, aws, f1, l1), _hwin2(ann, anb, ans, f1, l1),
            _hwin2(din, dib, dis, f1, l1))


def _pass_a(beta_ref, live_ref, zb, zn, zs, pb, pn, ps, *rest, H,
            g_total=None, mf=False, geom=None):
    """p = z + beta*p_old on the full window; q = A p on the interior;
    accumulate pap.  ``rest`` = coefficient refs (9 stored / 5 matrix-free,
    see :func:`_cwins2`) + (p_out, pap_ref)."""
    crefs, (p_out, pap_ref) = rest[:-2], rest[-2:]
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags2(g_total, H // HALO, mf)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        pap_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        beta = beta_ref[b, 0]
        pw = (_hwin2(zn, zb, zs, fst, lst)
              + beta * _hwin2(pn, pb, ps, fst, lst))
        aww, anw, diw = _cwins2(crefs, flags, mf=mf, geom=geom)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum(aww, anw, pw)       # valid off the window edge
        pbnd = pw[h:h + H]
        p_out[...] = pbnd.reshape(p_out.shape)
        pap_ref[b, 0] += jnp.sum(pbnd * q[h:h + H])

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        p_out[...] = pb[...].reshape(p_out.shape)


def _pass_b(alpha_ref, live_ref, xb, pb, pn, ps, rb, rn, rs, *rest,
            H, omega, nu, g_total=None, mf=False, geom=None):
    """x += alpha p; r -= alpha q (q recomputed in-window); T1 of the tiled
    cycle on the fresh r; accumulate sum|r|.  ``rest`` = coefficient refs
    (:func:`_cwins2`) + (x_out, r_out, e_out, rc_out, sr_ref)."""
    crefs = rest[:-5]
    x_out, r_out, e_out, rc_out, sr_ref = rest[-5:]
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags2(g_total, H // HALO, mf)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        sr_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        alpha = alpha_ref[b, 0]
        pw = _hwin2(pn, pb, ps, fst, lst)
        aww, anw, diw = _cwins2(crefs, flags, mf=mf, geom=geom)
        dgw = _diag_of(diw)
        q = dgw * pw - _nbsum(aww, anw, pw)       # valid margin 1
        rw = _hwin2(rn, rb, rs, fst, lst) - alpha * q   # valid margin 1
        x_out[...] = (_rd(xb) + alpha * _rd(pb)).reshape(x_out.shape)

        ws = smoothing_schedule(omega, nu)
        e = ws[0] * diw * rw
        for w in ws[1:]:
            e = _smooth_w(aww, anw, diw, e, rw, w)
        res = rw - (dgw * e - _nbsum(aww, anw, e))  # valid margin nu+2 <= HALO

        rbnd = rw[h:h + H]
        r_out[...] = rbnd.reshape(r_out.shape)
        e_out[...] = e[h:h + H].reshape(e_out.shape)
        sr_ref[b, 0] += jnp.sum(jnp.abs(rbnd))
        resb = res[h:h + H]
        ry = _sel(H // 2, H, res.dtype)
        rx = _sel(resb.shape[1] // 2, resb.shape[1], res.dtype)
        t = _dg(ry, resb, (((1,), (0,)), ((), ())), split="b")
        rc_out[...] = _dg(t, rx, (((1,), (1,)), ((), ())),
                          split="a").reshape(rc_out.shape)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        x_out[...] = xb[...].reshape(x_out.shape)
        r_out[...] = rb[...].reshape(r_out.shape)
        e_out[...] = jnp.zeros_like(e_out[...])
        rc_out[...] = jnp.zeros_like(rc_out[...])


def _pass_c(live_ref, eb, en, es_, rb, rn, rs, *rest, H, omega, nu, over,
            g_total=None, mf=False, geom=None):
    """T2 of the tiled cycle (prolong + add + post-smooth) producing z;
    accumulate rz = <r, z> (same prolongation as vcycle_tiled._post_kernel).
    ``rest`` = coefficient refs (:func:`_cwins2`) + (ec_ref, z_out,
    rz_ref)."""
    crefs = rest[:-3]
    ec_ref, z_out, rz_ref = rest[-3:]
    h = HALO
    b, g = pl.program_id(0), pl.program_id(1)
    flags = _all_flags2(g_total, H // HALO, mf)
    fst, lst = flags[0], flags[1]

    @pl.when(g == 0)
    def _init():
        rz_ref[b, 0] = 0.0

    @pl.when(live_ref[b, 0] > 0)
    def _run():
        ew = _hwin2(en, eb, es_, fst, lst)
        rw = _hwin2(rn, rb, rs, fst, lst)
        aww, anw, diw = _cwins2(crefs, flags, mf=mf, geom=geom)

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
        if mf:
            # matrix-free pads carry diag 0 (not the stored identity), so
            # the prolongated correction at D == 0 pixels would never decay
            # and p/x would drift there; pin z to 0 on non-physical pixels
            # (their r is 0 identically, so rz is unaffected)
            zb = jnp.where(_rd(crefs[0]) > 0, zb, jnp.zeros_like(zb))
        z_out[...] = zb.reshape(z_out.shape)
        rz_ref[b, 0] += jnp.sum(_rd(rb) * zb)

    @pl.when(live_ref[b, 0] <= 0)
    def _skip():
        z_out[...] = jnp.zeros_like(z_out[...])


def _specs2(bsz, g_total, band, nx):
    """Body + IN-ARRAY halo specs over a flattened (B*G*band, nx) array.

    Halo blocks are (HALO, nx) slices of the SAME array: the north halo of
    band g is the last HALO rows of band g-1 (block index (b*G+g)*q - 1 in
    HALO units, q = band/HALO), the south halo the first HALO rows of band
    g+1.  Edge bands clamp into valid range and the kernels zero-mask them
    (:func:`_hwin2`).  Requires band % HALO == 0."""
    q = band // HALO
    n_blocks = bsz * g_total * q
    body = pl.BlockSpec((band, nx), lambda b, g: (b * g_total + g, 0),
                        memory_space=pltpu.VMEM)
    north = pl.BlockSpec(
        (HALO, nx),
        lambda b, g: (jnp.maximum((b * g_total + g) * q - 1, 0), 0),
        memory_space=pltpu.VMEM)
    south = pl.BlockSpec(
        (HALO, nx),
        lambda b, g: (jnp.minimum((b * g_total + g + 1) * q, n_blocks - 1),
                      0),
        memory_space=pltpu.VMEM)
    return body, north, south


def _d_halo_specs2(bsz, g_total, band, nx):
    """Second-ring halo specs for the matrix-free D window: (north2,
    south2) (HALO, nx) blocks at index g*q - 2 / (g+1)*q + 1 in HALO units
    (one block beyond the _specs2 halos), clamped globally.  The kernels
    zero-mask the clamped aliases (:func:`_dwin2`)."""
    q = band // HALO
    n_blocks = bsz * g_total * q
    north2 = pl.BlockSpec(
        (HALO, nx),
        lambda b, g: (jnp.maximum((b * g_total + g) * q - 2, 0), 0),
        memory_space=pltpu.VMEM)
    south2 = pl.BlockSpec(
        (HALO, nx),
        lambda b, g: (jnp.minimum((b * g_total + g + 1) * q + 1,
                                  n_blocks - 1), 0),
        memory_space=pltpu.VMEM)
    return north2, south2


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "band", "interpret",
                                             "geom"))
@x32_kernel
def cg_steps_tiled(levels: List[StencilCoeffs], x: jax.Array, r: jax.Array,
                   p: jax.Array, rz: jax.Array, active: jax.Array,
                   stop: jax.Array, hi: jax.Array, k: jax.Array, *,
                   omega: float = 0.8, nu: int = 2, coarse_iters: int = 32,
                   over: float = 1.8, band: int = 256,
                   interpret: bool = False, d_field=None, geom=None):
    """Run up to ``k`` banded MGCG iterations on a (B, py, px) padded batch.

    Same contract as :func:`cgstep_vmem.cg_steps_pallas` (levels from
    ``build_hierarchy(pad_levels=True)`` on an operator padded to
    ``tiled_pad_shape``; py % band == 0): returns (x, r, p, rz, k_done).
    A live image leaves the iteration loop when its recurrence sum|r|
    crosses ``stop`` (early exit) or ``hi`` (divergence tripwire); frozen
    (``active`` = 0) images pass through untouched.

    MATRIX-FREE level 0: pass ``d_field`` (the PADDED (B, py, px)
    diffusivity field, zero in the pads, strictly positive on real pixels)
    + static ``geom = (fx, fy, bcf, nxr)`` (assembly factors for the
    UNPADDED shape, see :func:`_coeffs_from_dwin2`) and the three passes
    recompute the level-0 stencil windows in-VMEM from a double-halo D
    window instead of streaming 3 stored coefficient fields — level-0
    coefficient HBM reads drop 9 -> ~3.6 window-equivalents per iteration.
    Only valid for the plain unmasked, unequilibrated operator
    ``fvm_coefficients(d, cl, cr)`` (levels[0] must be exactly that,
    padded); levels[1:] stay stored."""
    bsz, py, px = x.shape
    if py % band or band % HALO or nu > HALO - 2:
        raise ValueError(f"cg_steps_tiled: py={py} % band={band}, band a "
                         f"multiple of {HALO}, nu<={HALO - 2} required")
    c0 = levels[0]
    g_total = py // band
    dtype = x.dtype
    mf = d_field is not None
    if mf and geom is None:
        raise ValueError("cg_steps_tiled: d_field requires geom")

    def fl(a):
        return a.reshape(bsz * py, px)

    body, north, south = _specs2(bsz, g_total, band, px)
    if mf:
        dfl = fl(d_field.astype(dtype))
        north2, south2 = _d_halo_specs2(bsz, g_total, band, px)
        coef_ops = [dfl, dfl, dfl, dfl, dfl]
        coef_specs = [body, north2, north, south, south2]
        # pin the non-physical (D == 0) pad pixels of the incoming state to
        # 0: the initial p comes from the stored-coefficient refresh cycle,
        # whose identity pad rows leak prolongated corrections there (see
        # _pass_c's matching in-loop pin)
        ind = (d_field > 0).astype(dtype)
        x, r, p = x * ind, r * ind, p * ind
    else:
        aw, an_, di = fl(c0.a_w), fl(c0.a_n), fl(c0.diag_inv)
        coef_ops = [aw, aw, aw, an_, an_, an_, di, di, di]
        coef_specs = [body, north, south] * 3
    scal = _scal_spec(bsz)
    win_bytes = (band + 2 * HALO) * px * dtype.itemsize
    py1, px1 = levels[1].diag.shape[-2], levels[1].diag.shape[-1]

    def params(extra=0):
        if interpret:
            return {}
        # mf: the in-kernel recompute materializes ~6 extra window-sized
        # intermediates (dw, hx/hy, ae/as, diag) beyond the stored path's 3
        # coefficient windows; clamp like the 3D engine (16 MB Mosaic floor,
        # v5e physical ~128 MB ceiling)
        mult = 32 if mf else 26
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(mult * win_bytes + extra), 16 << 20),
                                 112 << 20))}

    scal_shape = jax.ShapeDtypeStruct((bsz, 1), dtype)
    flat_shape = jax.ShapeDtypeStruct((bsz * py, px), dtype)
    rc_shape = jax.ShapeDtypeStruct((bsz * g_total * (band // 2), px // 2),
                                    dtype)
    rc_spec = pl.BlockSpec((band // 2, px // 2),
                           lambda b, g: (b * g_total + g, 0),
                           memory_space=pltpu.VMEM)
    ec_spec = pl.BlockSpec((1, py1, px1), lambda b, g: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    scal_out = pl.BlockSpec((bsz, 1), lambda b, g: (0, 0),
                            memory_space=pltpu.SMEM)

    kargs = dict(g_total=g_total, mf=mf, geom=geom)
    pa = pl.pallas_call(
        functools.partial(_pass_a, H=band, **kargs),
        grid=(bsz, g_total),
        in_specs=[scal, scal] + [body, north, south] * 2 + coef_specs,
        out_shape=[flat_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(),
    )
    pb_ = pl.pallas_call(
        functools.partial(_pass_b, H=band, omega=omega, nu=nu, **kargs),
        grid=(bsz, g_total),
        in_specs=[scal, scal, body] + [body, north, south] * 2 + coef_specs,
        out_shape=[flat_shape, flat_shape, flat_shape, rc_shape, scal_shape],
        out_specs=[body, body, body, rc_spec, scal_out],
        interpret=interpret,
        **params(),
    )
    pc = pl.pallas_call(
        functools.partial(_pass_c, H=band, omega=omega, nu=nu, over=over,
                          **kargs),
        grid=(bsz, g_total),
        in_specs=[scal] + [body, north, south] * 2 + coef_specs + [ec_spec],
        out_shape=[flat_shape, scal_shape],
        out_specs=[body, scal_out],
        interpret=interpret,
        **params(extra=4 * py1 * px1 * dtype.itemsize),
    )

    stop_ = stop[:, 0]
    hi_ = hi[:, 0]
    zeros_s = jnp.zeros((), dtype)

    sr0 = jnp.sum(jnp.abs(r), axis=(-2, -1))
    live0 = (active[:, 0] > 0) & (sr0 > stop_) & (sr0 < hi_)

    def cond(c):
        return (c[0] < k) & jnp.any(c[-1])

    def body_fn(c):
        (i, xf, rf, pf, zf, rz_p, rz_c, kdone, sr, live) = c
        livef = live.astype(dtype)[:, None]
        beta = jnp.where((i > 0) & live & (rz_p > 0),
                         rz_c / jnp.where(rz_p > 0, rz_p, 1.0), zeros_s)
        p_new, pap = pa(beta[:, None].astype(dtype), livef,
                        zf, zf, zf, pf, pf, pf, *coef_ops)
        pap = pap[:, 0]
        alpha = jnp.where(live & (pap > 0),
                          rz_c / jnp.where(pap > 0, pap, 1.0), zeros_s)
        x_new, r_new, e_b, rc_f, sr_out = pb_(
            alpha[:, None].astype(dtype), livef, xf,
            p_new, p_new, p_new, rf, rf, rf, *coef_ops)
        rc_b = rc_f.reshape(bsz, g_total, band // 2, px // 2)
        e_c = coarse_tail(levels, rc_b, omega=omega, nu=nu,
                          coarse_iters=coarse_iters, over=over,
                          interpret=interpret)
        z_new, rz_out = pc(livef, e_b, e_b, e_b, r_new, r_new, r_new,
                           *coef_ops, e_c)
        sr_new = jnp.where(live, sr_out[:, 0], sr)
        rz_new = jnp.where(live, rz_out[:, 0], rz_c)
        rz_p_new = jnp.where(live, rz_c, rz_p)
        z_keep = jnp.where(live[:, None, None],
                           z_new.reshape(bsz, py, px),
                           zf.reshape(bsz, py, px)).reshape(bsz * py, px)
        kdone = kdone + live.astype(jnp.int32)
        live = live & (sr_new > stop_) & (sr_new < hi_)
        return (i + 1, x_new, r_new, p_new, z_keep, rz_p_new, rz_new,
                kdone, sr_new, live)

    init = (jnp.asarray(0, jnp.int32), fl(x), fl(r), fl(p), fl(p),
            rz[:, 0].astype(dtype), rz[:, 0].astype(dtype),
            jnp.zeros((bsz,), jnp.int32), sr0, live0)
    out = jax.lax.while_loop(cond, body_fn, init)
    (_i, xf, rf, pf, _zf, _rzp, rz_c, kdone, _sr, _live) = out

    def unfl(a):
        return a.reshape(bsz, py, px)

    return (unfl(xf), unfl(rf), unfl(pf), rz_c[:, None], kdone[:, None])

"""Row-tiled fused V-cycle: the fine level streams HBM in temporally-blocked
bands, the coarse tail stays whole in VMEM.

The whole-cycle kernel (vcycle_vmem.py) requires the entire pyramid resident
in VMEM, which caps it at ~16 fine-plane equivalents < 100 MB — 1449^2 fp32.
The reference's own largest bundled case (00042.jpg, 2007x1002 read at
/root/reference/Deff2DGPU/Deff2D.cuh:1336) and the 2048^2 BASELINE config 3
exceed that and previously fell back to the XLA cycle (~38 fine-plane HBM
passes per application).  This kernel removes the cap with a classical
overlapped temporal-blocking decomposition:

  * The FINE level (the only one that doesn't fit) is processed in
    ``band``-row strips by two Pallas kernels, each streaming the plane
    once per cycle application:
      - T1 "down": all nu pre-smoothing sweeps + the level residual + the
        2x2 restriction, per band.  Smoothing starts from e = omega D^-1 r
        (a local expression), so a band extended by HALO rows on each side
        computes nu sweeps + the residual EXACTLY on its interior — no
        inter-band communication, the halos come from thin neighbor-row
        arrays sliced outside the kernel (~2*HALO/band extra traffic).
      - T2 "up": piecewise-constant prolongation of the coarse correction
        (window-offset 0/1 selection matmuls on the MXU, as in
        vcycle_vmem), add to the pre-smoothed iterate, and all nu
        post-smoothing sweeps, again exact on the interior by overlap.
  * Levels 1+ shrink 4x geometrically, so their whole pyramid fits VMEM for
    fine grids up to ~2900^2; the coarse tail reuses the existing
    whole-cycle kernel (v_cycle_pallas on ``levels[1:]``), falling back to
    the XLA cycle beyond that.

HBM traffic per application: fine level r + 3 coefficient planes read by T1
and T2 each, e/z planes written once (~10-11 fine-plane equivalents + the
coarse pyramid), vs ~38 for the XLA cycle — and the smoothing arithmetic
runs VMEM-resident on the VPU either way, so extra sweeps are nearly free
within a band.

Window-validity invariant (why HALO rows suffice): e^0 = omega*dinv*r is
exact everywhere in the window; each Jacobi sweep invalidates one row at
each window edge; the residual costs one more.  T1 needs nu rows, T2 needs
nu rows; HALO = 8 (one fp32 sublane tile, keeps every concatenate aligned)
covers nu <= 4 with margin.  The in-window ``pltpu.roll`` wraparound only
corrupts the outermost window row per sweep — inside the invalid margin.

Semantics match solvers/multigrid.v_cycle with nu1 = nu2 = nu (verified in
interpreter mode against the XLA cycle).  Reference hot-kernel analog:
updateX_SOR, Deff2D.cuh:69-92, at the scale of its shipped demo image.
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
                          v_cycle_pallas, vcycle_fits_vmem, x32_kernel)

__all__ = ["v_cycle_tiled", "tiled_band", "tiled_pad_shape", "coarse_tail"]

HALO = 8          # fixed halo rows; nu <= 4 < HALO always valid
_LANES = 256      # fine nx padded to this (nx/2 stays lane-aligned)


def tiled_band(ny: int, nx: int, itemsize: int = 4) -> int:
    """Largest power-of-two band height whose T1/T2 working set (~22 window
    planes incl. Mosaic double-buffering) stays under the VMEM budget,
    capped so a small grid is one band instead of mostly padding."""
    budget = 100 * 1024 * 1024
    cap = -(-ny // HALO) * HALO      # HALO-multiple: the banded CG engine's
    for band in (512, 256, 128, 64, 32, 16, 8):   # in-array halo specs
        if 22 * (band + 2 * HALO) * nx * itemsize < budget:   # index in
            return min(band, cap) if band >= cap else band    # HALO units
    return 8


def tiled_pad_shape(ny: int, nx: int, band: int) -> tuple:
    """Fine-level padded shape: rows to a band multiple, cols to the lane
    quantum (so every coarser level stays even/aligned with no re-padding
    for the typical power-of-two depth)."""
    py = -(-ny // band) * band
    px = -(-nx // _LANES) * _LANES
    return py, px


def _win(n_ref, b_ref, s_ref):
    """(halo, nx)+(H, nx)+(halo, nx) -> one (H+2*HALO, nx) window."""
    return jnp.concatenate([n_ref[0, 0], b_ref[0, 0], s_ref[0, 0]], axis=0)


def _smooth_w(aww, anw, diw, x, b, omega):
    return (1.0 - omega) * x + omega * (b + _nbsum(aww, anw, x)) * diw


def _pre_kernel(rb, rn, rs, awb, awn, aws, anb, ann, ans, dib, din, dis,
                e_ref, rc_ref, *, H, omega, nu):
    h = HALO
    rw = _win(rn, rb, rs)
    aww = _win(awn, awb, aws)
    anw = _win(ann, anb, ans)
    diw = _win(din, dib, dis)
    dgw = _diag_of(diw)

    ws = smoothing_schedule(omega, nu)
    e = ws[0] * diw * rw
    for w in ws[1:]:
        e = _smooth_w(aww, anw, diw, e, rw, w)
    res = rw - (dgw * e - _nbsum(aww, anw, e))

    e_ref[0, 0] = e[h:h + H]
    resb = res[h:h + H]
    ry = _sel(H // 2, H, res.dtype)
    rx = _sel(resb.shape[1] // 2, resb.shape[1], res.dtype)
    t = _dg(ry, resb, (((1,), (0,)), ((), ())), split="b")
    rc_ref[0, 0] = _dg(t, rx, (((1,), (1,)), ((), ())), split="a")


def _post_kernel(eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
                 dib, din, dis, ec_ref, z_ref, *, H, omega, nu, over):
    h = HALO
    ew = _win(en, eb, es_)
    rw = _win(rn, rb, rs)
    aww = _win(awn, awb, aws)
    anw = _win(ann, anb, ans)
    diw = _win(din, dib, dis)

    # window rows [g*H - h, g*H + H + h) of the prolonged coarse correction:
    # 0/1 selection matmuls with the window's runtime row offset (negative /
    # out-of-range rows select nothing -> zeros, which is exact there: the
    # top/bottom global boundaries carry a_n = a_s = 0 so halo values at the
    # domain edge never feed a valid row)
    ec = ec_ref[0]                              # (nyc, nxc) padded coarse
    nyc, nxc = ec.shape
    wy = H + 2 * h
    g = pl.program_id(1)
    row0 = g * H - h
    rows = jax.lax.broadcasted_iota(jnp.int32, (wy, nyc), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (wy, nyc), 1)
    sy = jnp.where(rows >= 0, rows // 2, -1)
    sel_y = (sy == cols).astype(ec.dtype)
    t = _dg(sel_y, ec, (((1,), (0,)), ((), ())), split="b")   # (wy, nxc)
    nx = ew.shape[1]
    fcols = jax.lax.broadcasted_iota(jnp.int32, (nx, nxc), 0) // 2
    ccols = jax.lax.broadcasted_iota(jnp.int32, (nx, nxc), 1)
    sel_x = (fcols == ccols).astype(ec.dtype)
    ecw = _dg(t, sel_x, (((1,), (1,)), ((), ())), split="a")   # (wy, nx)

    e = ew + over * ecw
    for w in reversed(smoothing_schedule(omega, nu)):
        e = _smooth_w(aww, anw, diw, e, rw, w)
    z_ref[0, 0] = e[h:h + H]


def coarse_tail(levels, rc_b, *, omega, nu, coarse_iters, over, interpret):
    """Solve the coarse correction on the banded restricted residual
    ``rc_b`` (B, G, band/2, nx/2): whole-in-VMEM fused cycle on levels[1:]
    when it fits, XLA cycle beyond.  Returns (B, py1, px1) padded to
    levels[1]'s shape.  Shared with the banded CG engine
    (cgstep_tiled.py)."""
    bsz, g_total, hb, hx = rc_b.shape
    ny2, nx2 = g_total * hb, hx
    r_c = rc_b.reshape(bsz, ny2, nx2)
    c1 = levels[1]
    py1, px1 = c1.diag.shape[-2], c1.diag.shape[-1]
    if (py1, px1) != (ny2, nx2):
        r_c = jnp.pad(r_c, [(0, 0), (0, py1 - ny2), (0, px1 - nx2)])
    if vcycle_fits_vmem(py1, px1, r_c.dtype.itemsize):
        return v_cycle_pallas(levels[1:], r_c, omega=omega,
                              coarse_iters=coarse_iters, over=over, nu=nu,
                              interpret=interpret)
    from ...solvers.multigrid import v_cycle

    e_c = v_cycle(levels[1:], r_c, nu1=nu, nu2=nu, omega=omega,
                  coarse_iters=coarse_iters, over=over)
    return jnp.pad(e_c, [(0, 0), (0, py1 - e_c.shape[-2]),
                         (0, px1 - e_c.shape[-1])])


def _banded(x, band):
    """(B, ny, nx) -> banded (B, G, band, nx) plus (B, G, HALO, nx) north/
    south halo arrays (zeros beyond the global edges)."""
    bsz, ny, nx = x.shape
    g = ny // band
    xb = x.reshape(bsz, g, band, nx)
    zero = jnp.zeros((bsz, 1, HALO, nx), x.dtype)
    north = jnp.concatenate([zero, xb[:, :-1, band - HALO:]], axis=1)
    south = jnp.concatenate([xb[:, 1:, :HALO], zero], axis=1)
    return xb, north, south


def _band_specs(g_total, band, nx):
    body = pl.BlockSpec((1, 1, band, nx), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((1, 1, HALO, nx), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)
    return body, halo


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "band", "interpret"))
@x32_kernel
def v_cycle_tiled(levels: List[StencilCoeffs], r: jax.Array, *,
                  omega: float = 0.8, nu: int = 1, coarse_iters: int = 32,
                  over: float = 1.8, band: int = 256,
                  interpret: bool = False) -> jax.Array:
    """Apply one fused V(nu, nu) cycle to ``r``: (B, ny, nx) -> (B, ny, nx),
    for fine levels too large for the whole-cycle VMEM kernel.

    Requirements: ``levels`` from ``build_hierarchy(pad_levels=True)`` on an
    operator padded to :func:`tiled_pad_shape`; ny % band == 0, band even,
    nu <= HALO.  The coarse tail (levels[1:]) runs whole-in-VMEM when it
    fits, else the XLA cycle.
    """
    bsz, ny, nx = r.shape
    if ny % band or band % 2 or nu > HALO:
        raise ValueError(f"v_cycle_tiled: ny={ny} % band={band}, band even, "
                         f"nu<={HALO} required")
    c0 = levels[0]
    g_total = ny // band
    dtype = r.dtype

    rb, rn, rs = _banded(r, band)
    awb, awn, aws = _banded(c0.a_w, band)
    anb, ann, ans = _banded(c0.a_n, band)
    dib, din, dis = _banded(c0.diag_inv, band)

    body, halo = _band_specs(g_total, band, nx)
    in_specs = [body, halo, halo] * 4
    operands = [rb, rn, rs, awb, awn, aws, anb, ann, ans, dib, din, dis]

    win_bytes = (band + 2 * HALO) * nx * r.dtype.itemsize
    limit1 = int(26 * win_bytes)
    params1 = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=limit1)}

    pre = functools.partial(_pre_kernel, H=band, omega=omega, nu=nu)
    e_b, rc_b = pl.pallas_call(
        pre,
        grid=(bsz, g_total),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, g_total, band, nx), dtype),
            jax.ShapeDtypeStruct((bsz, g_total, band // 2, nx // 2), dtype),
        ],
        in_specs=in_specs,
        out_specs=[body,
                   pl.BlockSpec((1, 1, band // 2, nx // 2),
                                lambda b, g: (b, g, 0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
        **params1,
    )(*operands)

    # ---- coarse tail on the restricted residual ----
    e_c = coarse_tail(levels, rc_b, omega=omega, nu=nu,
                      coarse_iters=coarse_iters, over=over,
                      interpret=interpret)
    py1, px1 = e_c.shape[-2], e_c.shape[-1]

    # ---- up-sweep: prolong + add + post-smooth ----
    e_pre = e_b.reshape(bsz, ny, nx)
    eb2, en2, es2 = _banded(e_pre, band)
    ec_spec = pl.BlockSpec((1, py1, px1), lambda b, g: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs2 = [body, halo, halo] * 2 + [body, halo, halo] * 3 + [ec_spec]
    operands2 = [eb2, en2, es2, rb, rn, rs,
                 awb, awn, aws, anb, ann, ans, dib, din, dis, e_c]

    limit2 = int(26 * win_bytes + 4 * py1 * px1 * r.dtype.itemsize)
    params2 = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=limit2)}

    post = functools.partial(_post_kernel, H=band, omega=omega, nu=nu,
                             over=over)
    z_b = pl.pallas_call(
        post,
        grid=(bsz, g_total),
        out_shape=jax.ShapeDtypeStruct((bsz, g_total, band, nx), dtype),
        in_specs=in_specs2,
        out_specs=body,
        interpret=interpret,
        **params2,
    )(*operands2)
    return z_b.reshape(bsz, ny, nx)

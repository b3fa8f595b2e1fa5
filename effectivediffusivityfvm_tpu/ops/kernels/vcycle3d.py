"""Fused 3D V-cycle Pallas kernels: whole-VMEM and z-slab-banded streaming.

The 3D solvers (solvers/solvers3d.py) previously ran their V-cycle as XLA
ops: ~50 HBM volume-passes per MGCG iteration at an effective ~90 GB/s
(measured 38 ms/iteration at 256^3).  These kernels port the 2D fusion
ladder (vcycle_vmem.py / vcycle_tiled.py) to the 7-point voxel operator:

  * ``v_cycle3d_pallas`` — the ENTIRE V(nu, nu) cycle in one VMEM
    residency, for volumes whose 4-field pyramid fits (~<= 96^3 fp32).
  * ``v_cycle3d_tiled`` — z-slab streaming for larger volumes: the fine
    level runs in ``band``-slice slabs overlapped by HALO_Z slices (T1:
    pre-smooth + residual + restriction; T2: prolongation + add +
    post-smooth — exact on slab interiors by the same window-validity
    invariant as the 2D tiled cycle), and the coarse tail RECURSES: at
    256^3 level 1 is 128^3 (still past VMEM) and bands again; the
    remaining pyramid rides the whole-VMEM kernel once it fits.

Mosaic 3D notes (all probed on this chip):
  * ``pltpu.roll`` does not lower for 3D refs; neighbor shifts use
    concatenate with a zero plane — exact at domain edges because the
    boundary conductances are zero by assembly (fvm3d coefficients).
  * z (the leading axis) is untiled: leading-axis reshape pair-sums
    (z-restriction), broadcast-interleave (z-prolongation), and static
    slicing all compile; the banding halo needs no alignment quantum.
  * y/x restriction/prolongation are batched MXU matmuls against 0/1
    selection operators (broadcast over z) at the split-k bf16 precision
    of vcycle_vmem._dg (f32-parity at half of HIGHEST's MXU passes).

Semantics match solvers3d.v_cycle_3d with nu1 = nu2 = nu (verified in
interpreter mode); levels must be stored pre-padded to even dims
(build_hierarchy_3d(pad_levels=True)) except the coarsest, and the banded
fine level additionally padded so nz % band == 0 (pad_op_3d).  Reference
analog: the reference is strictly 2D — this is the framework's scale axis
(SURVEY §6, BASELINE config 5); hot-kernel parity target updateX_SOR
(Deff2D.cuh:69-92) extended to voxels.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm3d import StencilCoeffs3D
from .vcycle_vmem import (_dg, _diag_of, _sel, smoothing_schedule,
                          x32_kernel)

__all__ = [
    "HALO_Z", "v_cycle3d_pallas", "v_cycle3d_tiled", "vcycle3d_fits_vmem",
    "band_z_for", "pad_op_3d", "pad_shape_3d",
]

HALO_Z = 4     # even (coarse halo = HALO_Z//2); covers nu <= 3


# --------------------------------------------------------------------------
# in-kernel primitives (3D arrays in VMEM)
# --------------------------------------------------------------------------

def _shift3(x, axis, off):
    """Neighbor values along ``axis`` with zero fill (off=-1: previous)."""
    if axis == 0:
        z = jnp.zeros_like(x[:1])
        return (jnp.concatenate([z, x[:-1]], 0) if off == -1
                else jnp.concatenate([x[1:], z], 0))
    if axis == 1:
        z = jnp.zeros_like(x[:, :1])
        return (jnp.concatenate([z, x[:, :-1]], 1) if off == -1
                else jnp.concatenate([x[:, 1:], z], 1))
    z = jnp.zeros_like(x[:, :, :1])
    return (jnp.concatenate([z, x[:, :, :-1]], 2) if off == -1
            else jnp.concatenate([x[:, :, 1:], z], 2))


def _nbsum3(aw, an, au, x):
    """Symmetric 7-point neighbor sum from the west/north/up planes only
    (a_e[i] = a_w[i+1] etc. — same reconstruction as the 2D _nbsum)."""
    return (aw * _shift3(x, 2, -1) + _shift3(aw * x, 2, +1)
            + an * _shift3(x, 1, -1) + _shift3(an * x, 1, +1)
            + au * _shift3(x, 0, -1) + _shift3(au * x, 0, +1))


def _smooth3(aw, an, au, di, x, b, omega):
    return (1.0 - omega) * x + omega * (b + _nbsum3(aw, an, au, x)) * di


def _restrict3_yx(t, nyc, nxc):
    """(nz, ny, nx) -> (nz, nyc, nxc) 2x2 y/x block sums via batched 0/1
    selection matmuls (nyc/nxc may exceed ny//2, nx//2: padded rows/cols
    select nothing -> exact zeros)."""
    nz, ny, nx = t.shape
    ry = jnp.broadcast_to(_sel(nyc, ny, t.dtype), (nz, nyc, ny))
    t = _dg(ry, t, (((2,), (1,)), ((0,), (0,))), split="b")  # (nz, nyc, nx)
    rx = jnp.broadcast_to(_sel(nxc, nx, t.dtype), (nz, nxc, nx))
    return _dg(t, rx, (((2,), (2,)), ((0,), (0,))),
               split="a")                                   # (nz, nyc, nxc)


def _prolong3_yx(ec, ny, nx):
    """(nzc, nyc, nxc) -> (nzc, ny, nx) piecewise-constant y/x injection
    (transposed selection matmuls)."""
    nzc, nyc, nxc = ec.shape
    py = jnp.broadcast_to(_sel(nyc, ny, ec.dtype), (nzc, nyc, ny))
    t = _dg(py, ec, (((1,), (1,)), ((0,), (0,))), split="b")  # (nzc, ny, nxc)
    px = jnp.broadcast_to(_sel(nxc, nx, ec.dtype), (nzc, nxc, nx))
    return _dg(t, px, (((2,), (1,)), ((0,), (0,))),
               split="a")                                    # (nzc, ny, nx)


def _restrict3(res, shape_c):
    """Full 2x2x2 restriction onto the stored (padded-even) coarse shape."""
    nz, ny, nx = res.shape
    nzc, nyc, nxc = shape_c
    t = res.reshape(nz // 2, 2, ny, nx).sum(axis=1)        # z pair sums
    if nzc > nz // 2:
        t = jnp.concatenate(
            [t, jnp.zeros((nzc - nz // 2, ny, nx), t.dtype)], axis=0)
    return _restrict3_yx(t, nyc, nxc)


def _prolong3(ec, shape_f):
    """Inverse injection onto the fine shape (drops padded coarse tails)."""
    nz, ny, nx = shape_f
    t = _prolong3_yx(ec[: nz // 2 + nz % 2], ny, nx)
    nzh = t.shape[0]
    t = jnp.broadcast_to(t[:, None], (nzh, 2, ny, nx)).reshape(2 * nzh, ny, nx)
    return t[:nz]


def _load_levels3(refs, n_levels):
    out = []
    for l in range(n_levels):
        aw, an, au, di = (r[...] for r in refs[4 * l:4 * l + 4])
        out.append((aw, an, au, di, _diag_of(di)))
    return out


def _cycle3d_value(r0, lvl, shapes, omega, nu, coarse_iters, over):
    """One V(nu, nu) cycle applied to the VALUE ``r0`` with every level's
    planes loaded (3D twin of vcycle_vmem._cycle_value)."""
    n_levels = len(shapes)
    ws = smoothing_schedule(omega, nu)

    def smooth(l, x, b, w):
        aw, an, au, di, _ = lvl[l]
        return _smooth3(aw, an, au, di, x, b, w)

    rs = [r0]
    es = []
    for l in range(n_levels - 1):
        aw, an, au, di, dg = lvl[l]
        e = ws[0] * di * rs[l]
        for w in ws[1:]:
            e = smooth(l, e, rs[l], w)
        res = rs[l] - (dg * e - _nbsum3(aw, an, au, e))
        es.append(e)
        rs.append(_restrict3(res, shapes[l + 1]))

    lc = n_levels - 1
    e = jnp.zeros(shapes[lc], rs[lc].dtype)
    e = jax.lax.fori_loop(0, coarse_iters,
                          lambda _, x: smooth(lc, x, rs[lc], ws[-1]), e)

    for l in range(n_levels - 2, -1, -1):
        e = es[l] + over * _prolong3(e, shapes[l])
        for w in reversed(ws):
            e = smooth(l, e, rs[l], w)
    return e


# --------------------------------------------------------------------------
# whole-VMEM cycle
# --------------------------------------------------------------------------

def vcycle3d_fits_vmem(nz: int, ny: int, nx: int, itemsize: int = 4) -> bool:
    """4-field pyramid (x2 double-buffered) + r/e pyramids + the concat-
    shift temporaries (~6 live copies in _nbsum3) — ~34 fine-volume
    equivalents must fit the raised VMEM budget (measured 30.6 MB at
    64^3 = ~29 equivalents)."""
    return 34 * nz * ny * nx * itemsize < 100 * 1024 * 1024


def _flat_spec(nz, ny, nx):
    return pl.BlockSpec((nz, ny, nx), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _whole_kernel3(r_ref, *rest, shapes, omega, nu, coarse_iters, over):
    *coef_refs, z_ref = rest
    lvl = _load_levels3(coef_refs, len(shapes))
    z_ref[...] = _cycle3d_value(r_ref[...], lvl, shapes, omega, nu,
                                coarse_iters, over)


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "interpret"))
@x32_kernel
def v_cycle3d_pallas(levels: List[StencilCoeffs3D], r: jax.Array, *,
                     omega: float = 0.8, nu: int = 1,
                     coarse_iters: int = 32, over: float = 1.8,
                     interpret: bool = False) -> jax.Array:
    """Apply one fused V(nu, nu) cycle: (B, nz, ny, nx) -> same.

    ``levels`` from ``build_hierarchy_3d(..., pad_levels=True)``; every
    level but the last must have even dims.  Batch rides the (sequential)
    kernel grid with volumes flattened to (B*nz_l, ny_l, nx_l) so all
    blocks stay rank-3 (probed: rank-3 Mosaic ops are the supported set).
    """
    bsz, nz, ny, nx = r.shape
    shapes = tuple(c.diag.shape[-3:] for c in levels)
    assert shapes[0] == (nz, ny, nx), (shapes[0], r.shape)

    def flat(a):
        return a.reshape((-1,) + a.shape[-2:])

    in_specs = [_flat_spec(nz, ny, nx)]
    operands = [flat(r)]
    for c, (sz, sy, sx) in zip(levels, shapes):
        for plane in (c.a_w, c.a_n, c.a_u, c.diag_inv):
            in_specs.append(_flat_spec(sz, sy, sx))
            operands.append(flat(plane))

    pyramid = sum(sz * sy * sx for sz, sy, sx in shapes)
    vol = nz * ny * nx
    # the concat-based 3D neighbor sum keeps ~6 shifted copies live (vs 4
    # rolls in 2D), so the scoped stack runs ~1.5x the 2D estimate
    # (measured: 30.6 MB actual at 64^3 vs the 2D-formula's 21.4 MB);
    # grant 2x the measured-shape estimate, floored at Mosaic's own 16 MB
    # default (XLA may additionally stack-place the in/outputs of a SMALL
    # kernel in vmem — observed 6.75 MiB demanded at a 32^3 pyramid where
    # the shape formula granted 5.86), capped at physical VMEM
    limit = int(8 * (2 * (4 * pyramid + 2 * vol) + 2 * pyramid + 8 * vol))
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(limit, 16 << 20), 112 << 20))}

    kernel = functools.partial(_whole_kernel3, shapes=shapes, omega=omega,
                               nu=nu, coarse_iters=coarse_iters, over=over)
    z = pl.pallas_call(
        kernel,
        grid=(bsz,),
        out_shape=jax.ShapeDtypeStruct((bsz * nz, ny, nx), r.dtype),
        in_specs=in_specs,
        out_specs=_flat_spec(nz, ny, nx),
        interpret=interpret,
        **params,
    )(*operands)
    return z.reshape(bsz, nz, ny, nx)


# --------------------------------------------------------------------------
# z-slab banded cycle
# --------------------------------------------------------------------------

def band_z_for(nz: int, ny: int, nx: int, itemsize: int = 4,
               fields: int = 18) -> int:
    """Largest z-band whose T1/T2 working set (``fields`` window fields
    incl. double-buffering; ~18 for the stored-coefficient passes) fits the
    VMEM budget.  Always a multiple of HALO_Z (the in-array halo BlockSpecs
    index in HALO_Z-block units).

    ``fields``: the MATRIX-FREE engine passes (cgstep3d.py, level 0
    recomputed from a 5-block D window instead of 12 stored-coefficient
    blocks) carry a ~12-field working set, which admits a 2x band at 256^3
    (8 -> 16), cutting the (band + 2*HALO_Z)/band halo-overlap factor
    2.0 -> 1.5."""
    budget = 100 * 1024 * 1024
    plane = ny * nx * itemsize
    for bz in (64, 32, 16, 8, 4):
        if fields * (bz + 2 * HALO_Z) * plane < budget:
            if bz >= nz:            # one band covers the volume; keep the
                return -(-nz // HALO_Z) * HALO_Z   # block quantum anyway
            return bz
    return 4


def pad_shape_3d(nz: int, ny: int, nx: int, band: int) -> tuple:
    """Banded fine-level padded shape: nz to a band multiple, ny/nx even."""
    return -(-nz // band) * band, ny + ny % 2, nx + nx % 2


def pad_op_3d(c: StencilCoeffs3D, pz: int, py: int, px: int) -> StencilCoeffs3D:
    """Pad by trailing decoupled identity voxels (3D twin of
    multigrid._pad_op)."""
    if not (pz or py or px):
        return c
    lead = c.diag.ndim - 3
    pad = [(0, 0)] * lead + [(0, pz), (0, py), (0, px)]

    def z(a):
        return jnp.pad(a, pad)

    diag = jnp.pad(c.diag, pad, constant_values=1.0)
    return StencilCoeffs3D(
        a_w=z(c.a_w), a_e=z(c.a_e), a_n=z(c.a_n), a_s=z(c.a_s),
        a_u=z(c.a_u), a_d=z(c.a_d), diag=diag,
        diag_inv=jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0),
                           0.0),
        b=z(c.b))


def _win3(n_ref, b_ref, s_ref):
    """(HZ,ny,nx)+(BZ,ny,nx)+(HZ,ny,nx) refs -> one (BZ+2*HZ) window."""
    return jnp.concatenate([n_ref[...], b_ref[...], s_ref[...]], axis=0)


def _hwin3(n_ref, b_ref, s_ref, first, last):
    """Masked window for IN-ARRAY halo blocks: the north/south specs clamp
    their index at the global z edges (vcycle3d._specs3), so the edge
    bands' halo blocks alias arbitrary in-array rows and must read as the
    zero fill the old separate halo arrays carried.  ``first``/``last``
    are scalar bools (g == 0 / g == G-1); jnp.where (not a 0/1 multiply)
    so a neighbor image's Inf cannot poison this one's window as NaN."""
    nb = n_ref[...]
    sb = s_ref[...]
    nb = jnp.where(first, jnp.zeros_like(nb), nb)
    sb = jnp.where(last, jnp.zeros_like(sb), sb)
    return jnp.concatenate([nb, b_ref[...], sb], axis=0)


def _edge_flags(g_total):
    g = pl.program_id(1)
    return g == 0, g == g_total - 1


def _t1_kernel3(rb, rn, rs, awb, awn, aws, anb, ann, ans, aub, aun, aus,
                dib, din, dis, e_ref, rc_ref, *, BZ, nyc, nxc, omega, nu,
                g_total):
    """Pre-smooth + residual + 2x2x2 restriction on one z-slab."""
    h = HALO_Z
    first, last = _edge_flags(g_total)
    rw = _hwin3(rn, rb, rs, first, last)
    aww = _hwin3(awn, awb, aws, first, last)
    anw = _hwin3(ann, anb, ans, first, last)
    auw = _hwin3(aun, aub, aus, first, last)
    diw = _hwin3(din, dib, dis, first, last)
    dgw = _diag_of(diw)

    ws = smoothing_schedule(omega, nu)
    e = ws[0] * diw * rw
    for w in ws[1:]:
        e = _smooth3(aww, anw, auw, diw, e, rw, w)
    res = rw - (dgw * e - _nbsum3(aww, anw, auw, e))

    e_ref[...] = e[h:h + BZ]
    resb = res[h:h + BZ]
    t = resb.reshape(BZ // 2, 2, resb.shape[1], resb.shape[2]).sum(axis=1)
    rc_ref[...] = _restrict3_yx(t, nyc, nxc)


def _t2_kernel3(eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
                aub, aun, aus, dib, din, dis, ecb, ecn, ecs, z_ref, *,
                BZ, omega, nu, over, g_total):
    """Prolong + add + post-smooth on one z-slab.  The coarse correction
    arrives as its own banded window (BZ//2 + HALO_Z coarse slices cover
    the fine window exactly: fine slice g*BZ - HZ + j maps to coarse
    (g*BZ - HZ)/2 + j//2, both offsets even)."""
    h = HALO_Z
    first, last = _edge_flags(g_total)
    ew = _hwin3(en, eb, es_, first, last)
    rw = _hwin3(rn, rb, rs, first, last)
    aww = _hwin3(awn, awb, aws, first, last)
    anw = _hwin3(ann, anb, ans, first, last)
    auw = _hwin3(aun, aub, aus, first, last)
    diw = _hwin3(din, dib, dis, first, last)

    ecw = _hwin3(ecn, ecb, ecs, first, last)
    ny, nx = ew.shape[1], ew.shape[2]
    t = _prolong3_yx(ecw, ny, nx)                     # (BZ//2 + HZ, ny, nx)
    nzh = t.shape[0]
    t = jnp.broadcast_to(t[:, None], (nzh, 2, ny, nx)).reshape(2 * nzh, ny, nx)

    e = ew + over * t
    for w in reversed(smoothing_schedule(omega, nu)):
        e = _smooth3(aww, anw, auw, diw, e, rw, w)
    z_ref[...] = e[h:h + BZ]


def banded3(x, band):
    """(B, nz, ny, nx) -> the flattened banded body (B*G*band, ny, nx).

    Halo slices are NOT materialized: the banded kernels read them straight
    out of this same array through the clamped north/south BlockSpecs of
    :func:`_specs3` (pass the body three times), and the global-edge bands
    mask their aliased halo blocks to the zero fill in-kernel (_hwin3).
    The old separate halo arrays cost ~2 volume passes to build + stream
    per field per call — at band=8 (256^3) that was ~1/4 of the fused CG
    engine's per-iteration HBM traffic."""
    return x.reshape((-1,) + x.shape[-2:])


def _specs3(bsz, g_total, band, ny, nx):
    """Body + IN-ARRAY halo specs over a flattened (B*G*band, ny, nx)
    array.  Halo blocks are (HALO_Z, ny, nx) slices of the SAME array: the
    north halo of band g is the last HALO_Z rows of band g-1 (block index
    (b*G+g)*q - 1 in HALO_Z units, q = band/HALO_Z), the south halo the
    first HALO_Z rows of band g+1.  Edge bands clamp into valid range and
    the kernels zero-mask them (_hwin3).  Requires band % HALO_Z == 0
    (band_z_for only returns multiples)."""
    q = band // HALO_Z
    n_blocks = bsz * g_total * q
    body = pl.BlockSpec((band, ny, nx),
                        lambda b, g: (b * g_total + g, 0, 0),
                        memory_space=pltpu.VMEM)
    north = pl.BlockSpec(
        (HALO_Z, ny, nx),
        lambda b, g: (jnp.maximum((b * g_total + g) * q - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    south = pl.BlockSpec(
        (HALO_Z, ny, nx),
        lambda b, g: (jnp.minimum((b * g_total + g + 1) * q, n_blocks - 1),
                      0, 0),
        memory_space=pltpu.VMEM)
    return body, north, south


def _d_halo_specs3(bsz, g_total, band, ny, nx):
    """Second-ring halo specs for the matrix-free D window: (north2,
    south2) (HALO_Z, ny, nx) blocks at index g*q - 2 / (g+1)*q + 1 in
    HALO_Z units (one block beyond the _specs3 halos), clamped globally.
    The kernels zero-mask the clamped aliases (_dwin5)."""
    q = band // HALO_Z
    n_blocks = bsz * g_total * q
    north2 = pl.BlockSpec(
        (HALO_Z, ny, nx),
        lambda b, g: (jnp.maximum((b * g_total + g) * q - 2, 0), 0, 0),
        memory_space=pltpu.VMEM)
    south2 = pl.BlockSpec(
        (HALO_Z, ny, nx),
        lambda b, g: (jnp.minimum((b * g_total + g + 1) * q + 1,
                                  n_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM)
    return north2, south2


def _mf_flags(q, g_total):
    """Second-ring edge flags for :func:`_dwin5`, read at the TOP level of
    the kernel body (``pl.program_id`` inside a ``pl.when`` branch does not
    lower in interpret mode — the jump-#17 gotcha in docs/PERFORMANCE.md):
    n2 block falls before this image / s2 block falls past it."""
    g = pl.program_id(1)
    return g * q < 2, (g + 1) * q + 1 > g_total * q - 1


def _dwin5(db, dn2, dn1, ds1, ds2, *, f1, l1, f2, l2):
    """Double-halo D window (BZ + 4*HALO_Z, ny, nx) from five in-array
    blocks, zero-masking the blocks that fall outside this image's
    z-extent (D outside the domain is 0, so the recomputed face
    conductances vanish at the global z edges exactly like assembly's
    zero-plane concatenate, fvm3d.fvm_coefficients_3d).  ``f1``/``l1``
    are :func:`_edge_flags`, ``f2``/``l2`` :func:`_mf_flags` — all four
    computed at the kernel top level."""

    def m(flag, ref):
        v = ref[...]
        return jnp.where(flag, jnp.zeros_like(v), v)

    return jnp.concatenate(
        [m(f2, dn2), m(f1, dn1), db[...], m(l1, ds1), m(l2, ds2)], axis=0)


def _coeffs_from_dwin(dw, *, fx, fy, fz, bcf, nxr):
    """Recompute the level-0 stencil windows (aw, an, au, diag_inv), each
    (BZ + 2*HALO_Z, ny, nx), from a double-halo D window — term-for-term
    the assembly of fvm3d.fvm_coefficients_3d (a zero D on either side
    blocks the face exactly, see the harmonic-mean note below), with the
    Dirichlet diag add at the REAL x-boundary columns 0 and ``nxr - 1``
    (trailing x padding carries D = 0 -> zero coefficients + zero bc,
    i.e. fully decoupled rows; their diag is 0 instead of pad_op_3d's
    stored identity 1, which is equivalent because every field is 0
    there).  fx/fy/fz/bcf are the assembly's dy*dz/dx-style Python-float
    factors for the UNPADDED domain shape.

    The harmonic mean uses the guarded PRODUCT form ``2ab/(a+b)`` (one VPU
    divide) instead of assembly's reciprocal form ``2/(1/a+1/b)`` (three):
    identical zero structure (either side 0 -> exactly 0; both 0, the pads,
    guarded to 0), ~1-2 ulp apart on positive faces — the divides dominate
    the recompute's VPU cost (measured on the 2D twin at 2048^2)."""
    h = HALO_Z

    def hm(a, b):
        s = a + b
        return jnp.where(s > 0, (2.0 * a) * b / jnp.where(s > 0, s, 1.0),
                         jnp.zeros_like(s))

    hx = hm(dw[:, :, :-1], dw[:, :, 1:]) * fx
    hy = hm(dw[:, :-1, :], dw[:, 1:, :]) * fy
    hz = hm(dw[:-1], dw[1:]) * fz

    zx = jnp.zeros_like(dw[:, :, :1])
    zy = jnp.zeros_like(dw[:, :1, :])
    zz = jnp.zeros_like(dw[:1])
    aw = jnp.concatenate([zx, hx], axis=-1)
    ae = jnp.concatenate([hx, zx], axis=-1)
    an = jnp.concatenate([zy, hy], axis=-2)
    as_ = jnp.concatenate([hy, zy], axis=-2)
    au = jnp.concatenate([zz, hz], axis=0)
    ad = jnp.concatenate([hz, zz], axis=0)

    diag = aw + ae + an + as_ + au + ad
    col = jax.lax.broadcasted_iota(jnp.int32, diag.shape, 2)
    diag = diag + jnp.where((col == 0) | (col == nxr - 1), dw * bcf,
                            jnp.zeros_like(dw))
    di = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 0.0)

    sl = slice(h, dw.shape[0] - h)
    return aw[sl], an[sl], au[sl], di[sl]


def _coarse_specs3(bsz, g_total, band, ny1, nx1):
    """Body + in-array halo specs for the banded coarse correction
    (B*G*(band//2), ny1, nx1): same construction as _specs3 at half
    granularity (q = (band/2)/(HALO_Z/2) = band/HALO_Z)."""
    q = band // HALO_Z
    n_blocks = bsz * g_total * q
    ecb = pl.BlockSpec((band // 2, ny1, nx1),
                       lambda b, g: (b * g_total + g, 0, 0),
                       memory_space=pltpu.VMEM)
    ecn = pl.BlockSpec(
        (HALO_Z // 2, ny1, nx1),
        lambda b, g: (jnp.maximum((b * g_total + g) * q - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    ecs = pl.BlockSpec(
        (HALO_Z // 2, ny1, nx1),
        lambda b, g: (jnp.minimum((b * g_total + g + 1) * q, n_blocks - 1),
                      0, 0),
        memory_space=pltpu.VMEM)
    return ecb, ecn, ecs


def coarse_tail3(levels, rc_flat, bsz, *, omega, nu, coarse_iters, over,
                 interpret):
    """Coarse correction on the assembled restricted residual (B*nzh, nyc,
    nxc), nzh = fine nz // 2: whole-VMEM fused cycle on levels[1:] when it
    fits, RECURSIVE banded cycle when it doesn't (256^3 -> 128^3 tail),
    XLA cycle as the last resort.  Returns (B, nz1, ny1, nx1) on
    levels[1]'s stored shape."""
    c1 = levels[1]
    nz1, ny1, nx1 = c1.diag.shape[-3:]
    nzh = rc_flat.shape[0] // bsz
    r_c = rc_flat.reshape(bsz, nzh, ny1, nx1)
    if nz1 > nzh:
        r_c = jnp.pad(r_c, [(0, 0), (0, nz1 - nzh), (0, 0), (0, 0)])
    if vcycle3d_fits_vmem(nz1, ny1, nx1, r_c.dtype.itemsize):
        return v_cycle3d_pallas(levels[1:], r_c, omega=omega, nu=nu,
                                coarse_iters=coarse_iters, over=over,
                                interpret=interpret)
    if nz1 % 2 == 0 and len(levels) > 2:
        band = band_z_for(nz1, ny1, nx1, r_c.dtype.itemsize)
        if nz1 % band == 0:
            return v_cycle3d_tiled(levels[1:], r_c, omega=omega, nu=nu,
                                   coarse_iters=coarse_iters, over=over,
                                   band=band, interpret=interpret)
    from ...solvers.solvers3d import v_cycle_3d

    return v_cycle_3d(levels[1:], r_c, nu1=nu, nu2=nu, omega=omega,
                      coarse_iters=coarse_iters, over=over)


@functools.partial(jax.jit, static_argnames=("omega", "nu", "coarse_iters",
                                             "over", "band", "interpret"))
@x32_kernel
def v_cycle3d_tiled(levels: List[StencilCoeffs3D], r: jax.Array, *,
                    omega: float = 0.8, nu: int = 1, coarse_iters: int = 32,
                    over: float = 1.8, band: int = 16,
                    interpret: bool = False) -> jax.Array:
    """Apply one fused V(nu, nu) cycle to (B, nz, ny, nx) past the VMEM cap:
    fine level streamed in z-slabs, coarse tail via :func:`coarse_tail3`.

    Requirements: levels from ``build_hierarchy_3d(pad_levels=True)`` on an
    operator padded to :func:`pad_shape_3d`; nz % band == 0, band even,
    nu <= HALO_Z - 1."""
    bsz, nz, ny, nx = r.shape
    if nz % band or band % HALO_Z or nu > HALO_Z - 1:
        raise ValueError(f"v_cycle3d_tiled: nz={nz} % band={band}, band % "
                         f"{HALO_Z} == 0, nu<={HALO_Z - 1} required")
    c0 = levels[0]
    g_total = nz // band
    dtype = r.dtype
    ny1, nx1 = levels[1].diag.shape[-2:]

    rb = banded3(r, band)
    coef_ops = []
    for plane in (c0.a_w, c0.a_n, c0.a_u, c0.diag_inv):
        pf = banded3(plane.reshape(r.shape), band)
        coef_ops.extend((pf, pf, pf))

    body, north, south = _specs3(bsz, g_total, band, ny, nx)
    cspec = [body, north, south]
    win_bytes = (band + 2 * HALO_Z) * ny * nx * dtype.itemsize
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(40 * win_bytes), 16 << 20),
                                 112 << 20))}

    hb = pl.BlockSpec((band // 2, ny1, nx1),
                      lambda b, g: (b * g_total + g, 0, 0),
                      memory_space=pltpu.VMEM)

    t1 = functools.partial(_t1_kernel3, BZ=band, nyc=ny1, nxc=nx1,
                           omega=omega, nu=nu, g_total=g_total)
    e_b, rc_b = pl.pallas_call(
        t1,
        grid=(bsz, g_total),
        in_specs=cspec * 5,
        out_shape=[
            jax.ShapeDtypeStruct((bsz * nz, ny, nx), dtype),
            jax.ShapeDtypeStruct((bsz * g_total * (band // 2), ny1, nx1),
                                 dtype),
        ],
        out_specs=[body, hb],
        interpret=interpret,
        **params,
    )(rb, rb, rb, *coef_ops)

    e_c = coarse_tail3(levels, rc_b, bsz, omega=omega, nu=nu,
                       coarse_iters=coarse_iters, over=over,
                       interpret=interpret)

    # the coarse correction windows read in-array too (HALO_Z//2 halos)
    ecf = e_c[:, : nz // 2].reshape((-1, ny1, nx1))
    ecb_spec, ecn_spec, ecs_spec = _coarse_specs3(bsz, g_total, band,
                                                  ny1, nx1)

    t2 = functools.partial(_t2_kernel3, BZ=band, omega=omega, nu=nu,
                           over=over, g_total=g_total)
    z_b = pl.pallas_call(
        t2,
        grid=(bsz, g_total),
        in_specs=cspec * 6 + [ecb_spec, ecn_spec, ecs_spec],
        out_shape=jax.ShapeDtypeStruct((bsz * nz, ny, nx), dtype),
        out_specs=body,
        interpret=interpret,
        **params,
    )(e_b, e_b, e_b, rb, rb, rb, *coef_ops, ecf, ecf, ecf)
    return z_b.reshape(bsz, nz, ny, nx)

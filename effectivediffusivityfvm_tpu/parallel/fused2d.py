"""Sharded + fused composition: per-shard Pallas T1/T2 V-cycle kernels
under shard_map with ppermute'd halo strips.

The row-sharded MGCG (parallel/halo.py) previously ran its V-cycle as XLA
sweeps with a 1-row halo exchange per sweep.  The banded-kernel insight
(ops/kernels/vcycle_tiled.py) maps 1:1 onto spatial shards: a shard IS a
band, so exchanging a HALO-row strip ONCE per level lets the whole
pre-smooth + residual + restriction (T1) and prolongation + add +
post-smooth (T2) run as single Pallas kernels on the local block, exact on
the shard interior by the same window-validity invariant — nu sweeps + the
residual invalidate nu+1 window-edge rows < HALO = 8.  Communication per
cycle level drops from 2*nu+2 one-row ppermutes to three HALO-row
ppermutes (r; e_pre + coarse correction), and the smoothing arithmetic
moves from HBM-streaming XLA ops to VMEM-resident VPU work.

Alignment note: shard-local fine row j of the window (which starts HALO
rows above the local block) maps to coarse window index j // 2 exactly,
because HALO is even and every shard starts on an even global row — so the
prolongation selection operator needs no runtime offset (unlike the banded
kernel's g*H - h form).

Levels too small for a HALO strip (local ny < HALO) or too large for a
whole-local-block VMEM window fall back to the XLA sharded cycle from that
level down; the replicated coarse tail is shared with the XLA path.

Reference analog: the hot kernel updateX_SOR (Deff2D.cuh:69-92) x
SURVEY §2.6's SP row; the reference itself is single-GPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import fvm
from ..ops.kernels.vcycle_vmem import (_dg, _diag_of, _nbsum, _sel,
                                       smoothing_schedule)
from ..ops.kernels.vcycle_tiled import HALO, _pre_kernel, _smooth_w

__all__ = ["v_cycle_sharded_fused", "fused_shard_level_ok", "shard_band"]


def _window_fits(rows: int, nx: int, itemsize: int) -> bool:
    return 16 * (rows + 2 * HALO) * nx * itemsize < 100 * 1024 * 1024


def shard_band(ny_local: int, nx: int, itemsize: int = 4) -> int:
    """Band height for the in-shard fused T1/T2 kernels: the whole local
    block when its window fits VMEM, else the largest power-of-two
    divisor band that fits (in-shard banding — lifts the ~1024² local
    cap).  0 = no usable band (fall back to the XLA sweeps)."""
    if ny_local < HALO or ny_local % 2 or nx % 2:
        return 0
    if _window_fits(ny_local, nx, itemsize):
        return ny_local
    b = ny_local
    while b % 2 == 0 and b > HALO:
        b //= 2
        if b >= HALO and _window_fits(b, nx, itemsize):
            # bands below HALO rows can't carry their own halo slices
            # (_banded_shard slices band-HALO rows of the previous band)
            return b
    return 0


def fused_shard_level_ok(ny_local: int, nx: int, itemsize: int = 4) -> bool:
    """Whether a sharded level can run the fused T1/T2 kernels (whole
    local block or in-shard banded)."""
    return shard_band(ny_local, nx, itemsize) > 0


def _halo_strips(x, axis_name: str, h: int):
    """Exchange h-row halo strips along ``axis_name`` (zeros at edges)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        z = jnp.zeros_like(x[..., :h, :])
        return z, z
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    north = jax.lax.ppermute(x[..., -h:, :], axis_name, down)
    south = jax.lax.ppermute(x[..., :h, :], axis_name, up)
    return north, south


def _win2(n_ref, b_ref, s_ref):
    return jnp.concatenate([n_ref[0], b_ref[0], s_ref[0]], axis=0)


def _t1s_kernel(rb, rn, rs, awb, awn, aws, anb, ann, ans, dib, din, dis,
                e_ref, rc_ref, *, H, omega, nu):
    """Pre-smooth + residual + restriction on one shard's whole block."""
    h = HALO
    rw = _win2(rn, rb, rs)
    aww = _win2(awn, awb, aws)
    anw = _win2(ann, anb, ans)
    diw = _win2(din, dib, dis)
    dgw = _diag_of(diw)

    ws = smoothing_schedule(omega, nu)
    e = ws[0] * diw * rw
    for w in ws[1:]:
        e = _smooth_w(aww, anw, diw, e, rw, w)
    res = rw - (dgw * e - _nbsum(aww, anw, e))

    e_ref[0] = e[h:h + H]
    resb = res[h:h + H]
    ry = _sel(H // 2, H, res.dtype)
    rx = _sel(resb.shape[1] // 2, resb.shape[1], res.dtype)
    t = _dg(ry, resb, (((1,), (0,)), ((), ())), split="b")
    rc_ref[0] = _dg(t, rx, (((1,), (1,)), ((), ())), split="a")


def _t2s_kernel(eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
                dib, din, dis, ecb, ecn, ecs, z_ref, *, H, omega, nu, over):
    """Prolong + add + post-smooth on one shard's whole block.  The coarse
    correction arrives as its own windowed strip (HALO//2-row halos): fine
    window row j maps to coarse window row j // 2 (see module docstring)."""
    h = HALO
    ew = _win2(en, eb, es_)
    rw = _win2(rn, rb, rs)
    aww = _win2(awn, awb, aws)
    anw = _win2(ann, anb, ans)
    diw = _win2(din, dib, dis)

    ec = jnp.concatenate([ecn[0], ecb[0], ecs[0]], axis=0)  # (wy//2, nxc)
    wy = H + 2 * h
    nxc = ec.shape[1]
    ry = _sel(ec.shape[0], wy, ec.dtype)        # S[I, i] = [i//2 == I]
    t = _dg(ry, ec, (((0,), (0,)), ((), ())), split="b")       # (wy, nxc)
    nx = ew.shape[1]
    px = _sel(nxc, nx, ec.dtype)
    ecw = _dg(t, px, (((1,), (0,)), ((), ())), split="a")      # (wy, nx)

    e = ew + over * ecw
    for w in reversed(smoothing_schedule(omega, nu)):
        e = _smooth_w(aww, anw, diw, e, rw, w)
    z_ref[0] = e[h:h + H]


def _spec(rows, nx):
    return pl.BlockSpec((1, rows, nx), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _t2b_kernel(eb, en, es_, rb, rn, rs, awb, awn, aws, anb, ann, ans,
                dib, din, dis, ec_ref, z_ref, *, H, omega, nu, over):
    """In-shard BANDED T2: band ``g``'s fine window row j maps to row
    (g*H + j) // 2 of the halo-AUGMENTED local coarse plane
    (concat(north halo, local coarse, south halo), HALO//2-row halos) —
    the whole-block mapping generalized with the band offset; exact at
    every band including the shard edges."""
    h = HALO
    ew = jnp.concatenate([en[0, 0], eb[0, 0], es_[0, 0]], axis=0)
    rw = jnp.concatenate([rn[0, 0], rb[0, 0], rs[0, 0]], axis=0)
    aww = jnp.concatenate([awn[0, 0], awb[0, 0], aws[0, 0]], axis=0)
    anw = jnp.concatenate([ann[0, 0], anb[0, 0], ans[0, 0]], axis=0)
    diw = jnp.concatenate([din[0, 0], dib[0, 0], dis[0, 0]], axis=0)

    ec = ec_ref[0]                               # (ny_l//2 + HALO, nxc)
    wy = H + 2 * h
    g = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (wy, ec.shape[0]), 0) + g * H
    cols = jax.lax.broadcasted_iota(jnp.int32, (wy, ec.shape[0]), 1)
    sel_y = ((rows // 2) == cols).astype(ec.dtype)
    t = _dg(sel_y, ec, (((1,), (0,)), ((), ())), split="b")    # (wy, nxc)
    nx = ew.shape[1]
    px = _sel(ec.shape[1], nx, ec.dtype)
    ecw = _dg(t, px, (((1,), (0,)), ((), ())), split="a")      # (wy, nx)

    e = ew + over * ecw
    for w in reversed(smoothing_schedule(omega, nu)):
        e = _smooth_w(aww, anw, diw, e, rw, w)
    z_ref[0, 0] = e[h:h + H]


def _banded_shard(x, band, axis_name):
    """(B, ny_l, nx) -> banded (B, G, band, nx) + (B, G, HALO, nx) north/
    south halo arrays; the shard-edge halos come from the ring neighbors
    (ppermute) instead of zeros."""
    bsz, ny_l, nx = x.shape
    g = ny_l // band
    xb = x.reshape(bsz, g, band, nx)
    pn, ps = _halo_strips(x, axis_name, HALO)
    north = jnp.concatenate([pn[:, None], xb[:, :-1, band - HALO:]], axis=1)
    south = jnp.concatenate([xb[:, 1:, :HALO], ps[:, None]], axis=1)
    return xb, north, south


def _bspec(g_total, rows, nx):
    return pl.BlockSpec((1, 1, rows, nx), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)


def _coef_windows(sharded_levels, axis_name):
    """Per-level (aw, an, dinv) bodies + ppermuted halo strips, exchanged
    once per solve (coefficients are loop-invariant)."""
    out = []
    for c in sharded_levels:
        planes = []
        for p in (c.a_w, c.a_n, c.diag_inv):
            n, s = _halo_strips(p, axis_name, HALO)
            planes.extend([p, n, s])
        out.append(planes)
    return out


def build_fused_tail(sharded_levels, axis_name, min_size):
    """Early-gather whole-VMEM tail for the fused recursion (the
    launch-bound remainder of docs/PERFORMANCE.md jump #11): find the
    FIRST coarse level whose full gathered grid fits the whole-VMEM cycle
    kernel, all_gather its operator ONCE per solve, and build the
    pad_levels replicated hierarchy from it.  The fused recursion then
    runs everything from that level as ONE ``v_cycle_pallas`` call per
    application — each shard redundantly computes the full coarse cycle
    (in-VMEM sweeps are nearly free, ~70 Gcell/s resident) — instead of 2
    kernels + 2 halo exchanges per remaining level plus the all-gathered
    XLA coarse soup.  Same math as the sharded recursion (the gathered
    local-coarsened operator equals the global Galerkin operator), so
    results agree to kernel rounding.  Returns ``(tail_level,
    tail_levels)`` or ``(None, None)`` when no level qualifies."""
    from ..ops.kernels.vcycle_vmem import vcycle_fits_vmem
    from ..solvers.multigrid import build_hierarchy

    n_sh = jax.lax.axis_size(axis_name)
    for lvl in range(1, len(sharded_levels)):
        c = sharded_levels[lvl]
        ny_l, nx_l = c.diag.shape[-2], c.diag.shape[-1]
        full = ny_l * n_sh
        if not vcycle_fits_vmem(full + full % 2, nx_l + nx_l % 2,
                                c.diag.dtype.itemsize):
            continue
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis_name, axis=a.ndim - 2,
                                         tiled=True), c)
        gb = gathered if gathered.diag.ndim == 3 else jax.tree.map(
            lambda a: a[None], gathered)
        levels = build_hierarchy(gb, min_size=min_size, pad_levels=True)
        return lvl, levels
    return None, None


def v_cycle_sharded_fused(sharded_levels, replicated_levels, coef_wins, r, *,
                          nu, omega, coarse_iters, over, axis_name,
                          level=0, interpret=False, tail=None):
    """Fused sharded V(nu, nu) cycle: per-shard whole-block Pallas T1/T2
    with HALO-strip ppermutes; XLA fallback (parallel/halo.py) for levels
    that fail :func:`fused_shard_level_ok`; replicated tail shared with the
    XLA path, or the early-gather whole-VMEM tail when ``tail`` (from
    :func:`build_fused_tail`) is set.  ``r`` is (..., ny_local, nx) —
    batch dims normalized here.

    The top-level call traces under ``jax.enable_x64(False)`` when the
    operands are f32 (the x32_kernel guard, see vcycle_vmem.py): Mosaic
    cannot lower the weak-i64 literals an x64-enabled trace bakes into
    kernel bodies and BlockSpec index maps."""
    if level == 0 and r.dtype == jnp.float32:
        with jax.enable_x64(False):
            return _v_cycle_sharded_fused_impl(
                sharded_levels, replicated_levels, coef_wins, r, nu=nu,
                omega=omega, coarse_iters=coarse_iters, over=over,
                axis_name=axis_name, level=level, interpret=interpret,
                tail=tail)
    return _v_cycle_sharded_fused_impl(
        sharded_levels, replicated_levels, coef_wins, r, nu=nu, omega=omega,
        coarse_iters=coarse_iters, over=over, axis_name=axis_name,
        level=level, interpret=interpret, tail=tail)


def _band_from_windows(body, north, south, band):
    """Band a plane whose shard-edge halo strips are already exchanged
    (coefficients: _coef_windows does the ppermute once per solve)."""
    bsz, ny_l, nx = body.shape
    g = ny_l // band
    xb = body.reshape(bsz, g, band, nx)
    n = jnp.concatenate([north[:, None], xb[:, :-1, band - HALO:]], axis=1)
    s = jnp.concatenate([xb[:, 1:, :HALO], south[:, None]], axis=1)
    return xb, n, s


def _banded_level(sharded_levels, replicated_levels, coef_wins, rb, coefs,
                  band, batched, *, nu, omega, coarse_iters, over,
                  axis_name, level, interpret, tail=None):
    """In-shard banded T1/T2 for local blocks past the whole-window VMEM
    cap: vcycle_tiled's T1 kernel per band + the band-offset T2
    (_t2b_kernel), shard-edge halos from the ring neighbors."""
    bsz, ny_l, nx_l = rb.shape
    g_total = ny_l // band
    dtype = rb.dtype

    cb = []
    for i in range(0, 9, 3):
        cb.extend(_band_from_windows(coefs[i], coefs[i + 1], coefs[i + 2],
                                     band))
    rbnd = _banded_shard(rb, band, axis_name)

    body = _bspec(g_total, band, nx_l)
    halo = _bspec(g_total, HALO, nx_l)
    cspec = [body, halo, halo]
    win_bytes = (band + 2 * HALO) * nx_l * dtype.itemsize
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(40 * win_bytes), 112 << 20))}

    t1 = functools.partial(_pre_kernel, H=band, omega=omega, nu=nu)
    e_b, rc_b = pl.pallas_call(
        t1,
        grid=(bsz, g_total),
        in_specs=cspec * 4,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, g_total, band, nx_l), dtype),
            jax.ShapeDtypeStruct((bsz, g_total, band // 2, nx_l // 2),
                                 dtype),
        ],
        out_specs=[body, _bspec(g_total, band // 2, nx_l // 2)],
        interpret=interpret,
        **params,
    )(*rbnd, *cb)

    rc = rc_b.reshape(bsz, ny_l // 2, nx_l // 2)
    e_c = _v_cycle_sharded_fused_impl(
        sharded_levels, replicated_levels, coef_wins,
        rc if batched else rc[0], nu=nu, omega=omega,
        coarse_iters=coarse_iters, over=over, axis_name=axis_name,
        level=level + 1, interpret=interpret, tail=tail)
    ecb3 = e_c if batched else e_c[None]
    ecn, ecs = _halo_strips(ecb3, axis_name, HALO // 2)
    ec_aug = jnp.concatenate([ecn, ecb3, ecs], axis=1)

    ebnd = _banded_shard(e_b.reshape(bsz, ny_l, nx_l), band, axis_name)
    ec_spec = pl.BlockSpec((1, ec_aug.shape[1], ec_aug.shape[2]),
                           lambda b, g: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    t2 = functools.partial(_t2b_kernel, H=band, omega=omega, nu=nu,
                           over=over)
    params2 = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(40 * win_bytes
                    + 4 * ec_aug.shape[1] * ec_aug.shape[2]
                    * dtype.itemsize), 112 << 20))}
    z_b = pl.pallas_call(
        t2,
        grid=(bsz, g_total),
        in_specs=cspec * 5 + [ec_spec],
        out_shape=jax.ShapeDtypeStruct((bsz, g_total, band, nx_l), dtype),
        out_specs=body,
        interpret=interpret,
        **params2,
    )(*ebnd, *rbnd, *cb, ec_aug)
    z = z_b.reshape(bsz, ny_l, nx_l)
    return z if batched else z[0]


def _v_cycle_sharded_fused_impl(sharded_levels, replicated_levels, coef_wins,
                                r, *, nu, omega, coarse_iters, over,
                                axis_name, level, interpret, tail=None):
    from .halo import _v_cycle_sharded_2d

    if tail is not None and tail[0] is not None and level == tail[0]:
        # early-gather whole-VMEM tail (build_fused_tail): one fused cycle
        # kernel for every remaining level, computed redundantly per shard
        from ..ops.kernels.vcycle_vmem import v_cycle_pallas

        tail_levels = tail[1]
        batched = r.ndim == 3
        rb = r if batched else r[None]
        ny_local = rb.shape[-2]
        r_full = jax.lax.all_gather(rb, axis_name, axis=1, tiled=True)
        ny_f, nx_f = r_full.shape[-2], r_full.shape[-1]
        py, px = tail_levels[0].diag.shape[-2:]
        if (py, px) != (ny_f, nx_f):
            r_full = jnp.pad(r_full,
                             [(0, 0), (0, py - ny_f), (0, px - nx_f)])
        e_full = v_cycle_pallas(tail_levels, r_full, omega=omega, nu=nu,
                                coarse_iters=coarse_iters, over=over,
                                interpret=interpret)[..., :ny_f, :nx_f]
        idx = jax.lax.axis_index(axis_name)
        e = jax.lax.dynamic_slice_in_dim(e_full, idx * ny_local, ny_local,
                                         axis=1)
        return e if batched else e[0]

    if level == len(sharded_levels):
        r_full = jax.lax.all_gather(r, axis_name, axis=r.ndim - 2, tiled=True)
        from ..solvers import multigrid as mg

        e_full = mg.v_cycle(replicated_levels, r_full, nu1=nu, nu2=nu,
                            omega=omega, coarse_iters=coarse_iters, over=over)
        idx = jax.lax.axis_index(axis_name)
        ny_local = r.shape[-2]
        return jax.lax.dynamic_slice_in_dim(
            e_full, idx * ny_local, ny_local, axis=e_full.ndim - 2)

    ny_l, nx_l = r.shape[-2], r.shape[-1]
    band = shard_band(ny_l, nx_l, r.dtype.itemsize)
    if band == 0:
        return _v_cycle_sharded_2d(
            sharded_levels, replicated_levels, r, nu1=nu, nu2=nu,
            omega=omega, coarse_iters=coarse_iters, over=over,
            axis_name=axis_name, level=level)

    batched = r.ndim == 3
    rb = r if batched else r[None]
    bsz = rb.shape[0]
    coefs = [p if batched else p[None] for p in coef_wins[level]]

    if band < ny_l:
        return _banded_level(sharded_levels, replicated_levels, coef_wins,
                             rb, coefs, band, batched, nu=nu, omega=omega,
                             coarse_iters=coarse_iters, over=over,
                             axis_name=axis_name, level=level,
                             interpret=interpret, tail=tail)

    rn, rs = _halo_strips(rb, axis_name, HALO)
    body, halo = _spec(ny_l, nx_l), _spec(HALO, nx_l)
    cspec = [body, halo, halo]
    win_bytes = (ny_l + 2 * HALO) * nx_l * r.dtype.itemsize
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(int(40 * win_bytes), 112 << 20))}

    t1 = functools.partial(_t1s_kernel, H=ny_l, omega=omega, nu=nu)
    e_pre, rc = pl.pallas_call(
        t1,
        grid=(bsz,),
        in_specs=cspec * 4,
        out_shape=[jax.ShapeDtypeStruct((bsz, ny_l, nx_l), r.dtype),
                   jax.ShapeDtypeStruct((bsz, ny_l // 2, nx_l // 2),
                                        r.dtype)],
        out_specs=[body, _spec(ny_l // 2, nx_l // 2)],
        interpret=interpret,
        **params,
    )(rb, rn, rs, *coefs)

    rc_r = rc if batched else rc[0]
    e_c = _v_cycle_sharded_fused_impl(
        sharded_levels, replicated_levels, coef_wins, rc_r, nu=nu,
        omega=omega, coarse_iters=coarse_iters, over=over,
        axis_name=axis_name, level=level + 1, interpret=interpret,
        tail=tail)
    ecb = e_c if batched else e_c[None]
    ecn, ecs = _halo_strips(ecb, axis_name, HALO // 2)

    en, es_ = _halo_strips(e_pre, axis_name, HALO)
    t2 = functools.partial(_t2s_kernel, H=ny_l, omega=omega, nu=nu,
                           over=over)
    hc = _spec(HALO // 2, nx_l // 2)
    z = pl.pallas_call(
        t2,
        grid=(bsz,),
        in_specs=cspec * 5 + [_spec(ny_l // 2, nx_l // 2), hc, hc],
        out_shape=jax.ShapeDtypeStruct((bsz, ny_l, nx_l), r.dtype),
        out_specs=body,
        interpret=interpret,
        **params,
    )(e_pre, en, es_, rb, rn, rs, *coefs, ecb, ecn, ecs)
    return z if batched else z[0]

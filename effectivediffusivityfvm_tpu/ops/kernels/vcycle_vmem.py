"""Whole-V-cycle Pallas kernel: the entire multigrid hierarchy in VMEM.

The XLA V-cycle (solvers/multigrid.v_cycle) runs each level's smooth /
residual / restrict / prolong as separate HBM-resident ops — measured 5.5
matvec-equivalents (~80% of MGCG cost) per cycle at 512^2, ~2 of them fixed
overhead in the tiny deep levels.  Because the hierarchy shrinks
geometrically, ALL levels' coefficient planes sum to only 4/3 x 3 planes
(~4 MB at 512^2 fp32), so one pallas_call runs the entire V(nu, nu) cycle
per image in a single VMEM residency: HBM traffic per preconditioner
application drops to reading the pyramid + r and writing z (~7 fine-plane
equivalents, vs ~38 for the XLA cycle), and extra smoothing sweeps are FREE
(VPU-bound at ~70 Gcell/s once resident — measured; the bandwidth-optimal
cycle strength moves from V(1,1) to V(2,2), which also cuts PCG iterations
~40%).  Measured end-to-end on the 64 x 512^2 contrast-1e6 bench:
82 -> 262 solves/s.

VMEM budget: v5e has ~128 MB of physical VMEM; the 16 MB "scoped" default is
a compiler setting, raised per-kernel via CompilerParams(vmem_limit_bytes=)
(probed: a 120 MB-resident kernel compiles and runs at full speed; Mosaic
double-buffers every grid-pipelined input, so budget 2x for inputs/outputs).

Mosaic notes (probed on this platform):
  * reshape-based 2x2 block sums and strided slices do NOT compile;
    restriction/prolongation are MXU matmuls against 0/1 selection operators
    built in-kernel from ``broadcasted_iota`` (R: (m_out, m_in) with
    R[I, i] = [i//2 == I]; restrict = R_y res R_x^T, prolong = R_y^T e_c R_x).
    Padded-even coarse rows select nothing, reproducing the XLA cycle's
    decoupled-identity padding semantics exactly.
  * neighbor shifts use ``pltpu.roll`` with the symmetric-stencil
    reconstruction (east term = roll(a_w * x), as in jacobi_vmem.py) —
    boundary conductances are zero by assembly so wrap-around is inert.
  * the diagonal is recomputed as 1/diag_inv (0 where diag_inv == 0), saving
    a fourth coefficient plane; it differs from the XLA cycle only on
    guard-floored coarse cells (diag <= 1e-6 * scale, see multigrid.coarsen)
    where the contribution is numerically nil either way.

Semantics match solvers/multigrid.v_cycle with nu1 = nu2 = 1 (verified in
interpreter mode to fp32 rounding); levels must be stored pre-padded to even
dims (build_hierarchy(pad_levels=True)) except the coarsest.  Reference
hot-kernel analog: updateX_SOR, Deff2D.cuh:69-92.
"""

from __future__ import annotations

import functools
import os
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm import StencilCoeffs

__all__ = ["v_cycle_pallas", "vcycle_fits_vmem"]

# MXU precision for the in-kernel restriction/prolongation matmuls.  One
# operand is always a 0/1 selection matrix (exact in bf16), so full
# HIGHEST (6-pass bf16x6 on BOTH operands) over-pays: splitting only the
# data operand into k bf16 terms and accumulating k DEFAULT-precision MXU
# passes (the MXU multiplies bf16 exactly and accumulates in f32) gives
# bf16xk fidelity on the data at k passes — k=3 is f32-equivalent, k=2
# keeps ~16 mantissa bits.  Plain DEFAULT (k=1, 8-bit mantissa) measurably
# degrades the preconditioner (doubled tail iteration counts — round-2
# sweep); Mosaic does not lower Precision.HIGH.  Modes via DEFF_MM_PREC:
# highest | split3 | split2 | default.  split3 is the default: f32-parity
# fidelity (iteration counts identical to HIGHEST on the bench sweep) at
# half the MXU passes — 767 -> 827 solves/s on the 512^2 headline.
_MM_MODE = os.environ.get("DEFF_MM_PREC", "split3")
_MM_PREC = (jax.lax.Precision.DEFAULT if _MM_MODE == "default"
            else jax.lax.Precision.HIGHEST)


def _bf16_terms(x, k):
    """Decompose x (f32) into k terms whose first k-1 are exactly
    bf16-representable; summing the exact products reconstructs the
    bf16xk product."""
    terms = []
    rem = x
    for _ in range(k - 1):
        t = rem.astype(jnp.bfloat16).astype(x.dtype)
        terms.append(t)
        rem = rem - t
    terms.append(rem)
    return terms


def _dg(a, b, dims, split):
    """dot_general where the operand NOT named by ``split`` ("a"/"b") is a
    0/1 selection matrix: honors _MM_MODE (split modes only for f32 — f64
    runs, i.e. interpret-mode tests, keep the exact single dot)."""
    dtype = a.dtype
    if not _MM_MODE.startswith("split") or dtype != jnp.float32:
        return jax.lax.dot_general(a, b, dims, preferred_element_type=dtype,
                                   precision=_MM_PREC)
    k = int(_MM_MODE[-1])
    xs = _bf16_terms(a if split == "a" else b, k)
    out = None
    for t in xs:
        aa, bb = (t, b) if split == "a" else (a, t)
        p = jax.lax.dot_general(aa, bb, dims, preferred_element_type=dtype,
                                precision=jax.lax.Precision.DEFAULT)
        out = p if out is None else out + p
    return out


def x32_kernel(fn):
    """Trace a Pallas entry (kernel body + index maps) with x64 disabled
    when its operands are f32.

    Under ``jax_enable_x64`` (the dmg/f64 pipelines), Python scalar literals
    traced inside the kernel — including the BlockSpec index maps' ``0``s —
    become weak f64/int64 constants; Mosaic cannot lower the resulting
    f64->f32 converts (NotImplementedError), index maps returning i64 fail
    func.return legalization, and the int64->int32 case recurses forever in
    Mosaic's ``_convert_helper``.  The production kernels all compute in
    f32/int32, so the trace runs under ``jax.enable_x64(False)`` — arrays
    keep their dtypes, only the literal default changes.  f64 operands
    (interpret-mode CPU tests only) skip the guard: their arithmetic must
    stay f64, and interpret mode never lowers through Mosaic."""
    @functools.wraps(fn)
    def wrapped(*args, **kw):
        leaves = jax.tree_util.tree_leaves((args, kw))
        f64 = any(getattr(l, "dtype", None) == jnp.float64 for l in leaves)
        if f64:
            return fn(*args, **kw)
        with jax.enable_x64(False):
            return fn(*args, **kw)
    return wrapped


def smoothing_schedule(omega, nu):
    """Per-sweep damping factors for ``nu`` smoothing sweeps: a scalar
    replicates (classical fixed-damping Jacobi); a tuple of ``nu`` factors
    is applied in order pre-smoothing and REVERSED post-smoothing (cycle
    symmetry -> the MGCG preconditioner stays SPD), with the coarse solve
    sweeping at the last (most-damped) factor.  Chebyshev schedules over
    the smoother's target interval (benchmarks/bench_cheby.py: roots-of-T_k
    weights for D^-1 A on [lam_max/alpha, lam_max]) cut bench-medium MGCG
    iteration counts ~6-10% at alpha=3 vs fixed 0.8 — same cost/sweep."""
    if isinstance(omega, (tuple, list)):
        if len(omega) != nu:
            raise ValueError(f"omega schedule length {len(omega)} != nu={nu}")
        return tuple(float(w) for w in omega)
    return (float(omega),) * nu


def _nbsum(aw, an, x):
    """Neighbor sum for a symmetric stencil from the west/north planes only
    (same reconstruction as jacobi_vmem._kernel)."""
    ny, nx = x.shape
    xw = pltpu.roll(x, 1, axis=1)
    xn = pltpu.roll(x, 1, axis=0)
    east = pltpu.roll(aw * x, nx - 1, axis=1)
    south = pltpu.roll(an * x, ny - 1, axis=0)
    return aw * xw + east + an * xn + south


def _diag_of(di):
    return jnp.where(di > 0, 1.0 / jnp.where(di > 0, di, 1.0), 0.0)


def _sel(m_out, m_in, dtype):
    """(m_out, m_in) 0/1 operator with S[I, i] = [i // 2 == I]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m_out, m_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m_out, m_in), 1)
    return (cols // 2 == rows).astype(dtype)


def _spec(sy, sx):
    return pl.BlockSpec((1, sy, sx), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def vcycle_fits_vmem(ny: int, nx: int, itemsize: int = 4) -> bool:
    """Whether the whole-cycle fused kernel fits VMEM.

    v5e has ~128 MB of physical VMEM; the conservative 16 MB "scoped" default
    is a compiler setting, raised per-kernel via vmem_limit_bytes (measured:
    a 120 MB-resident kernel compiles and runs at full speed).  The fused
    cycle needs the 3-plane coefficient pyramid (x2, Mosaic double-buffers
    pipelined inputs), the r/e pyramids, selection operators, and working
    temporaries — ~16 plane-equivalents at the fine size."""
    plane = ny * nx * itemsize
    return 16 * plane < 100 * 1024 * 1024


def _build_sels(shapes, dtype):
    """Per level-pair (ry, rx) selection operators, shared by the restrict
    and prolong matmuls (the same 0/1 matrix contracts on opposite dims).
    Built ONCE per kernel launch and closed over by the iteration loop —
    rebuilding them inside the fused CG while_loop cost ~8 plane-equivalents
    of VPU iota/compare work per iteration (measured: hoisting them +
    the omega fold below was worth ~4% on the 512^2 headline)."""
    sels = []
    for l in range(len(shapes) - 1):
        ny, nx = shapes[l]
        nyc, nxc = shapes[l + 1]
        sels.append((_sel(nyc, ny, dtype), _sel(nxc, nx, dtype)))
    return sels


def _cycle_value(r0, lvl, shapes, omega, nu, coarse_iters, over, sels=None):
    """One V(nu, nu) cycle applied to the VALUE ``r0``, with all level
    planes already loaded (``lvl[l] = (aw, an, dinv, diag, wdi)`` — diag and
    the omega-folded inverses are reconstructed once per kernel launch in
    ``_load_levels``, not per iteration; ``wdi`` maps each schedule weight
    to its folded inverse).  ``omega`` may be a per-sweep schedule (see
    smoothing_schedule): applied in order pre, reversed post, last weight
    on the coarse solve.  Shared by the standalone whole-cycle kernel and
    the fused CG-iteration kernel (cgstep_vmem.py), which passes pre-built
    ``sels`` to hoist them out of its while_loop."""
    n_levels = len(shapes)
    ws = smoothing_schedule(omega, nu)
    if sels is None:
        sels = _build_sels(shapes, r0.dtype)

    def smooth(l, x, b, w):
        aw, an, _di, _dg, wdi = lvl[l]
        return (1.0 - w) * x + (b + _nbsum(aw, an, x)) * wdi[w]

    rs = [r0]
    es = []
    for l in range(n_levels - 1):
        aw, an, _di, dg, wdi = lvl[l]
        e = wdi[ws[0]] * rs[l]
        for w in ws[1:]:
            e = smooth(l, e, rs[l], w)
        res = rs[l] - (dg * e - _nbsum(aw, an, e))
        es.append(e)
        ry, rx = sels[l]
        t = _dg(ry, res, (((1,), (0,)), ((), ())), split="b")
        rs.append(_dg(t, rx, (((1,), (1,)), ((), ())), split="a"))

    lc = n_levels - 1
    e = jnp.zeros(shapes[lc], rs[lc].dtype)
    e = jax.lax.fori_loop(0, coarse_iters,
                          lambda _, x: smooth(lc, x, rs[lc], ws[-1]), e)

    for l in range(n_levels - 2, -1, -1):
        ry, rx = sels[l]
        t = _dg(ry, e, (((0,), (0,)), ((), ())), split="b")
        ep = _dg(t, rx, (((1,), (0,)), ((), ())), split="a")
        e = es[l] + over * ep
        for w in reversed(ws):
            e = smooth(l, e, rs[l], w)
    return e


def _load_levels(refs, n_levels, omega=None, nu=1):
    """refs = (aw_0, an_0, dinv_0, aw_1, ...) fine-to-coarse; returns
    ``(aw, an, dinv, diag, wdi)`` per level with the diagonal and the
    folded inverses (``wdi[w] = w * dinv``, the smoothers' only use of the
    inverse — one plane per DISTINCT schedule weight) reconstructed once
    per launch, not per iteration."""
    ws = (None,) if omega is None else smoothing_schedule(omega, nu)
    out = []
    for l in range(n_levels):
        aw, an, di = (ref[0] for ref in refs[3 * l:3 * l + 3])
        wdi = {w: (di if w is None else w * di) for w in set(ws)}
        out.append((aw, an, di, _diag_of(di), wdi))
    return out


def _whole_kernel(r_ref, *refs, z_ref, shapes, omega, nu, coarse_iters, over):
    """The entire V(nu, nu) cycle in one VMEM residency."""
    lvl = _load_levels(refs, len(shapes), omega, nu)
    z_ref[0] = _cycle_value(r_ref[0], lvl, shapes, omega, nu, coarse_iters,
                            over)


@functools.partial(jax.jit, static_argnames=("omega", "coarse_iters", "over",
                                             "nu", "interpret"))
@x32_kernel
def v_cycle_pallas(levels: List[StencilCoeffs], r: jax.Array, *,
                   omega: float = 0.8, coarse_iters: int = 32,
                   over: float = 1.8, nu: int = 1,
                   interpret: bool = False) -> jax.Array:
    """Apply one fused V(nu, nu) cycle to ``r``: (B, ny, nx) -> (B, ny, nx).

    One pallas_call per cycle: the whole coefficient pyramid rides VMEM, so
    HBM traffic is reading the pyramid + r and writing z (~7 fine-plane
    equivalents regardless of nu — extra smooths are free).  ``levels`` must
    have even dims on every level but the last
    (``build_hierarchy(pad_levels=True)``); level arrays are (B, ny_l, nx_l).
    """
    bsz, ny, nx = r.shape
    shapes = tuple((c.diag.shape[-2], c.diag.shape[-1]) for c in levels)
    for sy, sx in shapes[:-1]:
        if sy % 2 or sx % 2:
            raise ValueError("v_cycle_pallas needs even level dims "
                             "(build the hierarchy with pad_levels=True)")

    in_specs = [_spec(ny, nx)]
    operands = [r]
    for c, (sy, sx) in zip(levels, shapes):
        for plane in (c.a_w, c.a_n, c.diag_inv):
            in_specs.append(_spec(sy, sx))
            operands.append(plane)

    pyramid = sum(sy * sx for sy, sx in shapes)
    limit = int(4 * (2 * (3 * pyramid + 2 * ny * nx)       # double-buffered io
                     + 2 * pyramid + 6 * ny * nx))          # pyramids + temps
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=limit)}

    def kernel_wrap(r_ref, *rest):
        *coef_refs, z_ref = rest
        _whole_kernel(r_ref, *coef_refs, z_ref=z_ref, shapes=shapes,
                      omega=omega, nu=nu, coarse_iters=coarse_iters, over=over)

    return pl.pallas_call(
        kernel_wrap,
        grid=(bsz,),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        in_specs=in_specs,
        out_specs=_spec(ny, nx),
        interpret=interpret,
        **params,
    )(*operands)

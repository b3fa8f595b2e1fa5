"""Component-deflated PCG for extreme-contrast multiphase systems.

The 00042.jpg case study (docs/PERFORMANCE.md) shows why plain Krylov
methods die on the reference's own demo config: with Dg ~ 1e6, every
connected gas component behaves as a near-equipotential super-node, so the
operator has one near-kernel vector per component and κ ~ contrast × n².
Homotopy (the reference's answer) merely walks the contrast up slowly.

The structural fix is a two-level preconditioner whose coarse space is
exactly those components:

  W   = indicator vectors of the connected high-D components
        (disjoint supports -> W^T v is a segment-sum, W y is a gather)
  E   = W^T A W — the Galerkin coarse matrix, assembled in closed form from
        the face conductances crossing between components (same trick as the
        multigrid coarsening, but over arbitrary flood-fill components)
  and deflated PCG in projection form (Tang & Vuik):
      Q = W E^-1 W^T,   P v = v - A Q v
      iterate CG on  P A  with diagonal preconditioning; recover
      x = Q b + (I - Q A) x_hat.
  (The simpler additive-Schwarz form M^-1 = diag^-1 + Q loses conjugacy on
  large instances — measured stalling on the full 00042.jpg while the
  projection form converges; see git history.)

Component labeling reuses the connectivity infrastructure (scipy label over
the gas mask, periodic-Y like the flood fill); E is small and dense
(#components squared), Cholesky-factored once, applied per iteration with
two triangular solves — O(m^2) next to the O(N) matvec.

Registered as solver ``dcg`` (2-phase systems have no gas phase; it falls
back to plain diagonal PCG when no components are found).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, boundary_deff
from .driver import SolveResult, resolve_check_every
from .pcg import run_pcg

__all__ = ["DeflationSpace", "build_component_deflation", "run_deflated_pcg",
           "solve_dcg", "solve_dcg_batched"]


class DeflationSpace(NamedTuple):
    """Component coarse space with the inverse held in Jacobi-scaled
    FACTORED form: E = D^1/2 Ehat D^1/2 and the apply is
    y = D^-1/2 (Ehat^-1 (D^-1/2 rc)).

    Component conductances span many decades (κ(E) ~ 2.5e9 on the bundled
    00042.jpg) while κ(Ehat) ~ 1: applying a premultiplied dense E^-1 in
    f64 perturbs the weakly-coupled components' corrections by ~eps·κ(E)
    ~ 2.5e-7 relative — the measured ~6e-11 residual floor of the f64
    deflated solves.  The factored apply keeps every step relative-exact
    (diagonal scalings) or κ~1 (the Ehat^-1 matmul — dense inverse, not a
    triangular solve: TPU triangular-solve kernels fault on this
    platform)."""

    labels: jax.Array       # (ny, nx) int32; -1 = not in any component
    e_hat_inv: jax.Array    # (m, m) inverse of the unit-diagonal Ehat
    dhalf_inv: jax.Array    # (m,) 1/sqrt(diag(E))
    m: int                  # number of components (static)


def label_components(member: np.ndarray, periodic_y: bool = True) -> np.ndarray:
    """Connected 4-components of a boolean mask, periodic in Y (matching the
    flood-fill convention, Deff2D.cuh:640-671).  Returns int labels, -1
    outside, 0..m-1 inside (canonical)."""
    from scipy import ndimage

    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)
    lbl, num = ndimage.label(member, structure=structure)
    if num and periodic_y:
        parent = np.arange(num + 1)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        top, bot = lbl[0, :], lbl[-1, :]
        both = (top > 0) & (bot > 0)
        for a, b in zip(top[both], bot[both]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        roots = np.array([find(int(i)) for i in range(num + 1)])
        # compact to 0..m-1
        uniq = np.unique(roots[1:]) if num else np.array([], int)
        remap = np.full(num + 1, 0)
        remap[uniq] = np.arange(1, len(uniq) + 1)
        lbl = remap[roots[lbl]]
    return lbl.astype(np.int64) - 1


def _assemble_e_host(coeffs: fvm.StencilCoeffs, labels: np.ndarray,
                     m: int) -> np.ndarray:
    """E = W^T A W on the host (fetches the full coefficient planes)."""
    a_e = np.asarray(coeffs.a_e, np.float64)
    a_s = np.asarray(coeffs.a_s, np.float64)
    diag = np.asarray(coeffs.diag, np.float64)

    E = np.zeros((m, m))
    # diagonal: sum of row sums over the component = sum(diag) - 2*internal
    # built incrementally: start with sum of diagonals
    sel = labels >= 0
    np.add.at(E, (labels[sel], labels[sel]), diag[sel])

    # faces: each face (p, q) with conductance a contributes
    #   E[lp, lq] -= a, E[lq, lp] -= a     if both in (possibly different)
    #   components; internal faces therefore subtract 2a from the diagonal
    #   via the two symmetric off-diagonal hits when lp == lq.
    def add_faces(a_face, lp, lq):
        ok = (lp >= 0) & (lq >= 0) & (a_face != 0)
        np.add.at(E, (lp[ok], lq[ok]), -a_face[ok])
        np.add.at(E, (lq[ok], lp[ok]), -a_face[ok])

    # x faces: between (i, j) and (i, j+1): conductance a_e[i, j]
    add_faces(a_e[:, :-1], labels[:, :-1], labels[:, 1:])
    # y faces: between (i, j) and (i+1, j): conductance a_s[i, j]
    add_faces(a_s[:-1, :], labels[:-1, :], labels[1:, :])
    return E


def _assemble_e_device(coeffs: fvm.StencilCoeffs, labels: np.ndarray,
                       m: int, chunk: int = 128) -> np.ndarray:
    """E = W^T (A W) via m on-device matvecs; only (m, m) crosses to host.

    Fetching full f64 coefficient planes over the axon relay measured ~4
    minutes on the 2007x1002 demo image, and the scatter-add formulation
    measured ~5 minutes on-device (TPU scatter over 2M indices serializes).
    This form is all stencil shifts + dense reductions: W's indicator
    planes are built from the labels by comparison, A W is the vmapped
    operator apply, and the (m, m) contraction is one dot — ~50 ms for the
    demo image's 55 components.  ``chunk`` bounds the (chunk, ny, nx)
    working set for media with many components.
    """
    import jax.numpy as jnp

    if m > chunk:
        # many-component media: the (m, n) one-hot working set stops paying
        # for itself; the host path is O(N) regardless of m
        return _assemble_e_host(coeffs, labels, m)

    lab = jnp.asarray(labels, jnp.int32)
    dt = coeffs.diag.dtype
    n = labels.size

    @jax.jit
    def assemble():
        js = jnp.arange(m, dtype=jnp.int32)
        W = (lab[None, :, :] == js[:, None, None]).astype(dt)   # (m, ny, nx)
        AW = jax.vmap(lambda wj: fvm.apply_operator(coeffs, wj))(W)
        return jax.lax.dot_general(
            W.reshape(m, n), AW.reshape(m, n), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    return np.array(assemble(), np.float64)


def build_component_deflation(coeffs: fvm.StencilCoeffs,
                              member: np.ndarray,
                              periodic_y: bool = False,
                              jitter: float = 1e-12,
                              assemble_on_device: Optional[bool] = None,
                              ) -> Optional[DeflationSpace]:
    """Assemble the coarse space over the connected components of ``member``
    (typically the gas phase).  O(N) preprocessing; returns None when there
    are no components.

    ``periodic_y`` defaults to False: the coarse space must follow the
    OPERATOR's topology (no-flux y boundaries), not the flood fill's
    periodic convention — wrap-merged components are two independent
    equipotentials, and treating them as one both weakens the space and can
    make E singular.  Components with (numerically) zero external
    conductance — equipotential islands whose value cannot affect any flux —
    are dropped from the space for the same reason.

    ``assemble_on_device``: where to compute E = W^T A W.  None (default)
    assembles on device unless the backend is CPU — device assembly avoids
    pulling the full coefficient planes through the axon relay.
    """
    labels = label_components(np.asarray(member, bool), periodic_y)
    m = int(labels.max()) + 1
    if m <= 0:
        return None

    if assemble_on_device is None:
        import jax as _jax

        assemble_on_device = (isinstance(coeffs.diag, jax.Array)
                              and _jax.default_backend() != "cpu")
    E = (_assemble_e_device if assemble_on_device else _assemble_e_host)(
        coeffs, labels, m)

    # Drop decoupled components: the E row sum equals the component's total
    # external conductance (+ Dirichlet terms); ~zero means an equipotential
    # island whose value never influences any flux, and whose singular E row
    # would poison the inverse.
    row_ext = E.sum(axis=1)
    keep = row_ext > 1e-10 * max(np.max(np.abs(row_ext)), 1e-300)
    if not np.any(keep):
        return None
    if not np.all(keep):
        old_to_new = np.full(m, -1)
        old_to_new[keep] = np.arange(int(keep.sum()))
        remap = np.concatenate([old_to_new, [-1]])   # labels == -1 stay -1
        labels = remap[labels]
        E = E[np.ix_(keep, keep)]
        m = int(keep.sum())

    E += jitter * np.trace(E) / m * np.eye(m)
    # Keep the inverse FACTORED (see the DeflationSpace docstring): the
    # dense product D^-1/2 Ehat^-1 D^-1/2 spans κ(E) decades and its f64
    # matmul apply floors the deflated solves at ~eps·κ(E).
    dhalf = np.sqrt(np.diag(E))
    e_hat = E / dhalf[:, None] / dhalf[None, :]
    return DeflationSpace(
        labels=jnp.asarray(labels, jnp.int32),
        e_hat_inv=jnp.asarray(np.linalg.inv(e_hat), coeffs.diag.dtype),
        dhalf_inv=jnp.asarray(1.0 / dhalf, coeffs.diag.dtype),
        m=m,
    )


_COARSE_CHUNK = 16      # components per one-hot plane-pass (bounds the
                        # (chunk, ny, nx) fused working set)


def _coarse_apply(defl: DeflationSpace, r: jax.Array,
                  weight: Optional[jax.Array] = None) -> jax.Array:
    """W E^-1 W^T r via chunked one-hot masked reductions.

    W^T r and W y are NOT computed as segment-sum/gather: TPU scatter/gather
    over 2M cell indices serializes (~100 ms/apply measured on the bundled
    2007x1002 demo image).  Because W's columns are indicator planes,
    both ops are compare+select+reduce over the label plane —
      (W^T r)[j] = sum(where(labels == j, r, 0))
      (W y)[c]   = sum_j where(labels[c] == j, y[j], 0)
    — processed ``_COARSE_CHUNK`` components per pass so XLA fuses the
    broadcast compare into the reduction and the whole apply streams the
    label/residual planes at HBM bandwidth (ceil(m/chunk) passes), exact in
    f64 (disjoint supports: the scatter-back sum has at most one hit/cell).

    ``weight`` generalizes the space to per-cell-scaled indicators
    W' = diag(weight) W (disjoint supports are preserved, so the apply stays
    a weighted masked-sum + weighted broadcast).  Used by the equilibrated
    engine: for A' = S A S the near-kernel is S^-1 W, i.e. weight =
    1/s = sqrt(diag) — and E' = W'^T A' W' = W^T A W = E is unchanged.
    """
    lab = defl.labels
    rr = r * weight if weight is not None else r
    m = defl.m
    spans = [(j0, min(j0 + _COARSE_CHUNK, m))
             for j0 in range(0, m, _COARSE_CHUNK)]
    bshape = (-1,) + (1,) * lab.ndim            # dimension-agnostic (2D/3D)
    axes = tuple(range(1, lab.ndim + 1))
    zero = jnp.zeros((), r.dtype)

    rc = jnp.concatenate([
        jnp.sum(jnp.where(
            lab[None] == jnp.arange(j0, j1, dtype=jnp.int32).reshape(bshape),
            rr[None], zero), axis=axes)
        for j0, j1 in spans])
    dhi = defl.dhalf_inv.astype(r.dtype)
    y = dhi * (defl.e_hat_inv.astype(r.dtype) @ (dhi * rc))
    out = jnp.zeros_like(rr)
    for j0, j1 in spans:
        js = jnp.arange(j0, j1, dtype=jnp.int32).reshape(bshape)
        out = out + jnp.sum(
            jnp.where(lab[None] == js, y[j0:j1].reshape(bshape), zero),
            axis=0)
    return out * weight if weight is not None else out


def run_deflated_pcg(coeffs, b, x0, defl: Optional[DeflationSpace], precond,
                     *, tol, max_iter, check_every, weight=None):
    """Projected deflated-PCG engine (Tang & Vuik DEF form), traced.

    ``precond(r)`` is any SPD preconditioner application (diagonal for
    ``dcg``, a multigrid V-cycle for ``dmg``); ``defl=None`` degenerates to
    plain preconditioned CG.  Monitors the true relative residual of the
    *recovered* solution at the check cadence, keeps a best-iterate
    snapshot, and restarts the recurrence on the true projected residual
    each check (guards low-precision drift).  Returns ``(x, rel, iters)``.
    """
    dtype = x0.dtype
    tol_ = jnp.asarray(tol, dtype)
    check_every = resolve_check_every(check_every, 100)

    def matvec(p):
        return fvm.apply_operator(coeffs, p)

    if defl is not None:
        def q_apply(v):
            return _coarse_apply(defl, v, weight)
    else:
        def q_apply(v):
            return jnp.zeros_like(v)

    def p_apply(v):
        # P v = v - A Q v
        return v - matvec(q_apply(v))

    def recover(xh):
        # x = Q b + (I - Q A) x_hat
        return q_apply(b) + xh - q_apply(matvec(xh))

    def dot(u, v):
        return jnp.sum(u * v)

    bscale = jnp.mean(jnp.abs(b))

    def true_rel(xh):
        x = recover(xh)
        return jnp.mean(jnp.abs(b - matvec(x))) / bscale

    def cg_iter(s):
        xh, r, z, p, rz = s
        q = p_apply(matvec(p))            # P A p
        pq = dot(p, q)
        alpha = jnp.where(pq > 0, rz / jnp.where(pq > 0, pq, 1.0), 0.0)
        xh = xh + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (xh, r, z, p, rz_new)

    def fresh(xh):
        r = p_apply(b - matvec(recover(xh)))
        z = precond(r)
        return r, z, dot(r, z)

    def cond(c):
        xh, r, z, p, rz, it, pc, best, xh_best = c
        return (it < max_iter) & (tol_ < jnp.abs(pc))

    def body(c):
        xh, r, z, p, rz, it, pc, best, xh_best = c
        k = jnp.where(it == 0, 1, jnp.minimum(check_every, max_iter - it))
        xh, r, z, p, rz = jax.lax.fori_loop(
            0, k, lambda _, s: cg_iter(s), (xh, r, z, p, rz))
        it = it + k
        rel = true_rel(xh)
        improved = rel < best
        xh_best = jnp.where(improved, xh, xh_best)
        best = jnp.where(improved, rel, best)
        diverged = ~jnp.isfinite(rel) | (rel > 1e3 * best)
        # restart the recurrence on the true projected residual
        r_t, z_t, rz_t = fresh(xh)
        pc = jnp.where(diverged, jnp.zeros_like(rel), rel)
        return (xh, r_t, z_t, r_t * 0 + z_t, rz_t, it, pc, best, xh_best)

    r0, z0, rz0 = fresh(x0)
    init = (x0, r0, z0, z0, rz0, jnp.int32(0),
            jnp.asarray(100.0, dtype), true_rel(x0), x0)
    xh, _, _, _, _, iters, pc, best, xh_best = jax.lax.while_loop(cond, body, init)
    return recover(xh_best), best, iters


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion", "m"),
)
def _solve_dcg_jit(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv, *, omega,
                   tol, max_iter, check_every, criterion, m):
    defl = DeflationSpace(labels=labels, e_hat_inv=e_hat_inv,
                          dhalf_inv=dhalf_inv, m=m)
    x, best, iters = run_deflated_pcg(
        coeffs, coeffs.b, x0, defl, lambda r: coeffs.diag_inv * r,
        tol=tol, max_iter=max_iter, check_every=check_every)
    return SolveResult(x=x, deff=boundary_deff(spec, x), conv=best, iters=iters)


def solve_dcg(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
              max_iter: int = 100_000, check_every: int = 0,
              criterion: str = "relresidual",
              member: Optional[np.ndarray] = None,
              defl: Optional[DeflationSpace] = None) -> SolveResult:
    """Deflated PCG.  Pass either a prebuilt :class:`DeflationSpace` or the
    boolean ``member`` mask of the high-D phase (host array); with neither,
    falls back to plain diagonal PCG."""
    if defl is None and member is not None:
        defl = build_component_deflation(coeffs, member)
    if defl is None:
        from .cg import solve_cg

        return solve_cg(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                        check_every=check_every, criterion=criterion)
    return _solve_dcg_jit(coeffs, spec, x0, defl.labels, defl.e_hat_inv,
                          defl.dhalf_inv, omega=omega, tol=tol,
                          max_iter=max_iter, check_every=check_every,
                          criterion=criterion, m=defl.m)


def _pad_deflation(defl: Optional[DeflationSpace], shape, dtype,
                   m_max: int) -> tuple:
    """Pad one image's deflation space to the batch-wide component count.

    Zero-padded Ehat^-1/scale rows are inert: no cell carries a padded
    label, so their segment sums are zero and the gather never reads them.
    An image with no components (labels all -1, factors all zero)
    degenerates to plain diagonal PCG inside the same batched solve.
    """
    import numpy as _np

    if defl is None:
        return (_np.full(shape, -1, _np.int32),
                _np.zeros((m_max, m_max), dtype), _np.zeros((m_max,), dtype))
    lab = _np.asarray(defl.labels, _np.int32)
    e = _np.zeros((m_max, m_max), dtype)
    e[:defl.m, :defl.m] = _np.asarray(defl.e_hat_inv, dtype)
    dh = _np.zeros((m_max,), dtype)
    dh[:defl.m] = _np.asarray(defl.dhalf_inv, dtype)
    return lab, e, dh


def solve_dcg_batched(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-8,
                      max_iter: int = 100_000, check_every: int = 0,
                      criterion: str = "relresidual",
                      members: Optional[np.ndarray] = None,
                      defls: Optional[list] = None) -> SolveResult:
    """Batched deflated PCG with per-image deflation spaces.

    Each image gets its own component coarse space (built host-side from its
    ``members[b]`` mask, or passed prebuilt via ``defls``), zero-padded to
    the batch-wide maximum component count; the batch then advances as ONE
    vmapped solve with per-image freezing (JAX's while_loop batching masks
    each image's carry by its own stopping predicate, so results match solo
    runs at the same check schedule).
    """
    bsz = x0.shape[0]
    if defls is None:
        if members is None:
            from .cg import solve_cg_batched

            return solve_cg_batched(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                                    check_every=check_every, criterion=criterion)
        defls = [
            build_component_deflation(
                jax.tree.map(lambda a, k=k: a[k], coeffs), np.asarray(members[k]))
            for k in range(bsz)
        ]
    m_max = max((d.m for d in defls if d is not None), default=0)
    if m_max == 0:
        from .cg import solve_cg_batched

        return solve_cg_batched(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                                check_every=check_every, criterion=criterion)

    np_dtype = np.dtype(str(x0.dtype))
    padded = [_pad_deflation(d, x0.shape[1:], np_dtype, m_max) for d in defls]
    labels = jnp.asarray(np.stack([p[0] for p in padded]))
    e_hat_inv = jnp.asarray(np.stack([p[1] for p in padded]))
    dhalf_inv = jnp.asarray(np.stack([p[2] for p in padded]))

    solve_one = functools.partial(
        _solve_dcg_jit, omega=omega, tol=tol, max_iter=max_iter,
        check_every=check_every, criterion=criterion, m=m_max)
    return jax.vmap(solve_one)(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv)

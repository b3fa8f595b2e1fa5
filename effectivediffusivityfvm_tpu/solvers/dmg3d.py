"""κ-robust deflated MGCG on voxel volumes — the 3D mirror of solvers/dmg.py.

Same numerics, established on the 2D demo config (see dmg.py's docstring
for the measured findings): gas-component indicator deflation in A-DEF2
form on the symmetric-equilibrated system, the aggregation V-cycle built on
the RAW operator and applied through the similarity maps, f64 Krylov
iteration with the f32 preconditioner cycle.  The coarse apply
(:func:`deflation._coarse_apply`) is masked-reduce and dimension-agnostic;
only labeling, E assembly, and the operator/cycle plumbing are 3D-specific.

Closes the round-2 solver-matrix asymmetry ("dcg/dmg have no 3D variant;
the volume pipeline substitutes mgcg loudly").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fvm3d
from .deflation import (DeflationSpace, _coarse_apply, _pad_deflation)
from .driver import SolveResult, resolve_check_every
from .pcg import run_pcg
from .solvers3d import build_hierarchy_3d, v_cycle_3d

__all__ = ["build_component_deflation_3d", "solve_dmg_3d",
           "solve_dmg_3d_batched"]


def label_components_3d(member: np.ndarray) -> np.ndarray:
    """6-connected components of a boolean voxel mask (operator topology:
    NON-periodic — the coarse space must follow the no-flux y/z boundaries,
    not the flood fill's periodic convention; see the 2D discussion in
    deflation.build_component_deflation).  Returns int labels, -1 outside."""
    from scipy import ndimage

    structure = ndimage.generate_binary_structure(3, 1)
    lbl, _ = ndimage.label(member, structure=structure)
    return lbl.astype(np.int64) - 1


def _assemble_e_3d(coeffs, labels: np.ndarray, m: int) -> np.ndarray:
    """E = W^T (A W) via m vmapped 7-point applies + one dot (the same
    stencil-shifts-and-dense-reductions form as the 2D device assembly —
    TPU scatter serializes)."""
    lab = jnp.asarray(labels, jnp.int32)
    dt = coeffs.diag.dtype
    n = labels.size

    @jax.jit
    def assemble():
        js = jnp.arange(m, dtype=jnp.int32)
        W = (lab[None] == js[:, None, None, None]).astype(dt)
        AW = jax.vmap(lambda wj: fvm3d.apply_operator_3d(coeffs, wj))(W)
        return jax.lax.dot_general(
            W.reshape(m, n), AW.reshape(m, n), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    return np.array(assemble(), np.float64)


def build_component_deflation_3d(coeffs, member: np.ndarray,
                                 jitter: float = 1e-12,
                                 ) -> Optional[DeflationSpace]:
    """Gas-component coarse space for a voxel volume (factored inverse, as
    in the 2D builder — κ(E) spans the component-conductance decades while
    κ(Ehat) ~ 1)."""
    labels = label_components_3d(np.asarray(member, bool))
    m = int(labels.max()) + 1
    if m <= 0:
        return None

    E = _assemble_e_3d(coeffs, labels, m)
    row_ext = E.sum(axis=1)
    keep = row_ext > 1e-10 * max(np.max(np.abs(row_ext)), 1e-300)
    if not np.any(keep):
        return None
    if not np.all(keep):
        old_to_new = np.full(m, -1)
        old_to_new[keep] = np.arange(int(keep.sum()))
        remap = np.concatenate([old_to_new, [-1]])
        labels = remap[labels]
        E = E[np.ix_(keep, keep)]
        m = int(keep.sum())

    E += jitter * np.trace(E) / m * np.eye(m)
    dhalf = np.sqrt(np.diag(E))
    e_hat = E / dhalf[:, None] / dhalf[None, :]
    return DeflationSpace(
        labels=jnp.asarray(labels, jnp.int32),
        e_hat_inv=jnp.asarray(np.linalg.inv(e_hat), coeffs.diag.dtype),
        dhalf_inv=jnp.asarray(1.0 / dhalf, coeffs.diag.dtype),
        m=m,
    )


@functools.partial(
    jax.jit,
    static_argnames=("omega", "tol", "max_iter", "check_every", "criterion",
                     "m", "nu", "mg_omega", "coarse_iters", "min_size",
                     "over", "precond_f32"),
)
def _solve_dmg_3d_jit(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv, *,
                      omega, tol, max_iter, check_every, criterion, m, nu,
                      mg_omega, coarse_iters, min_size, over, precond_f32):
    dtype = x0.dtype
    c_eq, s = fvm3d.equilibrate_3d(coeffs)
    defl = (DeflationSpace(labels=labels, e_hat_inv=e_hat_inv,
                           dhalf_inv=dhalf_inv, m=m) if m > 0 else None)
    w = 1.0 / s

    pdt = jnp.float32 if precond_f32 else dtype
    levels = build_hierarchy_3d(
        jax.tree.map(lambda a: a.astype(pdt), coeffs), min_size=min_size)

    def matvec(p):
        return fvm3d.apply_operator_3d(c_eq, p)

    if defl is not None:
        def q_apply(v):
            return _coarse_apply(defl, v, w)
    else:
        def q_apply(v):
            return jnp.zeros_like(v)

    def precond(r):
        z = w * v_cycle_3d(levels, (w * r).astype(pdt), nu1=nu, nu2=nu,
                           omega=mg_omega, coarse_iters=coarse_iters,
                           over=over).astype(dtype)
        # A-DEF2 two-apply form (NOT folded — see dmg.py's measured finding)
        return z - q_apply(matvec(z)) + q_apply(r)

    x0e = x0 / s
    x0h = q_apply(c_eq.b) + x0e - q_apply(matvec(x0e))

    res = run_pcg(
        matvec=matvec, precond=precond, b=c_eq.b, x0=x0h,
        deff_fn=lambda xh: fvm3d.boundary_deff_3d(spec, s * xh),
        tol=tol, max_iter=max_iter,
        check_every=resolve_check_every(check_every, 10),
        criterion=criterion, grid_ndim=3, batched=False,
    )
    return res._replace(x=s * res.x)


def solve_dmg_3d(coeffs, spec, x0, *, omega: float = 0.0, tol: float = 1e-10,
                 max_iter: int = 2_000, check_every: int = 0,
                 criterion: str = "relresidual",
                 member: Optional[np.ndarray] = None,
                 defl: Optional[DeflationSpace] = None,
                 precond_f32: bool = True, nu: int = 2, mg_omega: float = 0.8,
                 coarse_iters: int = 32, min_size: int = 4,
                 over: float = 1.8) -> SolveResult:
    """Deflated multigrid-PCG on a voxel volume, f64 in/out."""
    if x0.dtype != jnp.float64:
        raise ValueError("solve_dmg_3d needs f64 inputs (jax_enable_x64; "
                         "set Dtype: float64)")
    if defl is None and member is not None:
        defl = build_component_deflation_3d(coeffs, member)
    if defl is None:
        labels = jnp.full(x0.shape, -1, jnp.int32)
        e_hat_inv = jnp.zeros((0, 0), x0.dtype)
        dhalf_inv = jnp.zeros((0,), x0.dtype)
        m = 0
    else:
        labels, e_hat_inv, dhalf_inv, m = (defl.labels, defl.e_hat_inv,
                                           defl.dhalf_inv, defl.m)
    return _solve_dmg_3d_jit(coeffs, spec, x0, labels, e_hat_inv, dhalf_inv,
                             omega=omega, tol=tol, max_iter=max_iter,
                             check_every=check_every, criterion=criterion,
                             m=m, nu=nu, mg_omega=mg_omega,
                             coarse_iters=coarse_iters, min_size=min_size,
                             over=over, precond_f32=precond_f32)


def solve_dmg_3d_batched(coeffs, spec, x0, *, omega: float = 0.0,
                         tol: float = 1e-10, max_iter: int = 2_000,
                         check_every: int = 0,
                         criterion: str = "relresidual",
                         members: Optional[np.ndarray] = None,
                         defls: Optional[list] = None,
                         precond_f32: bool = True, nu: int = 2,
                         mg_omega: float = 0.8, coarse_iters: int = 32,
                         min_size: int = 4, over: float = 1.8) -> SolveResult:
    """Batched 3D deflated MGCG — the voxel mirror of
    :func:`dmg.solve_dmg_batched`: per-volume deflation spaces zero-padded
    to the batch-wide maximum component count, one vmapped solve (padded
    labels are -1 everywhere, so the extra coarse rows are inert and a
    component-free volume degenerates to plain MGCG in the same batch)."""
    if x0.dtype != jnp.float64:
        raise ValueError("solve_dmg_3d_batched needs f64 inputs "
                         "(jax_enable_x64; set Dtype: float64)")
    bsz = x0.shape[0]
    if defls is None:
        defls = [
            build_component_deflation_3d(
                jax.tree.map(lambda a, k=k: a[k], coeffs),
                np.asarray(members[k]))
            for k in range(bsz)
        ] if members is not None else [None] * bsz
    m_max = max((d.m for d in defls if d is not None), default=0)

    if m_max == 0:
        labels = jnp.full(x0.shape, -1, jnp.int32)
        e_hat_inv = jnp.zeros((bsz, 0, 0), x0.dtype)
        dhalf_inv = jnp.zeros((bsz, 0), x0.dtype)
    else:
        np_dtype = np.dtype(str(x0.dtype))
        padded = [_pad_deflation(d, x0.shape[1:], np_dtype, m_max)
                  for d in defls]
        labels = jnp.asarray(np.stack([p[0] for p in padded]))
        e_hat_inv = jnp.asarray(np.stack([p[1] for p in padded]))
        dhalf_inv = jnp.asarray(np.stack([p[2] for p in padded]))

    solve_one = functools.partial(
        _solve_dmg_3d_jit, omega=omega, tol=tol, max_iter=max_iter,
        check_every=check_every, criterion=criterion, m=m_max, nu=nu,
        mg_omega=mg_omega, coarse_iters=coarse_iters, min_size=min_size,
        over=over, precond_f32=precond_f32)
    return jax.vmap(solve_one)(coeffs, spec, x0, labels, e_hat_inv,
                               dhalf_inv)

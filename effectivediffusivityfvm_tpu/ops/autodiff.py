"""Differentiable effective diffusivity: d(Deff)/d(D-field) by the adjoint
method.

A framework extension with no reference equivalent: the reference computes
Deff as a number; here Deff is a differentiable function of the per-cell
diffusivity field, so microstructure optimization, inverse problems, and
ML models that backpropagate through the physics (e.g. learned-generator
datasets with property targets) plug straight into ``jax.grad``.

Differentiating THROUGH solver iterations would be memory- and
compile-hopeless (thousands of while_loop steps); instead the solve is
wrapped in ``jax.custom_vjp`` using the implicit-function theorem.  With
``J(d) = Deff(d, x*(d))`` where ``A(d) x* = b(d)``:

    dJ/dd = ∂J/∂d - λᵀ (∂(A x* - b)/∂d),     A λ = ∂J/∂x

The operator is symmetric (SPD assembly), so the adjoint system is solved
by the SAME multigrid-PCG solver — one extra linear solve per gradient,
and the partials come from JAX's vjp of the (cheap, explicit) assembly and
functional maps at the converged point.  Cost: gradient ≈ 2x forward.

``deff_and_grad`` is the convenience wrapper; ``make_differentiable_deff``
returns a jax-transformable closure usable under grad/jit/vmap.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import fvm
from .flux import boundary_deff, make_flux_spec

__all__ = ["make_differentiable_deff", "deff_and_grad"]


def make_differentiable_deff(c_left: float = 0.0, c_right: float = 1.0,
                             tol: float = 1e-10, max_iter: int = 2_000,
                             check_every: int = 10,
                             solver_kw: Optional[dict] = None) -> Callable:
    """Build ``deff(d_field) -> scalar`` differentiable wrt ``d_field``.

    The forward pass runs MGCG to ``tol`` (relresidual); the backward pass
    solves the adjoint system with the same solver and assembles the
    gradient via the implicit function theorem.  f64 recommended for
    gradient verification; f32 works at matching tolerances.
    """
    kw = dict(tol=tol, max_iter=max_iter, check_every=check_every,
              criterion="relresidual")
    kw.update(solver_kw or {})

    def _solve(d_field, rhs=None, x0=None):
        from ..solvers.multigrid import solve_mgcg

        coeffs = fvm.fvm_coefficients(d_field, c_left, c_right)
        if rhs is not None:
            coeffs = coeffs._replace(b=rhs)
        spec = make_flux_spec(d_field, c_left, c_right)
        if x0 is None:
            nx = d_field.shape[-1]
            x0 = jnp.broadcast_to(
                jnp.arange(nx, dtype=d_field.dtype) / nx
                * (c_right - c_left) + c_left, d_field.shape)
        return solve_mgcg(coeffs, spec, x0, **kw).x

    def _functional(d_field, x):
        return boundary_deff(make_flux_spec(d_field, c_left, c_right), x)

    def _residual_map(d_field, x):
        c = fvm.fvm_coefficients(d_field, c_left, c_right)
        return fvm.apply_operator(c, x) - c.b

    @jax.custom_vjp
    def deff(d_field):
        return _functional(d_field, _solve(d_field))

    def fwd(d_field):
        x_star = _solve(d_field)
        return _functional(d_field, x_star), (d_field, x_star)

    def bwd(resids, g):
        d_field, x_star = resids
        # ∂J/∂x and ∂J/∂d at the converged point
        _, vjp_J = jax.vjp(_functional, d_field, x_star)
        gd_direct, gx = vjp_J(g)
        # adjoint solve A λ = ∂J/∂x (A symmetric ⇒ same operator)
        lam = _solve(d_field, rhs=gx, x0=jnp.zeros_like(x_star))
        # -λᵀ ∂F/∂d with F(d, x) = A(d) x - b(d), evaluated at x*
        _, vjp_F = jax.vjp(lambda d: _residual_map(d, x_star), d_field)
        (gd_adjoint,) = vjp_F(-lam)
        return (gd_direct + gd_adjoint,)

    deff.defvjp(fwd, bwd)
    return deff


def deff_and_grad(d_field: jax.Array, c_left: float = 0.0,
                  c_right: float = 1.0, **opts):
    """Convenience: ``(Deff, dDeff/dd_field)`` in one call."""
    f = make_differentiable_deff(c_left, c_right, **opts)
    return jax.value_and_grad(f)(d_field)

"""Differentiable Deff (ops/autodiff.py): adjoint gradient vs finite
differences, and transformability under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.ops.autodiff import (deff_and_grad,
                                                      make_differentiable_deff)


def test_gradient_matches_finite_differences(rng):
    ny, nx = 12, 14
    d = jnp.asarray(np.exp(rng.uniform(0, np.log(30), (ny, nx))))
    val, grad = deff_and_grad(d, tol=1e-12, max_iter=2000)
    assert np.isfinite(float(val)) and float(val) > 0
    f = make_differentiable_deff(tol=1e-12, max_iter=2000)

    # central differences on a handful of cells
    eps = 1e-5
    cells = [(2, 3), (7, 9), (0, 0), (11, 13), (5, 0)]
    for i, j in cells:
        dp = d.at[i, j].add(eps)
        dm = d.at[i, j].add(-eps)
        fd = (float(f(dp)) - float(f(dm))) / (2 * eps)
        an = float(grad[i, j])
        assert abs(fd - an) <= 1e-5 * max(abs(fd), abs(an), 1e-3), (
            (i, j), fd, an)


def test_gradient_of_uniform_medium_is_boundary_dominated(rng):
    # analytic: for uniform d, Deff == d, so dDeff/dd sums to 1
    d = jnp.full((10, 10), 2.5)
    val, grad = deff_and_grad(d, tol=1e-13, max_iter=2000)
    np.testing.assert_allclose(float(val), 2.5, rtol=1e-9)
    np.testing.assert_allclose(float(jnp.sum(grad)), 1.0, rtol=1e-6)


def test_jit_and_grad_compose(rng):
    d = jnp.asarray(np.exp(rng.uniform(0, np.log(10), (8, 8))))
    f = make_differentiable_deff(tol=1e-10, max_iter=1000)
    g1 = jax.jit(jax.grad(f))(d)
    g2 = jax.grad(f)(d)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-8, atol=1e-12)

"""Unit tests of the FVM operator layer against an independent dense assembly.

The oracle below builds the pentadiagonal system as a scipy CSR matrix with
straightforward per-cell loops, written directly from the discretization spec
(documentation PDF §5.2: harmonic-mean interface conductances, Dirichlet
left/right over half-cell distances, zero-flux top/bottom, identity rows for
masked cells).  The framework's vectorized coefficients must match it exactly,
and a converged iterative solve must match the direct sparse solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import boundary_deff, make_flux_spec
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi


def hmean(a, b):
    if a == 0.0 or b == 0.0:
        return 0.0
    return 2.0 * a * b / (a + b)


def dense_assembly(d, cl, cr, mask=None):
    """Oracle assembly: (A, b) as scipy CSR / numpy vector, row-major cells."""
    ny, nx = d.shape
    dx, dy = 1.0 / nx, 1.0 / ny
    n = ny * nx
    A = sp.lil_matrix((n, n))
    b = np.zeros(n)
    for i in range(ny):
        for j in range(nx):
            p = i * nx + j
            if mask is not None and mask[i, j]:
                A[p, p] = 1.0
                continue
            diag = 0.0
            if j > 0:
                k = hmean(d[i, j], d[i, j - 1]) * dy / dx
                A[p, p - 1] = -k
                diag += k
            else:
                k = d[i, j] * dy / (dx / 2)
                diag += k
                b[p] += cl * k
            if j < nx - 1:
                k = hmean(d[i, j], d[i, j + 1]) * dy / dx
                A[p, p + 1] = -k
                diag += k
            else:
                k = d[i, j] * dy / (dx / 2)
                diag += k
                b[p] += cr * k
            if i > 0:
                k = hmean(d[i, j], d[i - 1, j]) * dx / dy
                A[p, p - nx] = -k
                diag += k
            if i < ny - 1:
                k = hmean(d[i, j], d[i + 1, j]) * dx / dy
                A[p, p + nx] = -k
                diag += k
            A[p, p] = diag
    return A.tocsr(), b


def random_d(rng, ny, nx, contrast=1e3):
    return np.exp(rng.uniform(0.0, np.log(contrast), size=(ny, nx)))


def coeffs_to_dense(c):
    """Rebuild the dense matrix from StencilCoeffs for direct comparison."""
    a_w, a_e, a_n, a_s, diag = map(np.asarray, (c.a_w, c.a_e, c.a_n, c.a_s, c.diag))
    ny, nx = diag.shape
    n = ny * nx
    A = sp.lil_matrix((n, n))
    for i in range(ny):
        for j in range(nx):
            p = i * nx + j
            A[p, p] = diag[i, j]
            if j > 0:
                A[p, p - 1] = -a_w[i, j]
            if j < nx - 1:
                A[p, p + 1] = -a_e[i, j]
            if i > 0:
                A[p, p - nx] = -a_n[i, j]
            if i < ny - 1:
                A[p, p + nx] = -a_s[i, j]
    return A.tocsr()


class TestCoefficients:
    def test_matches_dense_oracle(self, rng):
        d = random_d(rng, 7, 11)
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.25, 1.75)
        A_ref, b_ref = dense_assembly(d, 0.25, 1.75)
        A_ours = coeffs_to_dense(c)
        np.testing.assert_allclose(A_ours.toarray(), A_ref.toarray(), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(c.b).ravel(), b_ref, rtol=1e-13)

    def test_masked_rows_identity(self, rng):
        d = random_d(rng, 6, 6)
        mask = rng.random((6, 6)) < 0.3
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0, mask=jnp.asarray(mask))
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0, mask=mask)
        np.testing.assert_allclose(coeffs_to_dense(c).toarray(), A_ref.toarray(), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(c.b).ravel(), b_ref, rtol=1e-13)

    def test_neighbors_keep_coupling_to_masked_cells(self):
        # Reference semantics (Deff2D.cuh:750-752): only the masked cell's own
        # row is zeroed; fluid neighbors still couple to it via the harmonic
        # mean (nonzero when D_solid > 0).
        d = np.full((3, 3), 2.0)
        mask = np.zeros((3, 3), bool)
        mask[1, 1] = True
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0, mask=jnp.asarray(mask))
        assert float(c.a_w[1, 2]) > 0.0      # (1,2) still couples west to masked (1,1)
        assert float(c.a_e[1, 1]) == 0.0     # masked row itself zeroed
        assert float(c.diag[1, 1]) == 1.0
        assert float(c.b[1, 1]) == 0.0

    def test_zero_diffusivity_face_blocked(self):
        d = np.array([[1.0, 0.0, 1.0]])
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0)
        assert float(c.a_e[0, 0]) == 0.0     # face into the D=0 cell is blocked
        assert float(c.a_w[0, 1]) == 0.0
        assert np.isfinite(np.asarray(c.diag_inv)).all()

    def test_harmonic_mean_values(self):
        assert float(fvm.harmonic_mean(jnp.float64(2.0), jnp.float64(2.0))) == 2.0
        np.testing.assert_allclose(
            float(fvm.harmonic_mean(jnp.float64(1.0), jnp.float64(3.0))), 1.5)
        assert float(fvm.harmonic_mean(jnp.float64(0.0), jnp.float64(3.0))) == 0.0


class TestOperatorApply:
    def test_apply_matches_dense(self, rng):
        d = random_d(rng, 5, 9)
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0)
        A_ref, _ = dense_assembly(d, 0.0, 1.0)
        x = rng.random((5, 9))
        np.testing.assert_allclose(
            np.asarray(fvm.apply_operator(c, jnp.asarray(x))).ravel(),
            A_ref @ x.ravel(), rtol=1e-12)

    def test_jacobi_sweep_matches_dense(self, rng):
        d = random_d(rng, 5, 9)
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0)
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0)
        x = rng.random((5, 9))
        omega = 2.0 / 3.0
        # dense damped Jacobi: x' = (1-w)x + w D^-1 (b - (A - D) x)
        Adiag = A_ref.diagonal()
        off = A_ref @ x.ravel() - Adiag * x.ravel()
        expect = (1 - omega) * x.ravel() + omega * (b_ref - off) / Adiag
        got = np.asarray(fvm.jacobi_sweep(c, jnp.asarray(x), omega)).ravel()
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_batched_sweep_matches_loop(self, rng):
        ds = [random_d(rng, 4, 6) for _ in range(3)]
        xs = [rng.random((4, 6)) for _ in range(3)]
        singles = [
            np.asarray(fvm.jacobi_sweep(
                fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0), jnp.asarray(x), 0.7))
            for d, x in zip(ds, xs)
        ]
        import jax
        batched_coeffs = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))(
            jnp.asarray(np.stack(ds)), 0.0, 1.0)
        batched = np.asarray(
            fvm.jacobi_sweep(batched_coeffs, jnp.asarray(np.stack(xs)), 0.7))
        np.testing.assert_allclose(batched, np.stack(singles), rtol=1e-12)


class TestSolveVsDirect:
    def test_converged_solution_matches_spsolve(self, rng):
        d = random_d(rng, 16, 16, contrast=100.0)
        dj = jnp.asarray(d)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        spec = make_flux_spec(dj, 0.0, 1.0)
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0)
        x_direct = spla.spsolve(A_ref.tocsc(), b_ref).reshape(16, 16)

        x0 = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float64) / 16, (16, 16))
        res = solve_jacobi(c, spec, x0, tol=1e-12, max_iter=2_000_000,
                           check_every=2000, criterion="residual")
        np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-7, atol=1e-9)

        deff_direct = float(boundary_deff(spec, jnp.asarray(x_direct)))
        np.testing.assert_allclose(float(res.deff), deff_direct, rtol=1e-7)

    def test_residual_measures_defect(self, rng):
        d = random_d(rng, 8, 8)
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0)
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0)
        x = rng.random((8, 8))
        expect = np.mean(np.abs(b_ref - A_ref @ x.ravel()))
        np.testing.assert_allclose(float(fvm.residual(c, jnp.asarray(x))), expect, rtol=1e-12)


class TestFluxAverage:
    def test_equals_boundary_on_converged_field(self, rng):
        from effectivediffusivityfvm_tpu.ops.flux import (
            boundary_deff,
            deff_flux_average,
            make_flux_spec,
        )

        d = random_d(rng, 16, 16, contrast=100.0)
        dj = jnp.asarray(d)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0)
        x = spla.spsolve(A_ref.tocsc(), b_ref).reshape(16, 16)
        spec = make_flux_spec(dj, 0.0, 1.0)
        d_b = float(boundary_deff(spec, jnp.asarray(x)))
        d_avg = float(deff_flux_average(dj, jnp.asarray(x), 0.0, 1.0))
        np.testing.assert_allclose(d_avg, d_b, rtol=1e-10)

    def test_suppresses_pointwise_noise(self, rng):
        # The averaged flux suppresses *uncorrelated* per-cell noise (e.g.
        # fp32 rounding of a converged field) by ~sqrt(nx); it does NOT help
        # with smooth unconverged-transient error, which biases all cuts
        # alike — that is the solver's job.
        from effectivediffusivityfvm_tpu.ops.flux import (
            boundary_deff,
            deff_flux_average,
            make_flux_spec,
        )

        n = 64
        d = random_d(rng, n, n, contrast=100.0)
        dj = jnp.asarray(d)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        spec = make_flux_spec(dj, 0.0, 1.0)
        A_ref, b_ref = dense_assembly(d, 0.0, 1.0)
        x = spla.spsolve(A_ref.tocsc(), b_ref).reshape(n, n)
        d_true = float(boundary_deff(spec, jnp.asarray(x)))

        errs_b, errs_avg = [], []
        for seed in range(5):
            noise = np.random.default_rng(seed).standard_normal((n, n)) * 1e-6
            xn = jnp.asarray(x + noise)
            errs_b.append(abs(float(boundary_deff(spec, xn)) - d_true))
            errs_avg.append(abs(float(deff_flux_average(dj, xn, 0.0, 1.0)) - d_true))
        assert np.mean(errs_avg) < np.mean(errs_b)


class TestDebugUtils:
    def test_check_finite(self):
        from effectivediffusivityfvm_tpu.utils.debug import check_finite, nan_guard

        check_finite({"a": jnp.ones(3)})
        with pytest.raises(FloatingPointError):
            check_finite(jnp.asarray([1.0, float("nan")]), "bad")

        guarded = nan_guard(lambda: jnp.asarray([float("inf")]), "inf-solve")
        with pytest.raises(FloatingPointError):
            guarded()

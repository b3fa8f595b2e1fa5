"""CG and red-black SOR solver tests: correctness vs direct sparse solves,
convergence-rate superiority over Jacobi, batched freezing, and the
symmetrized masked assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import boundary_deff, make_flux_spec
from effectivediffusivityfvm_tpu.solvers.cg import solve_cg, solve_cg_batched
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi
from effectivediffusivityfvm_tpu.solvers.rbsor import solve_rbsor, omega_opt


def to_sparse(c):
    diag = np.asarray(c.diag)
    ny, nx = diag.shape
    return sp.diags(
        [diag.ravel(),
         -np.asarray(c.a_w).ravel()[1:], -np.asarray(c.a_e).ravel()[:-1],
         -np.asarray(c.a_n).ravel()[nx:], -np.asarray(c.a_s).ravel()[:-nx]],
        [0, -1, 1, -nx, nx], format="csc")


def problem(rng, ny=20, nx=24, contrast=1e4, mask_frac=0.0, symmetric=False):
    d = np.exp(rng.uniform(0, np.log(contrast), (ny, nx)))
    dj = jnp.asarray(d)
    mask = None
    if mask_frac > 0:
        mask = jnp.asarray(rng.random((ny, nx)) < mask_frac)
    c = fvm.fvm_coefficients(dj, 0.0, 1.0, mask=mask, symmetric=symmetric)
    spec = make_flux_spec(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    return c, spec, x0, mask


class TestCG:
    def test_matches_direct_high_contrast(self, rng):
        c, spec, x0, _ = problem(rng, contrast=1e6)
        res = solve_cg(c, spec, x0, tol=1e-11, max_iter=50_000, check_every=50)
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(
            float(res.deff), float(boundary_deff(spec, jnp.asarray(xd))), rtol=1e-8)

    def test_symmetrized_mask_same_solution_as_reference_assembly(self, rng):
        # The symmetric=True masked system must reproduce the *unsymmetric*
        # reference-style system's exact solution.
        d = np.exp(rng.uniform(0, np.log(100), (16, 16)))
        dj = jnp.asarray(d)
        mask = rng.random((16, 16)) < 0.3
        c_ref = fvm.fvm_coefficients(dj, 0.0, 1.0, mask=jnp.asarray(mask))
        c_sym = fvm.fvm_coefficients(dj, 0.0, 1.0, mask=jnp.asarray(mask), symmetric=True)
        A_sym = to_sparse(c_sym)
        np.testing.assert_allclose((A_sym - A_sym.T).toarray(), 0, atol=1e-14)
        x_ref = spla.spsolve(to_sparse(c_ref), np.asarray(c_ref.b).ravel())
        x_sym = spla.spsolve(A_sym.tocsc(), np.asarray(c_sym.b).ravel())
        np.testing.assert_allclose(x_sym, x_ref, rtol=1e-10, atol=1e-12)

    def test_cg_on_masked_system(self, rng):
        c, spec, x0, mask = problem(rng, mask_frac=0.25, symmetric=True)
        res = solve_cg(c, spec, x0, tol=1e-12, max_iter=50_000, check_every=50)
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)

    def test_cg_far_fewer_iterations_than_jacobi(self, rng):
        c, spec, x0, _ = problem(rng, ny=32, nx=32, contrast=1e4)
        cg = solve_cg(c, spec, x0, tol=1e-9, max_iter=200_000, check_every=50,
                      criterion="residual")
        jac = solve_jacobi(c, spec, x0, tol=1e-9, max_iter=200_000, check_every=500,
                           criterion="residual")
        assert int(cg.iters) * 20 < int(jac.iters)
        assert float(fvm.residual(c, cg.x)) <= 1e-9

    def test_batched_matches_singles(self, rng):
        probs = [problem(rng, contrast=c)[:3] for c in (10.0, 1e3)]
        kw = dict(tol=1e-10, max_iter=20_000, check_every=50)
        singles = [solve_cg(c, s, x, **kw) for c, s, x in probs]
        coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
        spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
        x0 = jnp.stack([p[2] for p in probs])
        batched = solve_cg_batched(coeffs, spec, x0, **kw)
        for k, single in enumerate(singles):
            np.testing.assert_allclose(float(batched.deff[k]), float(single.deff),
                                       rtol=1e-9)
            np.testing.assert_allclose(np.asarray(batched.x[k]), np.asarray(single.x),
                                       rtol=1e-6, atol=1e-10)


class TestRBSOR:
    def test_matches_direct(self, rng):
        c, spec, x0, _ = problem(rng, contrast=100.0)
        res = solve_rbsor(c, spec, x0, tol=1e-11, max_iter=500_000,
                          check_every=500, criterion="residual")
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)

    def test_faster_than_jacobi(self, rng):
        c, spec, x0, _ = problem(rng, ny=32, nx=32, contrast=100.0)
        kw = dict(tol=1e-9, max_iter=500_000, criterion="residual")
        sor = solve_rbsor(c, spec, x0, check_every=200, **kw)
        jac = solve_jacobi(c, spec, x0, check_every=200, **kw)
        assert int(sor.iters) * 3 < int(jac.iters)

    def test_omega_opt_range(self):
        w = omega_opt(512, 512)
        assert 1.9 < w < 2.0
        assert 1.0 < omega_opt(8, 8) < 2.0


class TestIterativeRefinement:
    def test_cgir_matches_direct_high_contrast(self, rng):
        """f64-accuracy answers with the hot loop in f32 (solver 'cgir')."""
        from effectivediffusivityfvm_tpu.solvers.refine import solve_cgir

        c, spec, x0, _ = problem(rng, ny=32, nx=32, contrast=1e6)
        res = solve_cgir(c, spec, x0, tol=1e-10, max_iter=8,
                         inner_iters=20_000, inner_tol=1e-6)
        assert float(res.conv) <= 1e-8   # f64 floor on this problem is ~1e-9          # true f64 relative residual
        assert int(res.iters) <= 8
        # pointwise x agreement is kappa-limited (~kappa * relres); the flux
        # functional and the residual are the meaningful invariants
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(32, 32)
        deff_direct = float(boundary_deff(spec, jnp.asarray(xd)))
        np.testing.assert_allclose(float(res.deff), deff_direct, rtol=1e-6)
        r = np.asarray(c.b).ravel() - to_sparse(c) @ np.asarray(res.x).ravel()
        assert np.mean(np.abs(r)) / np.mean(np.abs(np.asarray(c.b))) <= 2e-10

    def test_equilibrate_preserves_solution(self, rng):
        from effectivediffusivityfvm_tpu.ops.fvm import equilibrate

        c, _, _, _ = problem(rng, ny=12, nx=14, contrast=1e6)
        cs, s = equilibrate(c)
        np.testing.assert_allclose(np.asarray(cs.diag), 1.0, rtol=1e-12)
        # A' = S A S  and  b' = S b: solving A' y = b' gives x = S y
        A = to_sparse(c).toarray()
        S = np.diag(np.asarray(s).ravel())
        np.testing.assert_allclose(to_sparse(cs).toarray(), S @ A @ S,
                                   rtol=1e-10, atol=1e-12)
        y = np.linalg.solve(S @ A @ S, np.asarray(cs.b).ravel())
        x = np.linalg.solve(A, np.asarray(c.b).ravel())
        np.testing.assert_allclose(np.asarray(s).ravel() * y, x, rtol=1e-8)


class TestDeflation:
    def _three_phase_blobs(self, rng, n=48, contrast=1e6):
        from effectivediffusivityfvm_tpu.models import floodfill, phases

        img = np.full((n, n), 150, np.uint8)
        for _ in range(8):
            ci, cj = rng.integers(4, n - 4, 2)
            r = rng.integers(2, 5)
            ii, jj = np.ogrid[:n, :n]
            img[(ii - ci) ** 2 + (jj - cj) ** 2 < r * r] = 0   # gas blobs
        classes = phases.three_phase_classes(img)
        ff = floodfill.flood_fill(img > 200)
        mask = (img > 200) | ff.isolated
        gas = (classes == phases.GAS) & ~mask
        d = jnp.asarray(phases.d_field_from_classes(
            classes, 1.0, 0.0, contrast, dtype=np.float64))
        c = fvm.fvm_coefficients(d, 0.0, 1.0, mask=jnp.asarray(mask), symmetric=True)
        spec = make_flux_spec(d, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64) / n, (n, n))
        return c, spec, x0, gas

    def test_dcg_matches_direct(self, rng):
        from effectivediffusivityfvm_tpu.solvers.deflation import solve_dcg

        c, spec, x0, gas = self._three_phase_blobs(rng)
        res = solve_dcg(c, spec, x0, tol=1e-9, max_iter=50_000,
                        check_every=100, member=gas)
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        deff_direct = float(boundary_deff(spec, jnp.asarray(xd)))
        np.testing.assert_allclose(float(res.deff), deff_direct, rtol=1e-6)
        assert float(res.conv) <= 1e-8   # f64 floor on this problem is ~1e-9

    def test_dcg_far_fewer_iterations_than_cg(self, rng):
        from effectivediffusivityfvm_tpu.solvers.deflation import solve_dcg

        c, spec, x0, gas = self._three_phase_blobs(rng)
        dcg = solve_dcg(c, spec, x0, tol=1e-8, max_iter=100_000,
                        check_every=100, member=gas)
        cg = solve_cg(c, spec, x0, tol=1e-8, max_iter=400_000,
                      check_every=100, criterion="relresidual")
        assert int(dcg.iters) * 10 < int(cg.iters)

    def test_fallback_without_components(self, rng):
        from effectivediffusivityfvm_tpu.solvers.deflation import solve_dcg

        d = np.exp(rng.uniform(0, np.log(100), (16, 16)))
        dj = jnp.asarray(d)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        spec = make_flux_spec(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float64) / 16, (16, 16))
        res = solve_dcg(c, spec, x0, tol=1e-9, max_iter=50_000, check_every=100,
                        member=np.zeros((16, 16), bool))
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(16, 16)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-10)

    def test_component_labeling(self):
        from effectivediffusivityfvm_tpu.solvers.deflation import label_components

        member = np.zeros((6, 6), bool)
        member[1:3, 1:3] = True
        member[4:6, 4:6] = True
        lbl = label_components(member, periodic_y=False)
        assert lbl.max() == 1
        assert (lbl >= 0).sum() == 8
        assert lbl[0, 0] == -1


class TestDeflatedMultigrid:
    """dmg: A-DEF2 deflated MGCG (solvers/dmg.py) — the κ-robust solver."""

    def _blobs(self, rng, n=48, contrast=1.2375e6):
        return TestDeflation._three_phase_blobs(TestDeflation(), rng, n, contrast)

    def test_dmg_matches_direct(self, rng):
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

        c, spec, x0, gas = self._blobs(rng)
        res = solve_dmg(c, spec, x0, tol=1e-11, max_iter=1_000,
                        check_every=10, member=gas)
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        err = np.max(np.abs(np.asarray(res.x) - xd)) / np.max(np.abs(xd))
        assert err < 1e-8, err
        deff_direct = float(boundary_deff(spec, jnp.asarray(xd)))
        np.testing.assert_allclose(float(res.deff), deff_direct, rtol=1e-8)

    def test_dmg_converges_past_dcg_tolerances(self, rng):
        """The headline property: dmg converges to equilibrated relres 1e-10
        on extreme-contrast blob media where diagonal-preconditioned
        deflation plateaus around 1e-4 (00042.jpg-class conditioning)."""
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

        c, spec, x0, gas = self._blobs(rng)
        res = solve_dmg(c, spec, x0, tol=1e-10, max_iter=2_000,
                        check_every=10, member=gas)
        assert int(res.iters) < 2_000   # stopped on tol, not the cap
        assert float(res.conv) <= 1e-10

    def test_dmg_without_components_matches_direct(self, rng):
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

        d = np.exp(rng.uniform(0, np.log(100), (16, 16)))
        dj = jnp.asarray(d)
        c = fvm.fvm_coefficients(dj, 0.0, 1.0)
        spec = make_flux_spec(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float64) / 16, (16, 16))
        res = solve_dmg(c, spec, x0, tol=1e-11, max_iter=1_000, check_every=10,
                        member=np.zeros((16, 16), bool))
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(16, 16)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-7, atol=1e-11)

    @pytest.mark.parametrize("up", ["tiled", True])
    def test_dmg_pallas_cycle_matches_xla(self, rng, up):
        """The f32 preconditioner cycle rides the fused Pallas kernels
        (whole-VMEM / row-tiled) with unchanged convergence: same solution
        and stopping behavior as the XLA cycle at the same schedule."""
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

        c, spec, x0, gas = self._blobs(rng)
        kw = dict(tol=1e-10, max_iter=2_000, check_every=10, member=gas)
        ref = solve_dmg(c, spec, x0, use_pallas=False, **kw)
        got = solve_dmg(c, spec, x0, use_pallas=up, pallas_interpret=True,
                        **kw)
        assert float(got.conv) <= 1e-10
        np.testing.assert_allclose(float(got.deff), float(ref.deff),
                                   rtol=1e-7)

    def test_dmg_batched_matches_singles(self, rng):
        from effectivediffusivityfvm_tpu.solvers.dmg import (
            solve_dmg, solve_dmg_batched)

        probs = [self._blobs(rng) for _ in range(3)]
        cb = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
        sb = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
        xb = jnp.stack([p[2] for p in probs])
        gb = np.stack([p[3] for p in probs])
        kw = dict(tol=1e-10, max_iter=1_000, check_every=10)
        got = solve_dmg_batched(cb, sb, xb, members=gb, **kw)
        for k in range(3):
            ref = solve_dmg(probs[k][0], probs[k][1], probs[k][2],
                            member=probs[k][3], **kw)
            np.testing.assert_allclose(float(got.deff[k]), float(ref.deff),
                                       rtol=1e-8)
        assert np.all(np.asarray(got.conv) <= 1e-10)

    def test_dmg_requires_f64(self, rng):
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

        c, spec, x0, gas = self._blobs(rng)
        c32 = jax.tree.map(lambda a: a.astype(jnp.float32), c)
        with pytest.raises(ValueError, match="f64"):
            solve_dmg(c32, spec, x0.astype(jnp.float32), member=gas)

    def test_weighted_coarse_apply_equilibration_invariance(self, rng):
        """Q' = W' E^-1 W'^T on the equilibrated system must equal
        S^-1 Q S^-1 of the raw system (E is invariant under the scaling)."""
        from effectivediffusivityfvm_tpu.solvers.deflation import (
            _coarse_apply, build_component_deflation)

        c, spec, x0, gas = self._blobs(rng)
        defl = build_component_deflation(c, gas)
        c_eq, s = fvm.equilibrate(c)
        r = jnp.asarray(rng.standard_normal(x0.shape))
        raw = _coarse_apply(defl, r)
        # Q' (S r) = S^-1 W E^-1 W^T S^-1 S r -> S * that == Q r
        scaled = s * _coarse_apply(defl, s * r, weight=1.0 / s)
        np.testing.assert_allclose(np.asarray(scaled), np.asarray(raw),
                                   rtol=1e-10, atol=1e-12)

    def test_dmg_refined_converges(self, rng):
        from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg_refined

        c, spec, x0, gas = self._blobs(rng)
        res = solve_dmg_refined(c, spec, x0, tol=1e-10, max_outers=8,
                                inner_iters=200, inner_tol=1e-4,
                                check_every=10, member=gas)
        assert float(res.conv) <= 1e-9
        xd = spla.spsolve(to_sparse(c), np.asarray(c.b).ravel()).reshape(x0.shape)
        deff_direct = float(boundary_deff(spec, jnp.asarray(xd)))
        np.testing.assert_allclose(float(res.deff), deff_direct, rtol=1e-7)

"""Multigrid tests: Galerkin coarse operator identities, V-cycle contraction,
MGCG correctness vs direct solves, odd shapes, masked systems, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import boundary_deff, make_flux_spec
from effectivediffusivityfvm_tpu.solvers.multigrid import (
    build_hierarchy,
    coarsen,
    prolong,
    restrict,
    solve_mgcg,
    solve_mgcg_batched,
    v_cycle,
)


def to_dense(c):
    diag = np.asarray(c.diag)
    ny, nx = diag.shape
    return sp.diags(
        [diag.ravel(),
         -np.asarray(c.a_w).ravel()[1:], -np.asarray(c.a_e).ravel()[:-1],
         -np.asarray(c.a_n).ravel()[nx:], -np.asarray(c.a_s).ravel()[:-nx]],
        [0, -1, 1, -nx, nx]).toarray()


def problem(rng, ny=32, nx=32, contrast=1e3):
    d = np.exp(rng.uniform(0, np.log(contrast), (ny, nx)))
    dj = jnp.asarray(d)
    c = fvm.fvm_coefficients(dj, 0.0, 1.0)
    spec = make_flux_spec(dj, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    return c, spec, x0


class TestGalerkin:
    def test_coarse_operator_is_galerkin_product(self, rng):
        """Closed-form coarsening must equal R A P with 2x2 aggregation."""
        c, _, _ = problem(rng, 8, 8)
        A = to_dense(c)
        # aggregation matrices
        n_f, n_c = 64, 16
        P = np.zeros((n_f, n_c))
        for i in range(8):
            for j in range(8):
                P[i * 8 + j, (i // 2) * 4 + (j // 2)] = 1.0
        A_c_ref = P.T @ A @ P
        c_c = coarsen(c)
        np.testing.assert_allclose(to_dense(c_c), A_c_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(c_c.b).ravel(), P.T @ np.asarray(c.b).ravel(), rtol=1e-12)

    def test_coarse_spd(self, rng):
        c, _, _ = problem(rng, 16, 16, contrast=1e6)
        for lvl in build_hierarchy(c, min_size=4):
            A = to_dense(lvl)
            np.testing.assert_allclose(A, A.T, rtol=1e-10, atol=1e-12)
            w = np.linalg.eigvalsh(A)
            assert w.min() > 0

    def test_restrict_prolong_adjoint(self, rng):
        r = jnp.asarray(rng.random((8, 12)))
        e = jnp.asarray(rng.random((4, 6)))
        # <R r, e> == <r, P e>
        lhs = float(jnp.sum(restrict(r) * e))
        rhs = float(jnp.sum(r * prolong(e)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


class TestVCycle:
    def test_reduces_error(self, rng):
        c, _, _ = problem(rng, 64, 64, contrast=100.0)
        levels = build_hierarchy(c)
        A = to_dense(c)
        x_true = rng.random(64 * 64)
        b = jnp.asarray((A @ x_true).reshape(64, 64))
        x = jnp.zeros((64, 64))
        err0 = np.linalg.norm(x_true)
        for _ in range(10):
            r = b - fvm.apply_operator(c, x)
            x = x + v_cycle(levels, r)
        err = np.linalg.norm(np.asarray(x).ravel() - x_true)
        # aggregation MG with over-correction contracts at ~0.73/cycle
        # standalone (its role here is PCG preconditioner, where it cuts
        # iteration counts ~50x vs diagonal preconditioning)
        assert err < 0.25 * err0


class TestMGCG:
    @pytest.mark.parametrize("shape", [(32, 32), (33, 31), (48, 20)])
    def test_matches_direct(self, rng, shape):
        c, spec, x0 = problem(rng, *shape, contrast=1e4)
        res = solve_mgcg(c, spec, x0, tol=1e-11, max_iter=3000, check_every=10)
        A = sp.csc_matrix(to_dense(c))
        xd = spla.spsolve(A, np.asarray(c.b).ravel()).reshape(shape)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(
            float(res.deff), float(boundary_deff(spec, jnp.asarray(xd))), rtol=1e-8)

    def test_masked_symmetric_system(self, rng):
        d = np.exp(rng.uniform(0, np.log(100), (24, 24)))
        mask = rng.random((24, 24)) < 0.3
        c = fvm.fvm_coefficients(jnp.asarray(d), 0.0, 1.0,
                                 mask=jnp.asarray(mask), symmetric=True)
        spec = make_flux_spec(jnp.asarray(d), 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(24, dtype=jnp.float64) / 24, (24, 24))
        res = solve_mgcg(c, spec, x0, tol=1e-12, max_iter=3000, check_every=10)
        A = sp.csc_matrix(to_dense(c))
        xd = spla.spsolve(A, np.asarray(c.b).ravel()).reshape(24, 24)
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-6, atol=1e-9)

    def test_far_fewer_iterations_than_cg(self, rng):
        from effectivediffusivityfvm_tpu.solvers.cg import solve_cg

        c, spec, x0 = problem(rng, 64, 64, contrast=1e4)
        mg = solve_mgcg(c, spec, x0, tol=1e-9, max_iter=3000, check_every=10,
                        criterion="residual")
        cg = solve_cg(c, spec, x0, tol=1e-9, max_iter=200_000, check_every=50,
                      criterion="residual")
        assert int(mg.iters) * 5 < int(cg.iters)

    def test_batched_matches_singles(self, rng):
        probs = [problem(rng, 16, 16, contrast=c)[:3] for c in (10.0, 1e3)]
        kw = dict(tol=1e-10, max_iter=2000, check_every=10)
        singles = [solve_mgcg(c, s, x, **kw) for c, s, x in probs]
        coeffs = jax.tree.map(lambda *a: jnp.stack(a), *[p[0] for p in probs])
        spec = jax.tree.map(lambda *a: jnp.stack(a), *[p[1] for p in probs])
        x0 = jnp.stack([p[2] for p in probs])
        batched = solve_mgcg_batched(coeffs, spec, x0, **kw)
        for k, single in enumerate(singles):
            np.testing.assert_allclose(float(batched.deff[k]), float(single.deff),
                                       rtol=1e-8)

    def test_dispatch_pipeline_integration(self):
        from effectivediffusivityfvm_tpu.config import SimulationConfig
        from effectivediffusivityfvm_tpu.io.images import parallel_slab
        from effectivediffusivityfvm_tpu.pipeline.single import single_sim

        img = parallel_slab(32, 0.5)
        cfg = SimulationConfig(
            n_phase=2, d_fluid=1.0, d_solid=0.1, convergence=1e-9,
            max_iter=2000, check_every=10, dtype="float64",
            criterion="residual", solver="mgcg",
        )
        res = single_sim(cfg, img=img, write_output=False)
        np.testing.assert_allclose(res.deff, 0.55, rtol=1e-6)


class TestCompaction:
    """Inter-segment batch compaction (solvers/compact.py)."""

    def test_compacted_matches_plain(self, rng):
        from effectivediffusivityfvm_tpu.ops import fvm
        from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
        from effectivediffusivityfvm_tpu.solvers.compact import solve_batched_compacted
        from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

        bsz, ny, nx = 5, 24, 16
        d = np.exp(rng.uniform(0, np.log(1e4), (bsz, ny, nx)))
        dj = jnp.asarray(d)
        coeffs = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))(dj, 0.0, 1.0)
        spec = jax.vmap(make_flux_spec, in_axes=(0, None, None))(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (bsz, ny, nx))
        kw = dict(tol=1e-9, max_iter=500, check_every=10, criterion="residual")
        ref = solve_mgcg_batched(coeffs, spec, x0, **kw)
        got = solve_batched_compacted(solve_mgcg_batched, coeffs, spec, x0,
                                      segment=40, min_bucket=2, **kw)
        assert np.all(np.asarray(got.conv) <= 1e-9)
        np.testing.assert_allclose(np.asarray(got.deff), np.asarray(ref.deff),
                                   rtol=1e-7)
        # total work within one segment-restart period of the plain run
        assert np.all(np.asarray(got.iters) <= np.asarray(ref.iters) + 40)

    def test_compaction_shrinks_buckets(self, rng):
        from effectivediffusivityfvm_tpu.ops import fvm
        from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
        from effectivediffusivityfvm_tpu.solvers.compact import solve_batched_compacted

        from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

        # one much-harder image dominates the tail
        bsz, n = 4, 32
        ds = [np.ones((n, n)), np.ones((n, n)), np.ones((n, n)),
              np.exp(rng.uniform(0, np.log(1e6), (n, n)))]
        dj = jnp.asarray(np.stack(ds))
        coeffs = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))(dj, 0.0, 1.0)
        spec = jax.vmap(make_flux_spec, in_axes=(0, None, None))(dj, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64) / n, (bsz, n, n))
        got = solve_batched_compacted(
            solve_mgcg_batched, coeffs, spec, x0, tol=1e-11, max_iter=2_000,
            segment=20, check_every=10, criterion="residual", min_bucket=2)
        assert np.all(np.asarray(got.conv) <= 1e-11)
        # easy (constant-D) images finish almost immediately; the hard one
        # keeps iterating alone
        it = np.asarray(got.iters)
        assert it[3] > 4 * it[0]

    def test_stall_guard_retires_limit_cycle(self):
        """The runtime guard for the warm-restart limit cycle: a solver whose
        conv never improves across full segments is retired after
        ``stall_segments`` segments with a RuntimeWarning instead of burning
        iterations to max_iter (compact.py docstring hazard)."""
        import warnings as _warnings

        from effectivediffusivityfvm_tpu.solvers.compact import solve_batched_compacted
        from effectivediffusivityfvm_tpu.solvers.driver import SolveResult

        bsz, n = 2, 8
        x0 = jnp.zeros((bsz, n, n))
        dummy = jnp.ones((bsz,))
        calls = []

        def cycling_solve(coeffs, spec, x, *, tol, max_iter, check_every,
                          criterion, **kw):
            # uses its full segment every time, conv frozen above tol
            nb = x.shape[0]
            calls.append(nb)
            return SolveResult(
                x=x,
                deff=jnp.full((nb,), 0.5),
                conv=jnp.full((nb,), 1e-3),
                iters=jnp.full((nb,), max_iter, jnp.int32),
            )

        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            got = solve_batched_compacted(
                cycling_solve, dummy, dummy, x0, tol=1e-9, max_iter=10_000,
                segment=20, check_every=10, min_bucket=2, stall_segments=3)
        assert any(issubclass(w.category, RuntimeWarning)
                   and "limit cycle" in str(w.message) for w in rec)
        it = np.asarray(got.iters)
        # improvement seen once (inf -> 1e-3), then 3 stalled segments
        assert np.all(it == 4 * 20), it
        assert np.all(np.asarray(got.conv) == 1e-3)  # honest, > tol

        # stall_segments=0 disables the guard: runs to max_iter
        calls.clear()
        with _warnings.catch_warnings(record=True) as rec0:
            _warnings.simplefilter("always")
            got0 = solve_batched_compacted(
                cycling_solve, dummy, dummy, x0, tol=1e-9, max_iter=100,
                segment=20, check_every=10, min_bucket=2, stall_segments=0)
        assert not any(issubclass(w.category, RuntimeWarning) for w in rec0)
        assert np.all(np.asarray(got0.iters) == 100)

        # criterion="deff" (oscillating percent-change monitor): guard inert
        # — a flat conv says nothing about progress there, so the image runs
        # to max_iter instead of being retired (ADVICE r3 medium)
        calls.clear()
        with _warnings.catch_warnings(record=True) as recd:
            _warnings.simplefilter("always")
            gotd = solve_batched_compacted(
                cycling_solve, dummy, dummy, x0, tol=1e-9, max_iter=100,
                segment=20, check_every=10, min_bucket=2, stall_segments=3,
                criterion="deff")
        assert not any(issubclass(w.category, RuntimeWarning) for w in recd)
        assert np.all(np.asarray(gotd.iters) == 100)

    def test_stall_guard_ignores_truncated_final_segment(self):
        """A truncated final segment (max_iter nearly exhausted) must not
        count toward the stall tally nor emit the limit-cycle warning."""
        import warnings as _warnings

        from effectivediffusivityfvm_tpu.solvers.compact import solve_batched_compacted
        from effectivediffusivityfvm_tpu.solvers.driver import SolveResult

        bsz, n = 2, 8
        x0 = jnp.zeros((bsz, n, n))
        dummy = jnp.ones((bsz,))

        def cycling_solve(coeffs, spec, x, *, tol, max_iter, check_every,
                          criterion, **kw):
            nb = x.shape[0]
            return SolveResult(
                x=x, deff=jnp.full((nb,), 0.5), conv=jnp.full((nb,), 1e-3),
                iters=jnp.full((nb,), max_iter, jnp.int32))

        # max_iter=50, segment=20: segments run 20, 20, then a TRUNCATED 10.
        # Tally after full segments is 1 (first segment sets best, second
        # stalls); the truncated third must not push it to stall_segments=2.
        with _warnings.catch_warnings(record=True) as rec:
            _warnings.simplefilter("always")
            got = solve_batched_compacted(
                cycling_solve, dummy, dummy, x0, tol=1e-9, max_iter=50,
                segment=20, check_every=10, min_bucket=2, stall_segments=2)
        assert not any(issubclass(w.category, RuntimeWarning) for w in rec)
        assert np.all(np.asarray(got.iters) == 50)

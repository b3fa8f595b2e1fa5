"""Sharded-MGCG engine ladder on the real chip (1-device sp mesh).

Usage: python benchmarks/bench_sharded.py [N]   (default 1024)

Measures the row-sharded 2D MGCG (parallel/halo.sharded_solve_mgcg) at
N x N, contrast 1e6, relresidual <= 1e-4, in three modes:

  xla     use_pallas=False — XLA sweeps with 1-row ppermute halos
  cycle   fused T1/T2 Pallas cycle, XLA CG algebra (parallel/fused2d.py;
          forced by disabling the CG-engine guard)
  cg      fused whole-CG-iteration engine (parallel/fused2d_cg.py:
          three per-shard Pallas passes + psum'd scalars per iteration)

The mesh is a single real device, so collectives are degenerate — this
isolates the per-iteration kernel/algebra cost that each chip pays on a
real sp mesh.  Timings force scalars only (a full-plane D2H through the
axon tunnel is ~350 ms at 2048^2 and is not part of the solver).
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from effectivediffusivityfvm_tpu.models import phases
    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    from effectivediffusivityfvm_tpu.parallel import fused2d_cg
    from effectivediffusivityfvm_tpu.parallel.halo import sharded_solve_mgcg
    from jax.sharding import Mesh

    rng = np.random.default_rng(7)
    noise = ndimage.gaussian_filter(rng.standard_normal((n, n)), sigma=4.0)
    classes = ((noise >= np.quantile(noise, 0.65)) * 255).astype(np.uint8)
    classes = phases.two_phase_classes(classes)
    d = jnp.asarray(phases.d_field_from_classes(classes[None], 1.0, 1e-6,
                                                dtype=jnp.float32)[0])
    c = fvm.fvm_coefficients(d, 0.0, 1.0)
    spec = make_flux_spec(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n))
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
    kw = dict(tol=1e-4, max_iter=400, check_every=20,
              criterion="relresidual", nu1=2, nu2=2, min_size=8,
              coarse_iters=8)

    def run(label, **mode):
        from effectivediffusivityfvm_tpu.parallel.halo import _mgcg_runner

        # the runner is lru_cached on its static config, which does not see
        # the guard monkeypatch — clear it so each mode traces fresh
        _mgcg_runner.cache_clear()
        guard = fused2d_cg.sharded_fused_cg_ok
        if mode.pop("no_cg_engine", False):
            fused2d_cg.sharded_fused_cg_ok = lambda *a, **k: False
        try:
            r = sharded_solve_mgcg(c, spec, x0, mesh, **kw, **mode)
            float(r.deff)                    # compile + settle
            t0 = time.perf_counter()
            r = sharded_solve_mgcg(c, spec, x0, mesh, **kw, **mode)
            deff = float(r.deff)             # scalar fetch only
            dt = time.perf_counter() - t0
        finally:
            fused2d_cg.sharded_fused_cg_ok = guard
        it = int(r.iters)
        print(f"{label:6s} {dt:7.3f} s  iters={it:4d} "
              f"({1e3 * dt / max(it, 1):6.2f} ms/it)  deff={deff:.6f} "
              f"conv={float(r.conv):.3e}")
        return dt

    print(f"sharded MGCG {n}x{n} contrast 1e6, relres<=1e-4, "
          f"1-device sp mesh, device={jax.devices()[0]}")
    t_x = run("xla", use_pallas=False)
    t_c = run("cycle", use_pallas=True, no_cg_engine=True)
    t_g = run("cg", use_pallas=True)
    print(f"speedup: cycle {t_x / t_c:.2f}x, cg-engine {t_x / t_g:.2f}x "
          f"(vs xla); cg vs cycle {t_c / t_g:.2f}x")


if __name__ == "__main__":
    main()

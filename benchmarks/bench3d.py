"""Secondary benchmark: 256^3 voxel Deff solve (BASELINE.json config 5).

Generates a correlated 3D porous medium (65% porosity, contrast 1e6),
solves the 7-point system with multigrid-PCG to a 1e-6 mean-|residual| on
one chip, and reports wall time + iterations.  (The z-slab-sharded variant
runs the same solve over a device mesh — parallel/halo3d.py — exercised by
the multichip dry run; one real chip is available here.)

Usage: python benchmarks/bench3d.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(n: int = 256):
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from effectivediffusivityfvm_tpu.ops import fvm3d
    from effectivediffusivityfvm_tpu.solvers.solvers3d import solve_mgcg_3d

    rng = np.random.default_rng(11)
    print(f"building {n}^3 medium...", file=sys.stderr)
    noise = ndimage.gaussian_filter(rng.standard_normal((n, n, n)), sigma=3.0)
    fluid = noise < np.quantile(noise, 0.65)
    d = jnp.asarray(np.where(fluid, 1.0, 1e-6), jnp.float32)

    coeffs = fvm3d.fvm_coefficients_3d(d, 0.0, 1.0)
    spec = fvm3d.make_flux_spec_3d(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n, n))

    # first_window=0 (auto -> check_every): cold solve on a residual
    # criterion skips the 1-iteration opening launch + refresh round
    kw = dict(tol=1e-4, max_iter=2000, check_every=10, criterion="relresidual",
              nu1=2, nu2=2, coarse_iters=8, first_window=0)
    # headline: matrix-free level 0 (the engine recomputes the fine stencil
    # from D in-kernel); stored-coefficient run printed for comparison
    t0 = time.perf_counter()
    res = solve_mgcg_3d(coeffs, spec, x0, d_field=d, **kw)
    deff = float(np.asarray(res.deff))
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = solve_mgcg_3d(coeffs, spec, x0, d_field=d, **kw)
    deff = float(np.asarray(res.deff))
    t = time.perf_counter() - t0

    res_s = solve_mgcg_3d(coeffs, spec, x0, **kw)
    _ = float(np.asarray(res_s.deff))          # force (warm/compile)
    t0 = time.perf_counter()
    res_s = solve_mgcg_3d(coeffs, spec, x0, **kw)
    deff_s = float(np.asarray(res_s.deff))
    t_s = time.perf_counter() - t0

    print(f"256^3 MGCG (matrix-free L0): warm {warm:.1f}s, steady {t:.2f}s, "
          f"iters {int(res.iters)}, resid {float(res.conv):.2e}, deff {deff:.4f}",
          file=sys.stderr)
    print(f"256^3 MGCG (stored coeffs):  steady {t_s:.2f}s, "
          f"iters {int(res_s.iters)}, deff {deff_s:.4f}", file=sys.stderr)
    print({"metric": f"Deff solve seconds ({n}^3 voxels, mgcg fp32, 1e-4 relresidual)",
           "value": round(t, 3), "iters": int(res.iters), "deff": round(deff, 5),
           "stored_coeff_seconds": round(t_s, 3)})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

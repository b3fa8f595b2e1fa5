"""3D bench-site sweep: 256^3 fused-engine knobs on the real chip.

Usage: python benchmarks/bench3d_sweep.py [n]
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
    noise = ndimage.gaussian_filter(rng.standard_normal((n, n, n)), sigma=3.0)
    fluid = noise < np.quantile(noise, 0.65)
    d = jnp.asarray(np.where(fluid, 1.0, 1e-6), jnp.float32)
    coeffs = fvm3d.fvm_coefficients_3d(d, 0.0, 1.0)
    spec = fvm3d.make_flux_spec_3d(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n, n))

    base = dict(tol=1e-4, max_iter=2000, check_every=10, criterion="relresidual")
    grid = [
        dict(use_pallas=False),                        # XLA reference leg
        dict(),                                        # fused, defaults
        dict(nu1=2, nu2=2),
        dict(nu1=2, nu2=2, coarse_iters=8),
        dict(nu1=3, nu2=3, coarse_iters=8, min_size=8),
    ]
    for kw in grid:
        full = dict(base, **kw)
        res = solve_mgcg_3d(coeffs, spec, x0, **full)
        float(np.asarray(res.deff))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_mgcg_3d(coeffs, spec, x0, **full)
            deff = float(np.asarray(res.deff))
            times.append(time.perf_counter() - t0)
        print(f"{kw}  best={min(times):.3f}s  iters={int(res.iters)}  "
              f"resid={float(res.conv):.2e}  deff={deff:.5f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

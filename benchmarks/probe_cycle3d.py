"""Probe: why does a standalone v_cycle3d_tiled call measure ~9 s at 256^3
when the CG engine runs the same T1/tail/T2 work at ~7 ms/iteration?

Times individual reps (each forced), the T1 pass alone, and the coarse
tail alone.  Usage: python benchmarks/probe_cycle3d.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=256):
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from effectivediffusivityfvm_tpu.ops import fvm3d
    from effectivediffusivityfvm_tpu.ops.kernels import vcycle3d as V
    from effectivediffusivityfvm_tpu.solvers.solvers3d import build_hierarchy_3d

    rng = np.random.default_rng(11)
    noise = ndimage.gaussian_filter(rng.standard_normal((n, n, n)), sigma=3.0)
    fluid = noise < np.quantile(noise, 0.65)
    d = jnp.asarray(np.where(fluid, 1.0, 1e-6), jnp.float32)
    coeffs = fvm3d.fvm_coefficients_3d(d, 0.0, 1.0)

    band = V.band_z_for(n, n, n, 4)
    pz, py, px = V.pad_shape_3d(n, n, n, band)
    lv = build_hierarchy_3d(V.pad_op_3d(coeffs, pz - n, py - n, px - n),
                            min_size=4, pad_levels=True)
    print(f"band={band}", file=sys.stderr)

    r = jnp.asarray(rng.standard_normal((1, n, n, n)), jnp.float32)
    kw = dict(omega=0.8, nu=2, coarse_iters=8, over=1.8)

    f_cycle = jax.jit(lambda lv_, rr: jnp.sum(
        V.v_cycle3d_tiled(lv_, rr, band=band, **kw)))
    np.asarray(f_cycle(lv, r))  # compile
    for i in range(4):
        t0 = time.perf_counter()
        np.asarray(f_cycle(lv, r))
        print(f"cycle rep {i}: {(time.perf_counter() - t0)*1e3:8.2f} ms")

    # direct call (its own jit), forced each rep
    out = V.v_cycle3d_tiled(lv, r, band=band, **kw)
    np.asarray(jnp.sum(out))
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(V.v_cycle3d_tiled(lv, r, band=band, **kw)))
        print(f"direct rep {i}: {(time.perf_counter() - t0)*1e3:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

"""Slope-only microbench for the banded CG engine at 2048^2.

bench_tiled_kernel_micro.py forces the full result PLANE per rep, which
adds a ~350 ms (high-variance) D2H fetch through the axon tunnel and can
swamp the per-iteration slope.  This bench forces only the (B, 1) kdone
scalar and uses a wide k-gap (5 vs 105) so the slope dominates the noise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_tiled_slope.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.bench_configs import _correlated_binary  # noqa: E402


def timeit(fn, reps=5):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(n=2048):
    import jax
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.kernels.cgstep_tiled import (
        cg_steps_tiled)
    from effectivediffusivityfvm_tpu.ops.kernels.vcycle_tiled import (
        tiled_band, tiled_pad_shape, v_cycle_tiled)
    from effectivediffusivityfvm_tpu.solvers.multigrid import (_pad_op,
                                                               build_hierarchy)

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(3)
    img = _correlated_binary(rng, n, porosity=0.65, sigma=8.0)
    d = jnp.asarray(np.where(img == 0, 1.0, 1e-6), jnp.float32)
    coeffs = jax.tree.map(lambda a: a[None], fvm.fvm_coefficients(d, 0.0, 1.0))
    band = tiled_band(n, n, 4)
    py, px = tiled_pad_shape(n, n, band)
    lv = build_hierarchy(_pad_op(coeffs, py - n, px - n), min_size=32,
                         pad_levels=True)
    mg = dict(omega=0.8, nu=2, coarse_iters=64, over=1.8)
    print(f"band={band} padded={py}x{px}", file=sys.stderr)

    r = lv[0].b
    x = jnp.zeros((1, py, px), jnp.float32)
    z = v_cycle_tiled(lv, r, band=band, **mg)
    rz = jnp.sum(r * z, axis=(-2, -1))
    ones = jnp.ones((1, 1), jnp.float32)
    d_pad = jnp.pad(d[None], [(0, 0), (0, py - n), (0, px - n)])
    dx = dy = 1.0 / n
    geom = (dy / dx, dx / dy, dy / (dx / 2.0), n)

    def steps(k, mf):
        kw = dict(d_field=d_pad, geom=geom) if mf else {}
        out = cg_steps_tiled(lv, x, r, z, rz[:, None], ones, 0.0 * ones,
                             jnp.full((1, 1), 1e30, jnp.float32),
                             jnp.asarray(k, jnp.int32), band=band, **mg,
                             **kw)
        np.asarray(out[4])            # scalar force only (lazy axon fetch)

    ks = (5, 105)
    for mf in (False, True):
        ts = [timeit(lambda k=k, mf=mf: steps(k, mf)) for k in ks]
        slope = (ts[1] - ts[0]) / (ks[1] - ks[0])
        tag = "matrix-free L0" if mf else "stored coeffs "
        print(f"{tag}: k={ks[0]}: {1e3 * ts[0]:8.2f} ms  "
              f"k={ks[1]}: {1e3 * ts[1]:8.2f} ms"
              f"  -> {1e3 * slope:.2f} ms/iter in-kernel,"
              f" {1e3 * (ts[0] - ks[0] * slope):.2f} ms launch", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)

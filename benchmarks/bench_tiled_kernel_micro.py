"""Microbench: per-iteration cost of the banded CG engine's pieces at 2048^2.

Times (a) one v_cycle_tiled call, (b) cg_steps_tiled at k=5 and k=20 with
the early exit disabled — the slope isolates the in-kernel per-iteration
cost from launch overhead, (c) the driver's fresh() analog (matvec +
cycle + dots in XLA).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python benchmarks/bench_tiled_kernel_micro.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.bench_configs import _correlated_binary  # noqa: E402


def timeit(fn, reps=5):
    fn()                      # warm
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
    print(f"band={band} padded={py}x{px} levels="
          f"{[c.diag.shape[-2:] for c in lv]}", file=sys.stderr)

    r = lv[0].b
    x = jnp.zeros((1, py, px), jnp.float32)

    t = timeit(lambda: np.asarray(v_cycle_tiled(lv, r, band=band, **mg)))
    print(f"v_cycle_tiled:        {1e3 * t:8.2f} ms/call", flush=True)

    z = v_cycle_tiled(lv, r, band=band, **mg)
    rz = jnp.sum(r * z, axis=(-2, -1))
    ones = jnp.ones((1, 1), jnp.float32)

    def steps(k):
        out = cg_steps_tiled(lv, x, r, z, rz[:, None], ones, 0.0 * ones,
                             jnp.full((1, 1), 1e30, jnp.float32),
                             jnp.asarray(k, jnp.int32), band=band, **mg)
        np.asarray(out[0])

    t5 = timeit(lambda: steps(5))
    t20 = timeit(lambda: steps(20))
    print(f"cg_steps_tiled k=5:   {1e3 * t5:8.2f} ms  k=20: {1e3 * t20:8.2f} ms"
          f"  -> {1e3 * (t20 - t5) / 15:.2f} ms/iter in-kernel,"
          f" {1e3 * (t5 - 5 * (t20 - t5) / 15):.2f} ms launch", flush=True)

    def fresh():
        rr = lv[0].b - fvm.apply_operator(lv[0], x)
        zz = v_cycle_tiled(lv, rr, band=band, **mg)
        np.asarray(jnp.sum(rr * zz, axis=(-2, -1)))

    t = timeit(fresh)
    print(f"fresh (matvec+cycle): {1e3 * t:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)

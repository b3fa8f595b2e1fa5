"""Microbenchmark: where does the banded 3D fused engine spend its time?

Times, at n^3 (default 256, B=1, fp32):
  * the full fused tiled V-cycle (v_cycle3d_tiled) per call,
  * the whole-CG-iteration engine's per-iteration slope (cg_steps3d_tiled
    at k=4 vs k=16),
  * the recursive coarse tail per call (level-1 re-banding included).

Scalar-forced timing (axon relay: never fetch a volume inside a timed
region); the warmup call IS forced so remote compile stays out of the
timed window (an unforced jit dispatch returns before the relay-side
compile finishes — the first version of this file reported a 9.3 s
"cycle" that was ~93 s of compile spread over 10 reps).

Usage: python benchmarks/bench3d_micro.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=10):
    np.asarray(fn(*args))  # compile + execute, forced
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main(n=256):
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from effectivediffusivityfvm_tpu.ops import fvm3d
    from effectivediffusivityfvm_tpu.ops.kernels import vcycle3d as V
    from effectivediffusivityfvm_tpu.ops.kernels import cgstep3d as C
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
    shapes = [c.diag.shape[-3:] for c in lv]
    print(f"band={band} shapes={shapes}", file=sys.stderr)

    r = jnp.asarray(rng.standard_normal((1,) + shapes[0]), jnp.float32)
    kw = dict(omega=0.8, nu=2, coarse_iters=8, over=1.8)

    # 1. full tiled cycle
    f_cycle = jax.jit(lambda lv_, rr: jnp.sum(
        V.v_cycle3d_tiled(lv_, rr, band=band, **kw)))
    t_cycle = timeit(f_cycle, lv, r)
    print(f"tiled cycle/call            {t_cycle*1e3:8.2f} ms")

    # 2. CG engine slope
    x = jnp.zeros_like(r)
    p = r
    rz = jnp.sum(r * r, axis=(-3, -2, -1))[:, None]
    ones = jnp.ones((1, 1), jnp.float32)

    def steps(k):
        f = jax.jit(lambda lv_, xx, rr, pp: jnp.sum(C.cg_steps3d_tiled(
            lv_, xx, rr, pp, rz, ones, ones * 0.0, ones * 1e30,
            jnp.asarray(k, jnp.int32), band=band, **kw)[0]))
        return timeit(f, lv, x, r, p, reps=5)

    t4, t16 = steps(4), steps(16)
    print(f"cg engine slope             {(t16-t4)/12*1e3:8.2f} ms/iter "
          f"(k=4: {t4*1e3:.1f} ms, k=16: {t16*1e3:.1f} ms)")

    # 3. coarse tail (includes level-1 re-banding every call)
    g_total = shapes[0][0] // band
    rc = jnp.asarray(rng.standard_normal(
        (g_total * (band // 2), shapes[1][1], shapes[1][2])), jnp.float32)
    f_tail = jax.jit(lambda lv_, rr: jnp.sum(V.coarse_tail3(
        lv_, rr, 1, interpret=False, **kw)))
    print(f"coarse_tail3/call           {timeit(f_tail, lv, rc)*1e3:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

"""Probe the 3D coarse tail: where do its ~3.5 ms/call go at 256^3?

Slope-timed (fori_loop of k chained calls inside one jit, k=4 vs k=16, so
relay dispatch and compile stay out): the full tail, the 128^3 banded
cycle it recurses into, and the 64^3 whole-VMEM cycle below that.

Usage: python benchmarks/probe_tail3d.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope(make_fn, *args, k_lo=4, k_hi=16):
    import jax

    ts = {}
    for k in (k_lo, k_hi):
        f = jax.jit(make_fn(k))
        np.asarray(f(*args))  # compile + run, forced
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts[k] = time.perf_counter() - t0
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), ts


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
    shapes = [c.diag.shape[-3:] for c in lv]
    kw = dict(omega=0.8, nu=2, coarse_iters=8, over=1.8)
    g_total = shapes[0][0] // band

    def chain(body):
        def make(k):
            def f(r):
                return jnp.sum(jax.lax.fori_loop(0, k, lambda _, a: body(a),
                                                 r))
            return f
        return make

    # 1. full tail on the restricted-residual layout
    rc = jnp.asarray(rng.standard_normal(
        (g_total * (band // 2), shapes[1][1], shapes[1][2])), jnp.float32)

    def tail_it(a):
        out = V.coarse_tail3(lv, a, 1, interpret=False, **kw)
        return out[0, : rc.shape[0]]

    s, ts = slope(chain(tail_it), rc)
    print(f"coarse_tail3 slope          {s*1e3:8.2f} ms/call  {ts}")

    # 2. the 128^3 banded cycle (levels[1:]) it recurses into
    r1 = jnp.asarray(rng.standard_normal((1,) + shapes[1]), jnp.float32)
    band1 = V.band_z_for(*shapes[1], 4)

    def cyc1(a):
        return V.v_cycle3d_tiled(lv[1:], a, band=band1, **kw)

    s1, ts1 = slope(chain(cyc1), r1)
    print(f"128^3 banded cycle slope    {s1*1e3:8.2f} ms/call  {ts1}")

    # 3. the 64^3 whole-VMEM cycle (levels[2:])
    r2 = jnp.asarray(rng.standard_normal((1,) + shapes[2]), jnp.float32)

    def cyc2(a):
        return V.v_cycle3d_pallas(lv[2:], a, **kw)

    s2, ts2 = slope(chain(cyc2), r2)
    print(f"64^3 whole-VMEM slope       {s2*1e3:8.2f} ms/call  {ts2}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

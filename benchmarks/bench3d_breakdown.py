"""Breakdown of the 256^3 fused-MGCG solve's fixed costs.

The end-to-end bench3d solve is ~0.158 s at 10 engine iterations of
~5 ms each, so ~0.1 s is per-solve fixed cost.  This times the pieces
separately on the real chip.  Each piece is wrapped in its own jit that
reduces the outputs to ONE scalar in-graph (a per-leaf host-side force
would pay one relay dispatch per leaf and swamp the signal), and a null
jit call is timed first as the dispatch floor to subtract.

Usage: python benchmarks/bench3d_breakdown.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def timed(fn, *args, reps=5, name=""):
    tc = time.perf_counter()
    np.asarray(fn(*args))  # force (compile + first run)
    print(f"  [{name}: compiled+first in {time.perf_counter()-tc:.1f}s]",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main(n: int = 256):
    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from effectivediffusivityfvm_tpu.ops import fvm3d
    from effectivediffusivityfvm_tpu.ops.kernels.vcycle3d import (
        band_z_for, pad_op_3d, pad_shape_3d, v_cycle3d_tiled)
    from effectivediffusivityfvm_tpu.solvers.solvers3d import (
        build_hierarchy_3d, solve_mgcg_3d)

    rng = np.random.default_rng(11)
    print(f"building {n}^3 medium...", file=sys.stderr)
    noise = ndimage.gaussian_filter(rng.standard_normal((n, n, n)), sigma=3.0)
    fluid = noise < np.quantile(noise, 0.65)
    d = jnp.asarray(np.where(fluid, 1.0, 1e-6), jnp.float32)

    dev = jax.devices()[0]
    print(f"device={dev.device_kind}")

    def sumall(tree):
        return sum(jnp.sum(l) for l in jax.tree.leaves(tree))

    # --- dispatch floor ---
    t_null = timed(jax.jit(lambda dd: dd[0, 0, 0] + 1.0), d, name="null")

    # --- assembly ---
    t_asm = timed(jax.jit(lambda dd: sumall(
        (fvm3d.fvm_coefficients_3d(dd, 0.0, 1.0),
         fvm3d.make_flux_spec_3d(dd, 0.0, 1.0)))), d, name="asm")
    coeffs = fvm3d.fvm_coefficients_3d(d, 0.0, 1.0)
    spec = fvm3d.make_flux_spec_3d(d, 0.0, 1.0)

    # --- hierarchy (as the fused driver builds it: batched, padded) ---
    cb = jax.tree.map(lambda a: jax.block_until_ready(a)[None], coeffs)
    band = band_z_for(n, n, n, 4)
    pz, py, px = pad_shape_3d(n, n, n, band)

    def hier(c):
        return build_hierarchy_3d(
            pad_op_3d(c, pz - n, py - n, px - n), min_size=4, pad_levels=True)

    t_hier = timed(jax.jit(lambda c: sumall(hier(c))), cb, name="hier")
    levels = jax.jit(hier)(cb)
    levels = [jax.tree.map(jax.block_until_ready, l) for l in levels]

    # --- fresh: residual + one tiled fused cycle + dot ---
    x0 = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32) / n, (1, n, n, n))
    x0p = jnp.pad(x0, [(0, 0), (0, pz - n), (0, py - n), (0, px - n)])

    def fresh(lv, xp):
        r = lv[0].b - fvm3d.apply_operator_3d(lv[0], xp)
        z = v_cycle3d_tiled(lv, r, omega=0.8, nu=2, coarse_iters=8,
                            over=1.8, band=band)
        return jnp.sum(r * z)

    t_fresh = timed(jax.jit(fresh), levels, x0p, name="fresh")

    # --- matvec alone (the XLA roll-based 7-point apply) ---
    t_mv = timed(jax.jit(
        lambda lv, xp: jnp.sum(fvm3d.apply_operator_3d(lv[0], xp))),
        levels, x0p, name="matvec")

    # --- deff ---
    sb = jax.tree.map(lambda a: jnp.asarray(a)[None], spec)
    t_deff = timed(jax.jit(
        lambda s, xp: jnp.sum(fvm3d.boundary_deff_3d(s, xp[..., :n, :n, :n]))),
        sb, x0p, name="deff")

    # --- full solve ---
    kw = dict(tol=1e-4, max_iter=2000, criterion="relresidual",
              nu1=2, nu2=2, coarse_iters=8, check_every=10)
    solve = lambda: solve_mgcg_3d(coeffs, spec, x0[0], d_field=d, **kw)
    np.asarray(solve().deff)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        res = solve()
        np.asarray(res.deff)
    t_full = (time.perf_counter() - t0) / reps
    iters = int(np.asarray(res.iters))

    def row(name, t, mult=1):
        net = t - t_null
        s = f"{name:10s} {t*1e3:8.1f} ms  (net {net*1e3:7.1f})"
        if mult > 1:
            s += f"   x{mult}/solve = {mult*net*1e3:.1f}"
        print(s)

    row("null", t_null)
    row("assembly", t_asm)
    row("hierarchy", t_hier)
    row("fresh", t_fresh, 3)
    row("matvec", t_mv)
    row("deff", t_deff, 3)
    print(f"full solve {t_full*1e3:8.1f} ms   ({iters} iterations)")
    fixed = (t_hier - t_null) + 3 * (t_fresh - t_null) + 3 * (t_deff - t_null)
    print(f"accounted in-solve fixed ~= {fixed*1e3:.1f} ms; "
          f"engine+dispatch = {(t_full - t_null - fixed)*1e3:.1f} ms "
          f"over {iters} its")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

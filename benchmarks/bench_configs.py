"""BASELINE.json configs 2-4 benchmarks (round-1 verdict item 7).

Config 2: 512x512 grayscale multiphase image, per-pixel D(x), red-black SOR.
Config 3: 2048x2048 image, Jacobi-preconditioned CG at tight 1e-8 tolerance
          (plus MGCG, the solver this framework actually recommends there).
Config 4: ML-datagen sizing — largest single-chip 512x512 images/step and
          measured throughput at that size; 4096-image steps run as
          ``ceil(4096/B)`` shape groups on one chip or dp-sharded on a mesh
          (pipeline/batch.py Devices:/DP: keys).

Each config prints one JSON line; results are recorded in
docs/PERFORMANCE.md.  Usage: ``python benchmarks/bench_configs.py [2|3|4]``
(no arg = all).  Runs on the real TPU; first compile ~30-90 s per solver.
"""

import json
import sys
import time

import numpy as np


def _correlated_binary(rng, n, porosity, sigma=4.0):
    from scipy import ndimage

    noise = ndimage.gaussian_filter(rng.standard_normal((n, n)), sigma=sigma)
    thr = np.quantile(noise, porosity)
    return ((noise >= thr) * 255).astype(np.uint8)


def _grayscale_field(rng, n, sigma=6.0):
    """Smooth grayscale microstructure: pixel value -> per-pixel D(x)."""
    from scipy import ndimage

    noise = ndimage.gaussian_filter(rng.standard_normal((n, n)), sigma=sigma)
    lo, hi = noise.min(), noise.max()
    return ((noise - lo) / (hi - lo) * 255).astype(np.uint8)


def _timed(fn, *args, reps=3, **kw):
    import jax

    t0 = time.perf_counter()
    res = jax.block_until_ready(fn(*args, **kw))
    np.asarray(res.deff)       # force materialization (axon lazy fetch)
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = fn(*args, **kw)
        np.asarray(res.deff)
        times.append(time.perf_counter() - t0)
    return res, min(times), warm


def _emit(payload):
    print(json.dumps(payload), flush=True)


def config2():
    """512^2 grayscale multiphase, per-pixel D(x), red-black SOR."""
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    from effectivediffusivityfvm_tpu.solvers.rbsor import solve_rbsor

    n = 512
    rng = np.random.default_rng(2)
    img = _grayscale_field(rng, n)
    # per-pixel D(x): log-uniform over 3 decades (grayscale 0..255 -> 1e-3..1)
    d = jnp.asarray(10.0 ** (-3.0 * (1.0 - img / 255.0)), jnp.float32)
    coeffs = fvm.fvm_coefficients(d, 0.0, 1.0)
    spec = make_flux_spec(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n))

    # the reference's own stopping protocol: |dDeff/Deff| < 1e-5 checked
    # every 10k sweeps (Deff2D.cuh:1174, 1265).  An fp32 relresidual target
    # of 1e-6 is unreachable on 3-decade D(x) media (measured floor ~3e-4).
    kw = dict(tol=1e-5, max_iter=400_000, check_every=10_000,
              criterion="deff")
    res, best, warm = _timed(solve_rbsor, coeffs, spec, x0, **kw)
    iters = int(res.iters)
    # one red-black iteration = 2 half-sweeps over the full grid
    cell_rate = iters * n * n / best / 1e9
    print(f"config2: rbsor {iters} iters, conv={float(res.conv):.2e}, "
          f"deff={float(res.deff):.5f}, {best:.3f}s (warm {warm:.1f}s), "
          f"{cell_rate:.2f} Gcell-iters/s", file=sys.stderr)
    _emit({"config": 2,
           "metric": "512^2 grayscale D(x) rbsor, reference deff protocol 1e-5",
           "seconds": round(best, 4), "iters": iters,
           "gcell_iters_per_s": round(cell_rate, 2)})


def config3():
    """2048^2 at tight 1e-8: Jacobi-preconditioned CG (named solver) + MGCG."""
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    from effectivediffusivityfvm_tpu.solvers.cg import solve_cg
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg

    n = 2048
    rng = np.random.default_rng(3)
    img = _correlated_binary(rng, n, porosity=0.65, sigma=8.0)
    d = jnp.asarray(np.where(img == 0, 1.0, 1e-6), jnp.float32)
    coeffs = fvm.fvm_coefficients(d, 0.0, 1.0)
    spec = make_flux_spec(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n))

    # fast fp32 MGCG first (its fp32 floor on contrast-1e6 media is ~1e-4 —
    # measured — so the tight 1e-8 target needs the f64-engine solver below)
    kw = dict(tol=1e-4, max_iter=400, check_every=10, criterion="relresidual",
              min_size=32, coarse_iters=64, nu1=2, nu2=2, over=1.8,
              first_window=0)   # auto: skip the opening 1-iteration launch
    res, best, warm = _timed(solve_mgcg, coeffs, spec, x0, **kw)
    print(f"config3 mgcg fp32: {int(res.iters)} iters, relres={float(res.conv):.2e}, "
          f"deff={float(res.deff):.5f}, {best:.2f}s (warm {warm:.1f}s)",
          file=sys.stderr)
    _emit({"config": 3, "metric": "2048^2 fp32 MGCG to its ~1e-4 floor",
           "seconds": round(best, 3), "iters": int(res.iters),
           "relres": float(res.conv)})
    # matrix-free level 0: measured NEUTRAL in 2D (compute/launch-bound
    # engine — docs/PERFORMANCE.md round-4 notes); printed for comparison.
    # first_window=1 here: the 2D mf engine degrades under a long blind
    # OPENING window (measured r5: 111 iters at fw=10 vs 41 at fw=1 on
    # this config; the stored path moves 47 -> 37 with auto) — see the
    # solve_mgcg docstring.
    res_m, best_m, _ = _timed(solve_mgcg, coeffs, spec, x0, d_field=d,
                              **dict(kw, first_window=1))
    print(f"config3 mgcg fp32 (matrix-free L0): {int(res_m.iters)} iters, "
          f"relres={float(res_m.conv):.2e}, {best_m:.2f}s", file=sys.stderr)

    # the tight 1e-8 solve: dmg without a deflation space = equilibrated
    # f64 A-DEF2 engine with the f32 V-cycle preconditioner (solvers/dmg.py)
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
    from effectivediffusivityfvm_tpu.solvers.dmg import solve_dmg

    d64 = jnp.asarray(np.asarray(d), jnp.float64)
    c64 = fvm.fvm_coefficients(d64, 0.0, 1.0)
    s64 = make_flux_spec(d64, 0.0, 1.0)
    x064 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64) / n, (n, n))
    kw = dict(tol=1e-8, max_iter=600, check_every=20, criterion="relresidual",
              min_size=32, coarse_iters=64)
    res, best, warm = _timed(solve_dmg, c64, s64, x064, reps=1, **kw)
    print(f"config3 dmg(f64/f32): {int(res.iters)} iters, "
          f"relres={float(res.conv):.2e}, deff={float(res.deff):.5f}, "
          f"{best:.2f}s (warm {warm:.1f}s)", file=sys.stderr)
    _emit({"config": 3,
           "metric": "2048^2 f64-engine MGCG (dmg) to relres 1e-8",
           "seconds": round(best, 3), "iters": int(res.iters),
           "relres": float(res.conv)})

    # the baseline-named solver: diagonal-PCG, bounded iteration budget
    # (CG needs O(sqrt(kappa)) ~ 1e5 iterations here; report the achieved
    # residual at a 20k budget so the number is honest, not aspirational)
    kw = dict(tol=1e-8, max_iter=20_000, check_every=500, criterion="relresidual")
    res, best, warm = _timed(solve_cg, coeffs, spec, x0, reps=1, **kw)
    print(f"config3 cg(20k cap): {int(res.iters)} iters, "
          f"relres={float(res.conv):.2e}, {best:.2f}s", file=sys.stderr)
    _emit({"config": 3, "metric": "2048^2 diagonal-PCG, 20k-iteration budget",
           "seconds": round(best, 3), "iters": int(res.iters),
           "relres": float(res.conv)})


def config4():
    """Datagen sizing: largest single-chip 512^2 batch and throughput."""
    import jax
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.models import phases
    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    n = 512
    rng = np.random.default_rng(4)
    kw = dict(tol=1e-6, max_iter=3_000, check_every=10, criterion="residual",
              min_size=16, coarse_iters=32, nu1=2, nu2=2, over=1.8)

    from effectivediffusivityfvm_tpu.solvers.compact import (
        solve_batched_compacted)

    best_cfg = None
    batch = 64
    while batch <= 1024:
        imgs = [_correlated_binary(rng, n, 0.65) for _ in range(batch)]
        classes = np.stack([phases.two_phase_classes(im) for im in imgs])
        d = jnp.asarray(phases.d_field_from_classes(classes, 1.0, 1e-6,
                                                    dtype=np.float32))
        coeffs = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))(d, 0.0, 1.0)
        spec = jax.vmap(make_flux_spec, in_axes=(0, None, None))(d, 0.0, 1.0)
        x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (batch, n, n))
        try:
            res, best, warm = _timed(solve_mgcg_batched, coeffs, spec, x0,
                                     reps=2, **kw)
            # wall time of a fused batch tracks its SLOWEST image; the
            # compaction wrapper re-packs active images between segments
            # (solvers/compact.py) and wins whenever the iteration
            # distribution has a tail
            resc, bestc, _ = _timed(solve_batched_compacted, solve_mgcg_batched,
                                    coeffs, spec, x0, reps=2, segment=50, **kw)
        except Exception as e:  # noqa: BLE001 — OOM at the capacity edge
            print(f"config4: batch {batch} failed ({type(e).__name__}: {e}); "
                  "stopping search", file=sys.stderr)
            break
        it = np.asarray(res.iters)
        rate, ratec = batch / best, batch / bestc
        print(f"config4: batch {batch}: plain {best:.3f}s -> {rate:.1f}/s "
              f"(iters {it.min()}..{it.max()}), compacted {bestc:.3f}s -> "
              f"{ratec:.1f}/s", file=sys.stderr)
        best_cfg = (batch, min(best, bestc), max(rate, ratec))
        del coeffs, spec, x0, res, resc
        batch *= 2

    if best_cfg:
        batch, secs, rate = best_cfg
        groups = -(-4096 // batch)
        _emit({"config": 4,
               "metric": "largest single-chip 512^2 images/step (MGCG, 1e-6)",
               "images_per_step": batch, "seconds_per_step": round(secs, 3),
               "solves_per_sec": round(rate, 1),
               "est_seconds_per_4096_images": round(groups * secs, 1)})


def main():
    import jax

    print(f"bench device: {jax.devices()[0]}", file=sys.stderr)
    which = sys.argv[1:] or ["2", "3", "4"]
    for w in which:
        {"2": config2, "3": config3, "4": config4}[w]()


if __name__ == "__main__":
    main()

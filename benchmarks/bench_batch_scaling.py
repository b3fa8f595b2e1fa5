"""Batch-size scaling of the headline solve — and WHY it scales.

Observed (round 3): the recorded bench at DEFF_BENCH_BATCH 64/128/256
measures 882/1058/1164 solves/s on the same chip.  Two candidate causes:
(a) mechanical amortization (per-launch monitor/refresh work, trip
rounding against check_every, dispatch) and (b) sampling — the marginal
images of a bigger random batch may simply be easier (fewer iterations).

This script separates them: it solves the SAME 64-image ladder medium,
then the same images replicated 4x to batch 256 (identical per-image work
by construction), printing wall, sum(iters), and ns/image-iteration.  A
replication gain is purely mechanical; any remainder in the random-256
number is sampling.

Usage: python benchmarks/bench_batch_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(coeffs, spec, x0, label):
    import jax

    from bench import TOL
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    kw = dict(tol=TOL, max_iter=3_000, check_every=20, criterion="residual",
              min_size=8, coarse_iters=8, nu1=2, nu2=2, over=1.8,
              mg_omega=(1.281, 0.5584))
    batch = x0.shape[0]
    t0 = time.perf_counter()
    res = jax.block_until_ready(solve_mgcg_batched(coeffs, spec, x0, **kw))
    np.asarray(res.deff)
    warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_mgcg_batched(coeffs, spec, x0, **kw)
        np.asarray(res.deff)
        times.append(time.perf_counter() - t0)
    best = min(times)
    iters = np.asarray(res.iters)
    print(f"{label:18s} {batch / best:7.1f} solves/s  best={best:.3f}s  "
          f"iters {iters.min()}..{iters.max()} sum={iters.sum()}  "
          f"{best / iters.sum() * 1e6:.1f} us/image-iter  (warm {warm:.0f}s)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import SIZE, build_problem

    coeffs64, spec64, x064 = build_problem(64, SIZE, jnp.float32)
    run(coeffs64, spec64, x064, "batch 64 (ladder)")

    tile = lambda a: jnp.concatenate([a] * 4, axis=0)
    coeffs256 = jax.tree.map(tile, coeffs64)
    spec256 = jax.tree.map(
        lambda a: tile(a) if a.ndim else a, spec64)
    run(coeffs256, spec256, tile(x064), "batch 256 (64 x4)")

    coeffs, spec, x0 = build_problem(256, SIZE, jnp.float32)
    run(coeffs, spec, x0, "batch 256 (random)")


if __name__ == "__main__":
    main()

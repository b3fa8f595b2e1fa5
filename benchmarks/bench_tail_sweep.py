"""Compute-tail sweep for the fused whole-CG-iteration engine (512^2 bench
site).  Times solve_mgcg_batched under varying check cadence / hierarchy
depth / coarse-solve budget on the real chip; one process per matmul
precision (DEFF_MM_PREC is read at kernel-trace time).

Usage:  python benchmarks/bench_tail_sweep.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import BATCH, SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    print(f"device: {jax.devices()[0]}  DEFF_MM_PREC={os.environ.get('DEFF_MM_PREC', '(default)')}",
          file=sys.stderr)
    coeffs, spec, x0 = build_problem(BATCH, SIZE, jnp.float32)

    base = dict(tol=TOL, max_iter=3_000, criterion="residual",
                nu1=2, nu2=2, over=1.8)
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    grid = [
        dict(check_every=20, min_size=8, coarse_iters=8),     # round-3 best
        dict(check_every=20, min_size=8, coarse_iters=4),
        dict(check_every=20, min_size=8, coarse_iters=8, nu1=3, nu2=3),
    ]
    if not quick:
        grid += [
            dict(check_every=20, min_size=16, coarse_iters=8),
            dict(check_every=20, min_size=8, coarse_iters=8, over=1.7),
            dict(check_every=20, min_size=8, coarse_iters=8, over=1.9),
        ]

    for kw in grid:
        full = dict(base, **kw)
        res = jax.block_until_ready(solve_mgcg_batched(coeffs, spec, x0, **full))
        np.asarray(res.deff)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_mgcg_batched(coeffs, spec, x0, **full)
            np.asarray(res.deff)
            times.append(time.perf_counter() - t0)
        it = np.asarray(res.iters)
        conv = np.asarray(res.conv)
        print(f"{kw}  best={min(times):.4f}s  ({BATCH / min(times):.1f} solves/s)"
              f"  iters={it.min()}..{it.max()}  resid_max={conv.max():.2e}")


if __name__ == "__main__":
    main()

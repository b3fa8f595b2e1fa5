"""Chebyshev smoothing-schedule experiment on the bench medium.

Iteration counts are engine-independent (the fused kernels replicate the
XLA engine's algorithm exactly), so this sweeps omega SCHEDULES through
the XLA MGCG engine on a small batch of the headline medium and compares
total/max iteration counts.  A schedule with the same nu costs exactly
the same per iteration in the fused kernels — iteration count is the
whole story.

Schedules: roots-of-Chebyshev weights for nu sweeps over the D^-1 A
interval [lam_max/alpha, lam_max] (lam_max ~= 2 for the 5-point
Jacobi-normalized operator):  omega_j = 1 / (theta - rho cos(pi (2j-1)
/ (2 nu))), theta = lam_max (1 + 1/alpha) / 2, rho = lam_max (1 - 1/alpha) / 2.

Measured (512^2 contrast-1e6, fp32, check_every=20): a=3.5 V(2,2) cuts
iteration sums ~5% on every seed tried; a=3 is UNSTABLE in fp32 blind
windows on the fused engine (omega_1 = 1.16 amplified recurrence drift:
one image 30 -> 118 iterations, tolerance missed) — keep omega_1 <~ 1.3.

Usage: python benchmarks/bench_cheby.py [batch]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cheby(nu, alpha, lam_max=2.0):
    theta = lam_max * (1 + 1 / alpha) / 2
    rho = lam_max * (1 - 1 / alpha) / 2
    return tuple(
        round(1.0 / (theta - rho * math.cos(math.pi * (2 * j - 1) / (2 * nu))), 4)
        for j in range(1, nu + 1))


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from bench import SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    coeffs, spec, x0 = build_problem(batch, SIZE, jnp.float32)
    base = dict(tol=TOL, max_iter=3_000, check_every=20, criterion="residual",
                min_size=8, coarse_iters=8, over=1.8, use_pallas=False)

    cases = [("fixed 0.8 V(2,2)", 2, 0.8)]
    for a in (2.0, 3.0, 4.0, 6.0):
        cases.append((f"cheby a={a} V(2,2)", 2, cheby(2, a)))
    cases.append(("fixed 0.8 V(3,3)", 3, 0.8))
    for a in (3.0, 6.0):
        cases.append((f"cheby a={a} V(3,3)", 3, cheby(3, a)))

    for label, nu, om in cases:
        t0 = time.perf_counter()
        res = solve_mgcg_batched(coeffs, spec, x0, nu1=nu, nu2=nu,
                                 mg_omega=om, **base)
        iters = np.asarray(res.iters)
        conv = np.asarray(res.conv)
        dt = time.perf_counter() - t0
        print(f"{label:22s} om={om!s:28s} iters {iters.min():3d}..{iters.max():3d} "
              f"sum={iters.sum():5d}  conv_max={conv.max():.2e}  [{dt:.0f}s]")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)

"""Deeper Chebyshev-schedule sweep: degree 2/3/4 smoothing polynomials.

Stage 1 (``iters``): iteration counts per schedule on the XLA MGCG engine
(engine-independent — the fused kernels replicate the algorithm exactly),
batch 16 of the headline medium.  Per-iteration fused cost scales ~linearly
with nu (sweeps dominate the in-VMEM iteration), so a schedule earns its
keep when iters_sum * (cost model) beats the incumbent a=3.5 V(2,2).

Stage 2 (``fused``): wall-clock the shortlist on the PRODUCTION fused
engine at the full bench batch — fp32 blind-window stability differs from
the XLA engine (the a=3 V(2,2) instability of benchmarks/bench_cheby.py
only shows there), so no schedule ships on stage-1 numbers alone.

Usage: python benchmarks/bench_cheby_deep.py iters|fused [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_cheby import cheby


def stage_iters(batch):
    import jax.numpy as jnp

    from bench import SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    coeffs, spec, x0 = build_problem(batch, SIZE, jnp.float32)
    base = dict(tol=TOL, max_iter=3_000, check_every=20, criterion="residual",
                min_size=8, coarse_iters=8, over=1.8, use_pallas=False)

    cases = [("cheby a=3.5 V(2,2) [ship]", 2, cheby(2, 3.5))]
    for a in (4.0, 5.0):
        cases.append((f"cheby a={a} V(2,2)", 2, cheby(2, a)))
    for a in (4.0, 6.0, 9.0):
        cases.append((f"cheby a={a} V(3,3)", 3, cheby(3, a)))
    for a in (6.0, 9.0, 12.0):
        cases.append((f"cheby a={a} V(4,4)", 4, cheby(4, a)))

    for label, nu, om in cases:
        t0 = time.perf_counter()
        res = solve_mgcg_batched(coeffs, spec, x0, nu1=nu, nu2=nu,
                                 mg_omega=om, **base)
        iters = np.asarray(res.iters)
        conv = np.asarray(res.conv)
        dt = time.perf_counter() - t0
        # crude fused-cost model: iteration ~ (transfers+algebra ~= 2
        # sweep-equivalents) + 2*nu sweeps
        cost = iters.sum() * (2 + 2 * nu)
        print(f"{label:26s} om={om!s:34s} iters {iters.min():3d}.."
              f"{iters.max():3d} sum={iters.sum():5d} cost~{cost:6d} "
              f"conv_max={conv.max():.2e}  [{dt:.0f}s]", flush=True)


def stage_fused(batch):
    import jax
    import jax.numpy as jnp

    from bench import SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    coeffs, spec, x0 = build_problem(batch, SIZE, jnp.float32)
    base = dict(tol=TOL, max_iter=3_000, check_every=20, criterion="residual",
                min_size=8, coarse_iters=8, over=1.8)

    cases = [
        ("cheby a=3.5 V(2,2) [ship]", 2, cheby(2, 3.5)),
        ("cheby a=6 V(3,3)", 3, cheby(3, 6.0)),
        ("cheby a=9 V(4,4)", 4, cheby(4, 9.0)),
    ]
    for label, nu, om in cases:
        kw = dict(base, nu1=nu, nu2=nu, mg_omega=om)
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
        iters = np.asarray(res.iters)
        conv = np.asarray(res.conv)
        best = min(times)
        print(f"{label:26s} {batch / best:7.1f} solves/s  best={best:.3f}s "
              f"iters {iters.min():3d}..{iters.max():3d} sum={iters.sum():5d} "
              f"conv_max={conv.max():.2e} (warm {warm:.0f}s)", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "iters"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if stage == "iters" else 64)
    (stage_iters if stage == "iters" else stage_fused)(batch)

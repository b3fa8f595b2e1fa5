"""Round-5 check-cadence re-sweep for the fused 2D engine (512^2 bench
site).  The in-kernel refresh (cgstep_vmem refresh=True) moved the
per-check true-residual restart from ~16 ms of XLA batch ops to ~0.7
in-VMEM iteration-equivalents, and first_window removed the opening
1-iteration launch — both shrink the per-check fixed cost, so the
round-3 optimum check_every=20 may have moved.  Sweeps check_every with
first_window=check_every at the shipped bench config; optionally batch
512 (the round-4 knee measurement predates both changes).

Usage:  python benchmarks/bench_cadence5.py [big]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(solve, coeffs, spec, x0, batch, **kw):
    import jax

    res = jax.block_until_ready(solve(coeffs, spec, x0, **kw))
    np.asarray(res.deff)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve(coeffs, spec, x0, **kw)
        np.asarray(res.deff)
        times.append(time.perf_counter() - t0)
    it = np.asarray(res.iters)
    conv = np.asarray(res.conv)
    print(f"{kw.get('check_every')}/{kw.get('first_window')} batch={batch}"
          f"  best={min(times):.4f}s  ({batch / min(times):.1f} solves/s)"
          f"  iters={it.min()}..{it.max()}  resid_max={conv.max():.2e}",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import BATCH, SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg_batched

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    coeffs, spec, x0 = build_problem(BATCH, SIZE, jnp.float32)

    base = dict(tol=TOL, max_iter=3_000, criterion="residual", min_size=8,
                coarse_iters=8, nu1=2, nu2=2, over=1.8,
                mg_omega=(1.281, 0.5584))

    for ce in (10, 15, 20, 30, 40):
        run(solve_mgcg_batched, coeffs, spec, x0, BATCH,
            check_every=ce, first_window=ce, **base)

    if len(sys.argv) > 1 and sys.argv[1] == "big":
        # probe the knee around the default: half-batch, plus double-batch
        # only while it fits HBM (batch 1024 x 512^2 exhausts it — bench.py)
        for bsz in [BATCH // 2] + ([2 * BATCH] if 2 * BATCH <= 512 else []):
            coeffs2, spec2, x02 = build_problem(bsz, SIZE, jnp.float32)
            run(solve_mgcg_batched, coeffs2, spec2, x02, bsz,
                check_every=20, first_window=20, **base)


if __name__ == "__main__":
    main()

"""FMG (nested-iteration) initial guess vs the linear-ramp x0.

Hypothesis: starting MGCG from a full-multigrid pass — approximately solve
the Galerkin-coarsened system at the coarsest level, then prolong and apply
one V-cycle correction per level on the way up — lands a much smaller
initial residual than the linear ramp, cutting CG iterations on the hard
images that set the batch's wall clock.  The hierarchy already coarsens b
(multigrid.coarsen computes b_c = restrict(b)), so the whole pass reuses
existing pieces and costs ~1.3 fine-V-cycle equivalents.

Counter-hypothesis: aggregation coarse operators are over-stiff (the reason
over=1.8 exists), so the coarse solutions undershoot and FMG may not beat
the ramp (which is EXACT for a uniform medium).

Stage "iters": iteration counts ramp vs FMG on the XLA engine (batch 16).
Stage "fused": wall clock on the production fused engine (batch 256).

Usage: python benchmarks/bench_fmg_x0.py [iters|fused] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fmg_x0(levels, *, nu=2, omega=(1.281, 0.5584), coarse_iters=8,
           over=1.8, cycles_per_level=1):
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.solvers.multigrid import (_smooth,
                                                               prolong,
                                                               v_cycle)
    from effectivediffusivityfvm_tpu.ops.kernels.vcycle_vmem import (
        smoothing_schedule)

    om = smoothing_schedule(omega, nu)
    c = levels[-1]
    x = jnp.zeros_like(c.b)
    for _ in range(coarse_iters):
        x = _smooth(c, x, c.b, om[-1])
    for lev in range(len(levels) - 2, -1, -1):
        c = levels[lev]
        shp = c.diag.shape
        x = prolong(x)[..., :shp[-2], :shp[-1]]
        for _ in range(cycles_per_level):
            r = c.b - (c.diag * x - fvm.neighbor_sum(c, x))
            x = x + v_cycle(levels[lev:], r, nu1=nu, nu2=nu, omega=omega,
                            coarse_iters=coarse_iters, over=over)
    return x


def _report(label, res, dt=None):
    it = np.asarray(res.iters)
    cv = np.asarray(res.conv)
    extra = f"  [{dt:.3f}s]" if dt is not None else ""
    print(f"{label:22s} iters {it.min():3d}..{it.max():3d} sum={it.sum():5d}"
          f" conv_max={cv.max():.2e}{extra}", flush=True)
    return it


def main(stage, batch):
    import jax
    import jax.numpy as jnp

    from bench import SIZE, TOL, build_problem
    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.solvers.multigrid import (
        build_hierarchy, solve_mgcg_batched)

    coeffs, spec, x0 = build_problem(batch, SIZE, jnp.float32)
    kw = dict(tol=TOL, max_iter=3_000, check_every=20, criterion="residual",
              min_size=8, coarse_iters=8, nu1=2, nu2=2, over=1.8,
              mg_omega=(1.281, 0.5584))
    if stage == "iters":
        kw["use_pallas"] = False

    build_fmg = jax.jit(lambda c: fmg_x0(build_hierarchy(c, min_size=8)))
    x0_fmg = jax.block_until_ready(build_fmg(coeffs))
    np.asarray(x0_fmg[0, 0, 0])

    # initial residual comparison
    r_ramp = np.asarray(jax.vmap(fvm.residual)(coeffs, x0))
    r_fmg = np.asarray(jax.vmap(fvm.residual)(coeffs, x0_fmg))
    print(f"initial mean|r|: ramp {r_ramp.min():.2e}..{r_ramp.max():.2e}  "
          f"fmg {r_fmg.min():.2e}..{r_fmg.max():.2e}", flush=True)

    for label, x_init in [("ramp x0", x0), ("fmg x0", x0_fmg)]:
        t0 = time.perf_counter()
        res = jax.block_until_ready(
            solve_mgcg_batched(coeffs, spec, x_init, **kw))
        np.asarray(res.deff)
        warm = time.perf_counter() - t0
        if stage == "fused":
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                if label.startswith("fmg"):
                    x_init2 = build_fmg(coeffs)
                else:
                    x_init2 = x_init
                res = solve_mgcg_batched(coeffs, spec, x_init2, **kw)
                np.asarray(res.deff)
                times.append(time.perf_counter() - t0)
            _report(label, res, min(times))
            print(f"  -> {batch / min(times):7.1f} solves/s (incl. x0 build)",
                  flush=True)
        else:
            _report(label, res, warm)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "iters"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if stage == "iters" else 256)
    main(stage, batch)

"""Large-grid (>VMEM) MGCG engine comparison on the real chip.

Measures the BASELINE config-3 scale (2048^2 fp32, contrast 1e6) through
the three large-grid paths:

  tiled       banded whole-CG-iteration engine (ops/kernels/cgstep_tiled.py)
  tiledcycle  row-tiled streaming V-cycle as preconditioner, XLA CG algebra
  xla         pure-XLA V-cycle + CG algebra

Same schedule for all three (V(2,2), coarse_iters=64, check_every=10,
relresidual 1e-4 — the measured fp32 floor on this medium), so the wall
clocks are directly comparable per-iteration numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         python benchmarks/bench_tiled_engine.py [n] [engine,engine,...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.bench_configs import _correlated_binary  # noqa: E402


def main(n=2048, engines=("tiled", "tiledcycle", "xla")):
    import jax
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm
    from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
    from effectivediffusivityfvm_tpu.solvers.multigrid import solve_mgcg

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(3)
    img = _correlated_binary(rng, n, porosity=0.65, sigma=8.0)
    d = jnp.asarray(np.where(img == 0, 1.0, 1e-6), jnp.float32)
    coeffs = fvm.fvm_coefficients(d, 0.0, 1.0)
    spec = make_flux_spec(d, 0.0, 1.0)
    x0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32) / n, (n, n))
    kw = dict(tol=1e-4, max_iter=400, check_every=10,
              criterion="relresidual", min_size=32, coarse_iters=64,
              nu1=2, nu2=2, over=1.8)

    table = {"tiled": "tiled", "tiledcycle": "tiledcycle", "xla": False}
    for name in engines:
        up = table[name]
        # force scalars only (deff/conv/iters): materializing the full x
        # plane costs ~350 ms of D2H through the axon tunnel (measured,
        # bench_tiled_kernel_micro.py) and is not part of the solve
        t0 = time.perf_counter()
        res = solve_mgcg(coeffs, spec, x0, use_pallas=up, **kw)
        np.asarray((res.deff, res.conv, res.iters))
        warm = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            res = solve_mgcg(coeffs, spec, x0, use_pallas=up, **kw)
            np.asarray((res.deff, res.conv, res.iters))
            best = min(best, time.perf_counter() - t0)
        it = int(res.iters)
        print(f"{name:>10}: {best:.3f}s ({1e3 * best / max(it, 1):.2f} ms/it,"
              f" {it} iters, relres={float(res.conv):.2e},"
              f" deff={float(res.deff):.5f}, warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    n_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    eng = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else (
        "tiled", "tiledcycle", "xla")
    main(n_arg, eng)

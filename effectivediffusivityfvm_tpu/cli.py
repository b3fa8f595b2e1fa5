"""Command-line entry point, input.txt-compatible.

Reference: ``main`` (Deff2D.cu:3-54) reads a hardcoded ``input.txt`` and
dispatches on nPhase x BatchFlag.  Here the file path is an optional argv
(defaulting to ``input.txt`` for parity) and the same four pipelines are
dispatched.

Usage:
    python -m effectivediffusivityfvm_tpu.cli [input.txt]
"""

from __future__ import annotations

import sys

from .config import format_options, parse_input_file
from .pipeline.batch import batch_sim, batch_sim_3phase
from .pipeline.single import single_sim, single_sim_3phase


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "input.txt"
    try:
        cfg = parse_input_file(path)
    except FileNotFoundError:
        print(f"Error: input file '{path}' not found.")
        return 1
    except ValueError as e:
        print(f"Error: invalid input file: {e}")
        return 1
    if cfg.verbose:
        print(format_options(cfg))

    if cfg.dtype == "float64":
        # Dtype: float64 needs x64 enabled before any array is created, or
        # JAX silently downcasts every field to f32 (and the f64 solvers
        # cgir/dmg refuse to run).
        import jax

        jax.config.update("jax_enable_x64", True)

    try:
        return _dispatch(cfg)
    except FileNotFoundError as e:
        print(f"Error: could not read image: {e}")
        return 1
    except ValueError as e:
        print(f"Error: {e}")
        return 1


def _dispatch(cfg) -> int:
    if cfg.input_name.endswith((".npy", ".npz")) and not cfg.batch_flag:
        # 3D voxel volume path (no reference equivalent; BASELINE config 5)
        import numpy as np

        from .pipeline.volume import volume_sim, volume_sim_3phase

        vol = np.load(cfg.input_name)
        if hasattr(vol, "files"):
            vol = vol[vol.files[0]]
        if cfg.n_phase == 2:
            volume_sim(cfg, vol, write_output=True)
        else:
            volume_sim_3phase(cfg, vol, write_output=True)
        return 0
    if cfg.batch_flag:
        import os

        if os.path.exists(os.path.join(cfg.image_dir, "00000.npy")):
            # 3D voxel batch (%05d.npy in ImageDir)
            import numpy as np

            from .pipeline.volume import volume_batch_sim, volume_batch_sim_3phase

            vols = [np.load(os.path.join(cfg.image_dir, f"{i:05d}.npy"))
                    for i in range(cfg.num_images)]
            (volume_batch_sim if cfg.n_phase == 2 else volume_batch_sim_3phase)(cfg, vols)
            return 0
    if cfg.n_phase == 2:
        if not cfg.batch_flag:
            single_sim(cfg)
        else:
            batch_sim(cfg)
    elif cfg.n_phase == 3:
        if not cfg.batch_flag:
            single_sim_3phase(cfg)
        else:
            batch_sim_3phase(cfg)
    else:
        print("Current option entered for Phases is not supported.\n Exiting now.")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

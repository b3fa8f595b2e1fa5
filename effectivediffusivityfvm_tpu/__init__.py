"""effectivediffusivityfvm_tpu — TPU-native effective-diffusivity FVM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
adama-wzr/EffectiveDiffusivityFVM (a single-GPU CUDA code): grayscale
microstructure images become per-pixel diffusivity fields, the steady-state
diffusion equation is discretized matrix-free with a 5-point FVM scheme using
harmonic-mean interface coefficients, iterative solvers (weighted Jacobi,
red-black SOR, Jacobi-preconditioned CG; fused Pallas kernels) run entirely
on-device, and Deff is extracted by an on-device boundary-flux reduction.
Supports 2-/3-phase media, percolation screening, diffusivity-contrast
homotopy, vmapped batch (ML datagen) mode, and spatial sharding with ICI halo
exchange for large domains.

See SURVEY.md for the structural analysis of the reference this build follows.
"""

from .config import SimulationConfig, parse_input_file
from .ops.fvm import StencilCoeffs, fvm_coefficients, jacobi_sweep, residual
from .ops.flux import boundary_deff, make_flux_spec
from .solvers.jacobi import SolveResult, solve_jacobi, solve_jacobi_batched
from .pipeline.single import single_sim, single_sim_3phase
from .pipeline.batch import batch_sim, batch_sim_3phase

__version__ = "0.1.0"

__all__ = [
    "SimulationConfig",
    "parse_input_file",
    "StencilCoeffs",
    "fvm_coefficients",
    "jacobi_sweep",
    "residual",
    "boundary_deff",
    "make_flux_spec",
    "SolveResult",
    "solve_jacobi",
    "solve_jacobi_batched",
    "single_sim",
    "single_sim_3phase",
    "batch_sim",
    "batch_sim_3phase",
    "__version__",
]

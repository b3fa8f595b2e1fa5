"""Fused multi-sweep Jacobi Pallas kernel (VMEM-resident).

The plain XLA sweep reads the coefficient planes + x from HBM and writes x
back every sweep.  For images that fit in VMEM this kernel keeps EVERYTHING
on-chip and runs k sweeps per HBM round trip: traffic drops from
~6 planes x k sweeps to ~6 planes per chunk — a ~k x bandwidth
amortization, which is the whole game for a bandwidth-bound stencil
(pallas_guide.md: HBM -> VMEM -> compute).

VMEM budget: the symmetric stencil stores only the west/north face
conductances; the east/south terms are rolls of the products:

  east  term of cell (i,j) = a_w[i,j+1] * x[i,j+1] = roll_east(a_w * x)
  south term of cell (i,j) = a_n[i+1,j] * x[i+1,j] = roll_south(a_n * x)

so the kernel needs just 5 input planes (a_w, a_n, diag_inv, b, x) + the
output — ~6.3 MB at 512x512 fp32, comfortably inside the 16 MB core limit
(the naive 7-plane version OOMs at 17.8 MB).

Wrap-around values from ``pltpu.roll`` are always multiplied by the zero
boundary conductances the assembly places on domain edges (ops/fvm.py), so
no masking is needed.

Grid = batch: one program per image.  The sweep count ``k`` arrives as a
scalar-prefetch argument so the chunked convergence driver can pass a traced
value (reference check cadence, Deff2D.cuh:1243).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fvm import StencilCoeffs
from .vcycle_vmem import x32_kernel

__all__ = ["jacobi_sweeps_pallas", "jacobi_fits_vmem"]


def jacobi_fits_vmem(ny: int, nx: int, itemsize: int = 4) -> bool:
    """Size guard: 5 double-buffered input planes + 2 output buffers + ~3
    planes of roll temporaries must fit the ~128 MB physical VMEM (the 16 MB
    scoped default is raised below).  Callers fall back to the XLA sweep
    beyond this (solvers/jacobi_pallas.py)."""
    return 15 * ny * nx * itemsize < 100 * 1024 * 1024


def _kernel(k_ref, aw, an, dinv, b, x_in, x_out, *, omega):
    x = x_in[0]
    ny, nx = x.shape
    aw0, an0, dinv0, b0 = aw[0], an[0], dinv[0], b[0]

    def body(_, xc):
        # pltpu.roll needs non-negative shifts; roll by size-1 == roll by -1
        xw = pltpu.roll(xc, 1, axis=1)            # west neighbor value
        xn = pltpu.roll(xc, 1, axis=0)            # north (i-1) neighbor
        east = pltpu.roll(aw0 * xc, nx - 1, axis=1)
        south = pltpu.roll(an0 * xc, ny - 1, axis=0)
        num = b0 + aw0 * xw + east + an0 * xn + south
        return (1.0 - omega) * xc + omega * num * dinv0

    x = jax.lax.fori_loop(0, k_ref[0], body, x)
    x_out[0] = x


@functools.partial(jax.jit, static_argnames=("omega", "interpret"))
@x32_kernel
def jacobi_sweeps_pallas(coeffs: StencilCoeffs, x: jax.Array, k: jax.Array,
                         *, omega: float = 2.0 / 3.0,
                         interpret: bool = False) -> jax.Array:
    """Run ``k`` damped-Jacobi sweeps on a (B, ny, nx) batch, fused in VMEM.

    ``k`` may be a traced int32 scalar.  Single images: pass (1, ny, nx).
    """
    bsz, ny, nx = x.shape
    # index_map receives (grid index, scalar-prefetch ref) under
    # PrefetchScalarGridSpec
    img_spec = pl.BlockSpec((1, ny, nx), lambda b, k: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[img_spec] * 5,
        out_specs=img_spec,
    )
    kernel = functools.partial(_kernel, omega=omega)
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(15 * ny * nx * 4 + (1 << 20), 100 << 20))}
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(jnp.asarray(k, jnp.int32).reshape(1),
      coeffs.a_w, coeffs.a_n, coeffs.diag_inv, coeffs.b, x)

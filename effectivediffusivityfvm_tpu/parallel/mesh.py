"""Device-mesh construction helpers.

The reference is a single-process, single-GPU code (``cudaSetDevice(0)``,
Deff2D.cuh:908; no NCCL/MPI anywhere — SURVEY.md §2.6).  The TPU-native scale
axes are:

  * ``dp`` (data parallel): the image batch of the ML-datagen mode, sharded
    across devices — the primary throughput axis;
  * ``sp`` (spatial): large domains sharded by rows with 1-cell halo exchange
    over ICI per sweep (the stencil-code analog of sequence/context
    parallelism — the same neighbor-ring ``ppermute`` pattern as ring
    attention).

All collectives are XLA-level (``psum``/``ppermute``); there is no custom
transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "Mesh", "NamedSharding"]


def make_mesh(
    n_devices: Optional[int] = None,
    dp: int = 1,
    sp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, sp)`` mesh over the available devices.

    ``sp`` defaults to ``n_devices // dp`` (all remaining devices go to the
    spatial axis).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if sp is None:
        if n_devices % dp:
            raise ValueError(f"dp={dp} does not divide n_devices={n_devices}")
        sp = n_devices // dp
    if dp * sp != n_devices:
        raise ValueError(f"dp*sp={dp*sp} != n_devices={n_devices}")
    return Mesh(devices.reshape(dp, sp), axis_names=("dp", "sp"))

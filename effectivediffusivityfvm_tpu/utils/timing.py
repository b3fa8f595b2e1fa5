"""Wall-clock timing of device work.

TPU-native equivalent of the reference's ``cudaEvent_t`` pair around the solve
loop (Deff2D.cuh:1226-1230, 1294-1298): JAX dispatch is async, so a timed
region must end with ``jax.block_until_ready`` on its outputs.  Feeds the
``Time`` CSV column (seconds; the reference stores milliseconds and divides by
1000 at write time, Deff2D.cuh:184).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax

__all__ = ["device_timer", "time_fn"]


class _Timer:
    elapsed_s: float = 0.0


@contextmanager
def device_timer():
    """``with device_timer() as t: ... ; t.elapsed_s`` — caller must make the
    last statement inside the block a ``block_until_ready`` (or use
    :func:`time_fn`)."""
    t = _Timer()
    start = time.perf_counter()
    try:
        yield t
    finally:
        t.elapsed_s = time.perf_counter() - start


def time_fn(fn, *args, **kwargs):
    """Run ``fn``, block on its outputs, return ``(result, seconds)``."""
    start = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    return out, time.perf_counter() - start

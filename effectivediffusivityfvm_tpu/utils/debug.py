"""Debug-mode checks (aux subsystem, SURVEY.md §5 'race detection' row).

JAX's functional model makes the reference's class of races impossible by
construction (its Jacobi kernel is race-free only because it ping-pongs
buffers; here buffers are values).  What CAN go wrong on TPU is numerical:
NaN/Inf escaping a solve, or donated buffers being reused.  This module
provides:

  * :func:`check_finite` — assert a pytree of arrays is finite (host-side,
    for tests and debug runs);
  * :func:`nan_guard` — wrap a solver so non-finite outputs raise with a
    labeled message;
  * :func:`debug_context` — enables ``jax_debug_nans``/``jax_debug_infs``
    within a scope (the JAX-native sanitizer).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

__all__ = ["check_finite", "nan_guard", "debug_context"]


def check_finite(tree, label: str = "") -> None:
    leaves = jax.tree.leaves(tree)
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            bad = np.count_nonzero(~np.isfinite(a))
            raise FloatingPointError(
                f"non-finite values in {label or 'tree'} leaf {i}: "
                f"{bad}/{a.size} elements")


def nan_guard(solve_fn, label: str = "solve"):
    def wrapped(*args, **kwargs):
        res = solve_fn(*args, **kwargs)
        check_finite(res, label)
        return res
    return wrapped


@contextlib.contextmanager
def debug_context(nans: bool = True, infs: bool = True):
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)

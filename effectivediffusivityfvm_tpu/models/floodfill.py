"""Connectivity analysis: percolation screening and non-participating pores.

Re-designs the reference's BFS ``FloodFill`` (Deff2D.cuh:557-713, a
``std::set``-frontier CPU BFS) as a label-based union-find pass:

  * 4-connected components of the non-solid space (``scipy.ndimage.label``),
  * periodic wrap in Y merged by union-find over the labels touching the top
    and bottom rows (reference: periodic north/south neighbors,
    Deff2D.cuh:640-671; non-periodic in X),
  * participating = connected to the left OR right boundary column (the
    reference seeds both boundary columns, Deff2D.cuh:593-605),
  * ``path_flag`` = some component touches BOTH boundary columns, i.e. true
    left<->right percolation.

This implements the *documented intent*.  The reference line
``if(Domain[indexR == -1])`` (Deff2D.cuh:601) is a known bug — the comparison
sits inside the index, so right-boundary seeding actually tests ``Domain[0]``
— and is deliberately not replicated (SURVEY.md §7 'reference quirks').
With intent seeding the reference's own PathFlag would degenerate to "any
fluid on the right column"; true percolation is the only self-consistent
reading and matches the PDF's description of the screening step.

This is O(N) host preprocessing off the hot path; an on-device min-label
propagation variant for fully-fused batched pipelines lives in
:func:`participating_mask_device`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["FloodFillResult", "flood_fill", "participating_mask_device"]


class FloodFillResult(NamedTuple):
    participating: np.ndarray  # bool (ny, nx): non-solid AND boundary-connected
    isolated: np.ndarray       # bool (ny, nx): non-solid but unreachable (Grid==2)
    path_flag: bool            # left<->right percolation exists


def _label_periodic_y(fluid: np.ndarray) -> np.ndarray:
    """4-connected labels of ``fluid`` with periodic wrap in Y.

    Returns an int array where 0 = solid, >0 = component id (canonical).
    """
    from scipy import ndimage

    structure = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=bool)
    labels, num = ndimage.label(fluid, structure=structure)
    if num == 0:
        return labels

    # Union-find over label ids to merge top/bottom periodic neighbors.
    parent = np.arange(num + 1)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    top, bot = labels[0, :], labels[-1, :]
    both = (top > 0) & (bot > 0)
    for a, b in zip(top[both], bot[both]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra

    roots = np.array([find(int(i)) for i in range(num + 1)])
    return roots[labels]


def flood_fill(solid: np.ndarray, use_native: bool = True) -> FloodFillResult:
    """Classify the non-solid space of a single image.

    Args:
      solid: bool (ny, nx); True = impermeable cell (2-phase: pixel > 150,
        Deff2D.cuh:1695; 3-phase: pixel > 200, Deff2D.cuh:1368).
      use_native: try the C++ union-find library first (csrc/preprocess.cpp,
        built lazily; see models/_native.py) — same semantics, linear time,
        GIL-free.  Falls back to the scipy path automatically.
    """
    if use_native:
        from . import _native

        out = _native.flood_fill_native(np.asarray(solid, bool))
        if out is not None:
            part, iso, flag = out
            return FloodFillResult(part, iso, flag)
    fluid = ~np.asarray(solid, bool)
    labels = _label_periodic_y(fluid)

    left = np.unique(labels[:, 0])
    right = np.unique(labels[:, -1])
    left = set(left[left > 0].tolist())
    right = set(right[right > 0].tolist())

    reach = left | right
    if reach:
        participating = np.isin(labels, sorted(reach)) & fluid
    else:
        participating = np.zeros_like(fluid)
    isolated = fluid & ~participating
    path_flag = len(left & right) > 0
    return FloodFillResult(participating, isolated, bool(path_flag))


def participating_mask_device(solid, max_steps: int | None = None):
    """On-device variant: iterative min-index label propagation in JAX.

    Useful when preprocessing must stay fused with a batched device pipeline
    (vmap-able, static shapes).  Semantics match :func:`flood_fill` —
    returns ``(participating, isolated, path_flag)`` with JAX arrays.

    Propagation: each non-solid cell carries a scalar "potential"; boundary
    columns start at 1 for LEFT-connected and 2 for RIGHT-connected flags
    propagated as a 2-bit mask through 4-connected neighbors with periodic Y,
    iterated to fixpoint (grid-diameter bounded).
    """
    import jax
    import jax.numpy as jnp

    solid = jnp.asarray(solid, bool)
    ny, nx = solid.shape[-2], solid.shape[-1]
    fluid = ~solid
    if max_steps is None:
        max_steps = ny * nx  # worst-case serpentine path

    # bit 0: reachable from left column; bit 1: reachable from right column
    init = jnp.zeros(solid.shape, jnp.uint8)
    init = init.at[..., :, 0].set(jnp.where(fluid[..., :, 0], 1, 0).astype(jnp.uint8))
    init = init.at[..., :, -1].add(jnp.where(fluid[..., :, -1], 2, 0).astype(jnp.uint8))

    def spread(m):
        w = jnp.concatenate([jnp.zeros_like(m[..., :, :1]), m[..., :, :-1]], axis=-1)
        e = jnp.concatenate([m[..., :, 1:], jnp.zeros_like(m[..., :, :1])], axis=-1)
        n = jnp.roll(m, 1, axis=-2)   # periodic in Y (Deff2D.cuh:640-671)
        s = jnp.roll(m, -1, axis=-2)
        out = m | w | e | n | s
        return jnp.where(fluid, out, 0).astype(jnp.uint8)

    def cond(c):
        m, prev, it = c
        return (it < max_steps) & jnp.any(m != prev)

    def body(c):
        m, _, it = c
        return (spread(m), m, it + 1)

    m0 = spread(init)
    m, _, _ = jax.lax.while_loop(cond, body, (m0, init, jnp.int32(0)))

    participating = (m > 0) & fluid
    isolated = fluid & ~participating
    path_flag = jnp.any(m == 3)
    return participating, isolated, path_flag

"""Solver-state checkpoint/resume (aux subsystem, SURVEY.md §5).

The reference explicitly lacks this ("if the code is interrupted, all
progress is lost. I am working on a better option", documentation PDF §3.6);
its only state reuse is the warm start across continuation stages
(ConcentrationDist carried between solves, Deff2D.cuh:1793/2008).

Two layers here:
  * batch-level resume — IncrementalBatchWriter (io/writers.py) already
    makes interrupted datagen batches restartable from the last finished
    image;
  * solve-level checkpoints — this module saves/loads the concentration
    field(s) + progress counters as a compressed ``.npz``, so a long 3D
    solve can be resumed by warm-starting from the saved field (all solvers
    accept ``x0``; the framework's warm-start semantics are tested in
    tests/test_solvers.py).  Optionally wraps a solve with periodic
    checkpoint emission by splitting ``max_iter`` into segments.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["save_state", "load_state", "checkpointed_solve",
           "AsyncOrbaxSaver"]


def save_state(path: str, x, iters=0, meta: Optional[Dict[str, Any]] = None,
               backend: str = "npz") -> None:
    """Atomically write a solve checkpoint (field + progress).

    ``backend="npz"`` (default): single compressed file, dependency-free.
    ``backend="orbax"``: an orbax-checkpoint PyTree directory — the
    ecosystem-standard format (works with orbax tooling, sharded arrays,
    and async emission via :class:`AsyncOrbaxSaver`).
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        payload = {"x": np.asarray(x), "iters": np.asarray(iters)}
        if meta:
            payload["meta"] = {k: np.asarray(v) for k, v in meta.items()}
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), payload,
                                      force=True)
        return
    payload = {"x": np.asarray(x), "iters": np.asarray(iters)}
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_state(path: str):
    """Returns (x, iters, meta) or None if no checkpoint exists.  Orbax
    checkpoint directories (save_state(backend="orbax")) are detected by
    being directories."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        z = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        meta = {k: np.asarray(v) for k, v in (z.get("meta") or {}).items()}
        return np.asarray(z["x"]), int(np.asarray(z["iters"])), meta
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        x = z["x"]
        iters = int(z["iters"])
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return x, iters, meta


def checkpointed_solve(solve_fn, coeffs, spec, x0, *, checkpoint_path: str,
                       segment_iters: int, max_iter: int,
                       protocol_carry: bool = False, **solve_kw):
    """Run ``solve_fn`` in segments of ``segment_iters``, checkpointing the
    field after each segment; resumes from an existing checkpoint.

    ``solve_fn`` is any framework solver (same signature family).  Returns
    the final SolveResult with ``iters`` counting all segments (including
    previously checkpointed ones).

    ``protocol_carry=True`` (sweep solvers with ``criterion="deff"`` only)
    threads the reference stopping protocol across segments: the global sweep
    count and the deff/deff_old monitor state are carried (driver.run_single
    docstring), so the segmented run stops at exactly the sweep where one
    continuous reference-protocol run would — this is how a long solve on a
    relay-limited TPU reproduces the CUDA binary's protocol Deff.  Requires
    ``segment_iters >= check_every`` so every segment lands on a check.
    """
    done = 0
    carry = {}
    state = load_state(checkpoint_path)
    if state is not None:
        x_saved, done, meta = state
        import jax.numpy as jnp

        x0 = jnp.asarray(x_saved, dtype=x0.dtype)
        if protocol_carry and "deff" in meta:
            carry = {"deff0": float(meta["deff"]),
                     "deff_old0": float(meta["deff_old"])}
        if meta.get("converged") or (done >= max_iter and "deff" in meta):
            # the checkpoint IS the finished solve; re-running sweeps from a
            # converged field would shift the protocol Deff
            from ..solvers.driver import SolveResult

            return SolveResult(
                x=x0, deff=np.asarray(meta.get("deff", np.nan)),
                conv=np.asarray(meta.get("conv", np.nan)),
                iters=np.asarray(done, np.int32))

    res = None
    while done < max_iter:
        seg = min(segment_iters, max_iter - done)
        kw = dict(solve_kw)
        if protocol_carry:
            kw.update(it0=done, **carry)
        res = solve_fn(coeffs, spec, x0, max_iter=seg, **kw)
        seg_iters = int(np.max(np.asarray(res.iters)))
        total = done + seg_iters
        converged = seg_iters < seg
        # at any check the reference sets deff_old = deff = deff_new
        # (Deff2D.cuh:1263-1275); segments end on checks, so both carry the
        # same value
        d = float(np.max(np.asarray(res.deff)))
        if protocol_carry:
            carry = {"deff0": d, "deff_old0": d}
        meta = {"deff": d, "deff_old": d, "conv": float(np.max(np.asarray(res.conv))),
                "converged": int(converged)}
        save_state(checkpoint_path, res.x, total, meta=meta)
        x0 = res.x
        # converged before exhausting the segment -> stop
        if converged:
            done = total
            break
        done += seg

    if res is not None:
        res = res._replace(iters=np.asarray(done, dtype=np.int32))
    return res


class AsyncOrbaxSaver:
    """Async device-to-host checkpoint emission (aux subsystem).

    Wraps ``orbax.checkpoint.AsyncCheckpointer``: ``save`` returns as soon
    as the device buffers are snapshotted, and serialization to disk
    overlaps the next solve segment.  Use as a context manager so the last
    write is awaited::

        with AsyncOrbaxSaver() as saver:
            for segment in ...:
                res = solve(...)
                saver.save(path, res.x, iters=total, meta=...)
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, path: str, x, iters=0,
             meta: Optional[Dict[str, Any]] = None) -> None:
        payload = {"x": np.asarray(x), "iters": np.asarray(iters)}
        if meta:
            payload["meta"] = {k: np.asarray(v) for k, v in meta.items()}
        self._ckptr.save(os.path.abspath(path), payload, force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self._ckptr.close()

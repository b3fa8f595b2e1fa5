"""Profiling and observability (aux subsystem, SURVEY.md §5 'tracing' row).

The reference's only instrumentation is a cudaEvent wall-time of the solve
loop (Deff2D.cuh:1226-1230).  Here:

  * :func:`trace` wraps a region in a ``jax.profiler`` trace whose output
    can be opened in TensorBoard/XProf — kernel-level timing on TPU;
  * :func:`benchmark_solver` measures steady-state solves/sec and effective
    HBM bandwidth for any solver callable (the BASELINE.json metric);
  * :class:`RunManifest` accumulates per-run metadata (config, timings,
    convergence) and writes a JSON manifest next to the CSV outputs,
    giving batch runs a machine-readable record the reference lacks.

Timing always forces materialization of the results (`np.asarray`) because
some platforms (axon) resolve device futures lazily even through
``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

__all__ = ["trace", "benchmark_solver", "RunManifest"]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/deff-trace"): run()`` -> TensorBoard trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_solver(solve_fn: Callable, *args, repeats: int = 3,
                     bytes_per_iter: Optional[float] = None, **kwargs) -> Dict[str, Any]:
    """Warm up (compile) then time ``solve_fn(*args, **kwargs)``.

    Returns dict with wall seconds (best of ``repeats``), iterations (if the
    result carries ``.iters``), and effective GB/s when ``bytes_per_iter``
    is supplied (per-sweep HBM traffic estimate x iterations / time).
    """
    res = solve_fn(*args, **kwargs)
    np.asarray(res[0] if isinstance(res, tuple) else res.x)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = solve_fn(*args, **kwargs)
        np.asarray(res[0] if isinstance(res, tuple) else res.x)
        times.append(time.perf_counter() - t0)
    best = min(times)
    out: Dict[str, Any] = {"seconds": best, "times": times}
    iters = getattr(res, "iters", None)
    if iters is not None:
        total_iters = int(np.sum(np.asarray(iters)))
        out["iterations"] = total_iters
        if bytes_per_iter:
            out["effective_gbps"] = total_iters * bytes_per_iter / best / 1e9
    return out


@dataclasses.dataclass
class RunManifest:
    """JSON run manifest accumulated alongside CSV outputs."""

    path: str
    meta: Dict[str, Any] = dataclasses.field(default_factory=dict)
    records: list = dataclasses.field(default_factory=list)

    def set_config(self, cfg) -> None:
        self.meta["config"] = {
            k: v for k, v in dataclasses.asdict(cfg).items()
            if isinstance(v, (int, float, str, bool))
        }

    def add(self, **record) -> None:
        self.records.append(record)

    def write(self) -> None:
        with open(self.path, "w") as fh:
            json.dump({"meta": self.meta, "records": self.records}, fh, indent=2)

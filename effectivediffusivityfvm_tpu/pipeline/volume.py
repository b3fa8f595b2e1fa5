"""3D voxel-domain simulation pipeline (the 3D analog of pipeline/single.py).

Input is a ``(nz, ny, nx)`` uint8 voxel volume (e.g. a ``.npy`` micro-CT
stack) with the same grayscale phase conventions as 2D images.  The pipeline
mirrors the 2D orchestration: porosity / phase fractions, 3D flood-fill
screening, diffusivity-field build, DCF continuation (2-phase) or DCG
homotopy (3-phase) with warm starts, and a solve on the 7-point operator —
by default multigrid-PCG, optionally sharded as z-slabs over a device mesh
for volumes beyond one chip's HBM (parallel/halo3d.py).

CSV output reuses the reference schemas with ``nElements`` = voxel count.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig
from ..io import writers
from ..models import phases, volume
from ..ops import fvm3d
from ..solvers import solvers3d
from ..utils.logging import vprint
from ..utils.timing import time_fn
from .single import dcf_stages, dcg_stages

__all__ = ["VolumeResult", "volume_sim", "volume_sim_3phase",
           "volume_batch_sim", "volume_batch_sim_3phase"]


@dataclasses.dataclass
class VolumeResult:
    deff: float
    porosity: float
    path_flag: bool
    time_s: float
    n_elements: int
    conv: float
    iters: int
    x: np.ndarray
    svf: float = 0.0
    lvf: float = 0.0


_SOLVERS = {
    "jacobi": solvers3d.solve_jacobi_3d,
    "rbsor": solvers3d.solve_rbsor_3d,
    "cg": solvers3d.solve_cg_3d,
    "mgcg": solvers3d.solve_mgcg_3d,
}


def _effective_solver_3d(cfg) -> str:
    """3D solver actually used: cgir/dcg/jacobi_pallas have no 3D variant yet
    and substitute mgcg — loudly, and the symmetric-assembly flag follows the
    substitute (advisor round-1 finding: a silent swap ran MGCG on the
    unsymmetrized masked operator).  ``dmg`` has a native 3D implementation
    (solvers/dmg3d.py)."""
    if cfg.solver in _SOLVERS or cfg.solver == "dmg":
        return cfg.solver
    warnings.warn(
        f"solver {cfg.solver!r} has no 3D implementation; using 'mgcg'",
        stacklevel=3)
    return "mgcg"


def _solve3d(cfg, coeffs, spec, x, tol, max_iter, name=None, gas_np=None,
             d_field=None):
    name = name or _effective_solver_3d(cfg)
    if name == "dmg":
        from ..solvers.dmg3d import solve_dmg_3d

        return solve_dmg_3d(coeffs, spec, x, tol=tol, max_iter=max_iter,
                            check_every=cfg.check_every,
                            criterion=cfg.criterion, member=gas_np)
    fn = _SOLVERS[name]
    kw = {}
    if name == "mgcg":
        kw["first_window"] = cfg.first_window
        if d_field is not None:
            kw["d_field"] = d_field
    return fn(coeffs, spec, x, omega=cfg.omega, tol=tol, max_iter=max_iter,
              check_every=cfg.check_every, criterion=cfg.criterion, **kw)


def _linear_init_3d(nz, ny, nx, cl, cr, dtype):
    j = jnp.arange(nx, dtype=dtype)
    return jnp.broadcast_to(j / nx * (cr - cl) + cl, (nz, ny, nx))


def volume_sim(cfg: SimulationConfig, vol: np.ndarray,
               write_output: bool = False) -> VolumeResult:
    """2-phase voxel pipeline with DCF continuation."""
    cfg.validate()
    if vol.ndim != 3:
        raise ValueError("expected a (nz, ny, nx) voxel volume")
    poro = volume.porosity_3d(vol)
    ff = volume.flood_fill_3d(vol > 150)
    classes = volume.amplify_3d(
        phases.two_phase_classes(vol), cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
    nz, ny, nx = classes.shape
    dtype = cfg.np_dtype
    x = _linear_init_3d(nz, ny, nx, cfg.c_left, cfg.c_right, dtype)

    deff = conv = float("nan")
    iters = 0
    time_s = 0.0
    solver3d = _effective_solver_3d(cfg)
    # the 2-phase system is exactly the unmasked fvm_coefficients_3d(d),
    # so mgcg's fused engine can recompute level 0 from D in-kernel
    # (matrix-free; requires strictly positive D — gate on d_solid > 0)
    mf_ok = solver3d == "mgcg" and cfg.d_solid > 0
    for dcf in dcf_stages(cfg.d_fluid):
        d_field = jnp.asarray(
            phases.d_field_from_classes(classes, dcf, cfg.d_solid, dtype=dtype))
        coeffs = fvm3d.fvm_coefficients_3d(d_field, cfg.c_left, cfg.c_right)
        spec = fvm3d.make_flux_spec_3d(d_field, cfg.c_left, cfg.c_right)
        res, dt = time_fn(_solve3d, cfg, coeffs, spec, x, cfg.convergence,
                          cfg.max_iter, solver3d,
                          d_field=d_field if mf_ok else None)
        x = res.x
        deff = float(res.deff) / dcf
        conv = float(res.conv)
        iters = int(res.iters)
        time_s += dt
        vprint(cfg.verbose, f"DCF = {dcf}, Deff {deff} ({iters} iters)")

    result = VolumeResult(deff=deff, porosity=poro, path_flag=ff.path_flag,
                          time_s=time_s, n_elements=classes.size, conv=conv,
                          iters=iters, x=np.asarray(x))
    if write_output:
        writers.write_single(cfg.output_name, cfg.input_name, poro,
                             ff.path_flag, deff, time_s, classes.size, conv,
                             cfg.d_solid, cfg.d_fluid)
    return result


def volume_sim_3phase(cfg: SimulationConfig, vol: np.ndarray,
                      write_output: bool = False) -> VolumeResult:
    """3-phase voxel pipeline: solid/isolated masking + DCG homotopy."""
    cfg.validate()
    if vol.ndim != 3:
        raise ValueError("expected a (nz, ny, nx) voxel volume")
    ff = volume.flood_fill_3d(vol > 200)
    classes = volume.amplify_3d(
        phases.three_phase_classes(vol), cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
    mask_np = volume.amplify_3d((vol > 200) | ff.isolated,
                                cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
    nz, ny, nx = classes.shape
    dtype = cfg.np_dtype
    mask = jnp.asarray(mask_np)
    svf, lvf = phases.phase_fractions(classes)
    x = _linear_init_3d(nz, ny, nx, cfg.c_left, cfg.c_right, dtype)

    solver3d = _effective_solver_3d(cfg)
    symmetric = solver3d in ("cg", "mgcg", "dmg")
    gas_np = ((phases.three_phase_classes(vol) == phases.GAS)
              if solver3d == "dmg" else None)
    if gas_np is not None:
        gas_np = volume.amplify_3d(gas_np, cfg.mesh_amp_z, cfg.mesh_amp_y,
                                   cfg.mesh_amp_x) & ~mask_np

    def build(dcg_val):
        d_field = jnp.asarray(phases.d_field_from_classes(
            classes, cfg.d_fluid, cfg.d_solid, dcg_val, dtype=dtype))
        coeffs = fvm3d.fvm_coefficients_3d(d_field, cfg.c_left, cfg.c_right,
                                           mask=mask, symmetric=symmetric)
        spec = fvm3d.make_flux_spec_3d(d_field, cfg.c_left, cfg.c_right)
        return coeffs, spec

    stage_max_iter = 1_000_000 if cfg.solver in ("jacobi", "rbsor") else cfg.max_iter
    # dmg is κ-robust; skip the homotopy pre-stages (see pipeline/single.py)
    stages = [] if solver3d == "dmg" else dcg_stages(cfg.d_gas)
    for stage_num, dcg_t in enumerate(stages, start=1):
        vprint(cfg.verbose, f"Pre-Cond Stage {stage_num}: DCG = {dcg_t:1.3e}")
        coeffs, spec = build(dcg_t)
        res = _solve3d(cfg, coeffs, spec, x, cfg.convergence * 10,
                       stage_max_iter, solver3d)
        x = res.x

    coeffs, spec = build(cfg.d_gas)
    res, time_s = time_fn(_solve3d, cfg, coeffs, spec, x, cfg.convergence,
                          cfg.max_iter, solver3d, gas_np)
    deff = float(res.deff) / cfg.d_fluid
    result = VolumeResult(deff=deff, porosity=0.0, path_flag=ff.path_flag,
                          time_s=time_s, n_elements=classes.size,
                          conv=float(res.conv), iters=int(res.iters),
                          x=np.asarray(res.x), svf=svf, lvf=lvf)
    if write_output:
        writers.write_single_3phase(cfg.output_name, cfg.input_name, svf, lvf,
                                    ff.path_flag, deff, time_s, classes.size,
                                    float(res.conv), cfg.d_solid, cfg.d_fluid,
                                    cfg.d_gas)
    return result


# ---------------------------------------------------------------------------
# 3D batch mode (framework extension: the reference has no 3D at all; this is
# the voxel analog of pipeline/batch.py for micro-CT dataset generation)
# ---------------------------------------------------------------------------

_BATCHED_SOLVERS = {
    "jacobi": solvers3d.solve_jacobi_3d_batched,
    "rbsor": solvers3d.solve_rbsor_3d_batched,
    "cg": solvers3d.solve_cg_3d_batched,
    "mgcg": solvers3d.solve_mgcg_3d_batched,
}


def _group_by_shape(vols, indices, max_group):
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in indices:
        buckets[vols[i].shape].append(i)
    groups = []
    for _, idxs in sorted(buckets.items()):
        if max_group <= 0:
            groups.append(idxs)
        else:
            groups.extend(idxs[k:k + max_group]
                          for k in range(0, len(idxs), max_group))
    return groups


def _solve3d_batched(cfg, coeffs, spec, x, tol, max_iter, gas_np=None,
                     d_field=None):
    name = _effective_solver_3d(cfg)
    if name == "dmg":
        from ..solvers.dmg3d import solve_dmg_3d_batched

        return solve_dmg_3d_batched(
            coeffs, spec, x, tol=tol, max_iter=max_iter,
            check_every=cfg.check_every, criterion=cfg.criterion,
            members=gas_np)
    fn = _BATCHED_SOLVERS[name]
    kw = {}
    if name == "mgcg":
        kw["first_window"] = cfg.first_window
        if d_field is not None:
            kw["d_field"] = d_field
    return fn(coeffs, spec, x, omega=cfg.omega, tol=tol, max_iter=max_iter,
              check_every=cfg.check_every, criterion=cfg.criterion, **kw)


def volume_batch_sim(cfg: SimulationConfig, vols) -> np.ndarray:
    """2-phase voxel batch: same-shape volumes stack to ``(B, nz, ny, nx)``
    and solve as ONE vmapped device computation per group with per-volume
    convergence freezing; rows use the 2-phase batch schema with
    ``nElements`` = voxel count.  Incremental output/resume as in 2D."""
    import jax

    cfg.validate()
    n = len(vols)
    out = np.zeros((n, 9))
    inc = (writers.IncrementalBatchWriter(cfg.output_name)
           if cfg.incremental_output else None)
    done = inc.completed() if inc else set()
    pending = [i for i in range(n) if i not in done]
    dtype = cfg.np_dtype
    solver3d = _effective_solver_3d(cfg)

    for group in _group_by_shape(vols, pending, cfg.batch_size):
        stack = np.stack([vols[i] for i in group])
        stats = [(volume.porosity_3d(vols[i]),
                  volume.flood_fill_3d(vols[i] > 150).path_flag)
                 for i in group]
        classes = np.stack([
            volume.amplify_3d(phases.two_phase_classes(v),
                              cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
            for v in stack])
        bsz, nz, ny, nx = classes.shape
        d_field = jnp.asarray(phases.d_field_from_classes(
            classes, cfg.d_fluid, cfg.d_solid, dtype=dtype))
        coeffs = jax.vmap(fvm3d.fvm_coefficients_3d, in_axes=(0, None, None))(
            d_field, cfg.c_left, cfg.c_right)
        spec = jax.vmap(fvm3d.make_flux_spec_3d, in_axes=(0, None, None))(
            d_field, cfg.c_left, cfg.c_right)
        x0 = jnp.broadcast_to(
            _linear_init_3d(nz, ny, nx, cfg.c_left, cfg.c_right, dtype),
            (bsz, nz, ny, nx))
        res, dt = time_fn(
            _solve3d_batched, cfg, coeffs, spec, x0, cfg.convergence,
            cfg.max_iter,
            # unmasked 2-phase operator: matrix-free level 0 (see volume_sim)
            d_field=d_field if (solver3d == "mgcg" and cfg.d_solid > 0)
            else None)
        deff = np.asarray(res.deff, np.float64) / cfg.d_fluid
        conv = np.asarray(res.conv)
        iters = np.asarray(res.iters)
        tshare = dt * iters / max(float(iters.sum()), 1.0)
        for k, i in enumerate(group):
            poro, pf = stats[k]
            row = (i, poro, int(pf), float(deff[k]), float(tshare[k]),
                   classes[k].size, float(conv[k]), cfg.d_solid, cfg.d_fluid)
            out[i] = row
            if inc:
                inc.write_row(row)
            vprint(cfg.verbose, f"Volume {i} Deff {float(deff[k])}")
    if not cfg.incremental_output:
        writers.write_batch(cfg.output_name, [tuple(r) for r in out])
    return out


def volume_batch_sim_3phase(cfg: SimulationConfig, vols) -> np.ndarray:
    """3-phase voxel batch with the DCG homotopy shared per group; optional
    per-volume ``CMAP_%05d.csv`` in ``X,Y,Z,C`` layout."""
    import jax

    cfg.validate()
    n = len(vols)
    out = np.zeros((n, 11))
    inc = (writers.IncrementalBatchWriter(cfg.output_name, three_phase=True)
           if cfg.incremental_output else None)
    done = inc.completed() if inc else set()
    pending = [i for i in range(n) if i not in done]
    dtype = cfg.np_dtype
    solver3d = _effective_solver_3d(cfg)
    symmetric = solver3d in ("cg", "mgcg", "dmg")

    for group in _group_by_shape(vols, pending, cfg.batch_size):
        stack = np.stack([vols[i] for i in group])
        flags = [volume.flood_fill_3d(vols[i] > 200).path_flag for i in group]
        classes = np.stack([
            volume.amplify_3d(phases.three_phase_classes(v),
                              cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
            for v in stack])
        mask_np = np.stack([
            volume.amplify_3d((v > 200) | volume.flood_fill_3d(v > 200).isolated,
                              cfg.mesh_amp_z, cfg.mesh_amp_y, cfg.mesh_amp_x)
            for v in stack])
        mask = jnp.asarray(mask_np)
        bsz, nz, ny, nx = classes.shape
        gas_np = None
        if solver3d == "dmg":
            gas_np = np.stack([
                volume.amplify_3d(phases.three_phase_classes(v) == phases.GAS,
                                  cfg.mesh_amp_z, cfg.mesh_amp_y,
                                  cfg.mesh_amp_x)
                for v in stack]) & ~mask_np

        def build(dcg_val):
            d_field = jnp.asarray(phases.d_field_from_classes(
                classes, cfg.d_fluid, cfg.d_solid, dcg_val, dtype=dtype))
            coeffs = jax.vmap(
                fvm3d.fvm_coefficients_3d, in_axes=(0, None, None, 0, None))(
                d_field, cfg.c_left, cfg.c_right, mask, symmetric)
            spec = jax.vmap(fvm3d.make_flux_spec_3d, in_axes=(0, None, None))(
                d_field, cfg.c_left, cfg.c_right)
            return coeffs, spec

        x = jnp.broadcast_to(
            _linear_init_3d(nz, ny, nx, cfg.c_left, cfg.c_right, dtype),
            (bsz, nz, ny, nx))
        stage_max_iter = (1_000_000 if solver3d in ("jacobi", "rbsor")
                          else cfg.max_iter)
        # dmg is κ-robust; skip the homotopy pre-stages (pipeline/single.py)
        stages = [] if solver3d == "dmg" else dcg_stages(cfg.d_gas)
        for stage_num, dcg_t in enumerate(stages, start=1):
            vprint(cfg.verbose, f"Pre-Cond Stage {stage_num}: DCG = {dcg_t:1.3e}")
            coeffs, spec = build(dcg_t)
            res = _solve3d_batched(cfg, coeffs, spec, x, cfg.convergence * 10,
                                   stage_max_iter)
            x = res.x

        coeffs, spec = build(cfg.d_gas)
        res, dt = time_fn(_solve3d_batched, cfg, coeffs, spec, x,
                          cfg.convergence, cfg.max_iter, gas_np)
        deff = np.asarray(res.deff, np.float64) / cfg.d_fluid
        conv = np.asarray(res.conv)
        iters = np.asarray(res.iters)
        xs = np.asarray(res.x)
        tshare = dt * iters / max(float(iters.sum()), 1.0)
        fr = [phases.phase_fractions(c) for c in classes]
        for k, i in enumerate(group):
            row = (i, float(fr[k][0]), float(fr[k][1]), int(flags[k]),
                   float(deff[k]), float(tshare[k]), classes[k].size,
                   float(conv[k]), cfg.d_solid, cfg.d_fluid, cfg.d_gas)
            out[i] = row
            if inc:
                inc.write_row(row)
            if cfg.print_cmap:
                writers.write_cmap_3d(f"CMAP_{i:05d}.csv", xs[k])
    if not cfg.incremental_output:
        writers.write_batch_3phase(cfg.output_name, [tuple(r) for r in out])
    return out

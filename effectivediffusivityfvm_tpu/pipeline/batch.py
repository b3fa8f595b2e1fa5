"""Batch (ML dataset generation) pipelines — the vmapped throughput path.

TPU-native re-design of the reference batch modes:
  * ``BatchSim``       (Deff2D.cuh:1843-2054): 2-phase, single solve per image
    at the requested D_fluid (no DCF continuation), 9 output values per image;
  * ``BatchSim3Phase`` (Deff2D.cuh:2056-2419): 3-phase, DCG homotopy per
    image, 10 values per image, optional per-image ``CMAP_%05d.csv``.

The reference processes images strictly serially and re-allocates all GPU
buffers per image (Deff2D.cuh:1867/1975).  Here images are grouped by shape,
stacked to ``(B, ny, nx)``, and solved in ONE fused device computation per
group — the primary throughput axis on TPU (SURVEY.md §2.6 DP row).
Per-image convergence is preserved exactly: a converged image's field freezes
while the rest keep sweeping (see ``solve_jacobi_batched``).

Checkpoint/resume (aux subsystem, fixes the reference's documented
all-or-nothing limitation, PDF §3.6): with ``cfg.incremental_output`` rows are
flushed per completed group and a rerun resumes after the last finished image.

Host/device pipelining (SURVEY.md §2.6 PP row): group k+1's host
preprocessing (decode/classify/flood-fill/stack — GIL-free in the native
path) runs on a worker thread while the device solves group k
(:func:`_prefetched`).
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig
from ..io import images as img_io
from ..io import writers
from ..models import floodfill, phases
from ..ops import fvm
from ..ops.flux import BoundaryFluxSpec, make_flux_spec
from ..solvers.dispatch import needs_spd, solve_batched
from ..utils.logging import vprint
from ..utils.timing import time_fn
from .single import dcg_stages, _linear_init

__all__ = ["batch_sim", "batch_sim_3phase", "solve_image_group", "solve_image_group_3phase"]


# ---------------------------------------------------------------------------
# Multi-device placement (SURVEY §2.6 DP row; VERDICT r1 item 5)
# ---------------------------------------------------------------------------

def _pipeline_mesh(cfg: SimulationConfig):
    """Resolve the pipeline's ``(dp, sp)`` mesh, or ``None`` for single-device.

    ``cfg.devices`` (input.txt key ``Devices:``) selects how many devices the
    batch pipelines spread over; images within a shape group are sharded along
    the batch axis (dp) and optionally by rows (sp, sweep solvers only).
    """
    if cfg.devices == 1 and cfg.sp == 1 and cfg.dp in (0, 1):
        return None
    n, dp, sp = cfg.resolve_mesh_shape(len(jax.devices()))
    if n == 1:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh(n, dp=dp, sp=sp)


def _pad_batch(tree, mult: int):
    """Edge-pad every leaf's batch axis to a multiple of ``mult`` (padded
    entries are copies of the last image: they solve identically and are
    dropped on the way out)."""
    bsz = jax.tree.leaves(tree)[0].shape[0]
    pad = (-bsz) % mult
    if pad == 0:
        return tree, bsz

    def pad_one(a):
        reps = jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    return jax.tree.map(pad_one, tree), bsz


def _dp_shard(mesh, tree):
    """Place a batch-leading pytree with the batch axis split over ``dp``
    (all other axes replicated); XLA propagates the sharding through the
    whole compiled solve — the idiomatic JAX data-parallel path."""
    from ..parallel.mesh import NamedSharding, P

    def put(a):
        spec = P("dp", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def _pallas_kwargs(cfg):
    """Translate ``cfg.pallas`` / ``cfg.first_window`` into mgcg-only
    kwargs (other solvers don't accept them)."""
    if cfg.solver != "mgcg":
        return {}
    kw = {"first_window": cfg.first_window}
    if cfg.pallas == "off":
        kw["use_pallas"] = False
    elif cfg.pallas == "force":
        kw["use_pallas"] = "cgstep"
    elif cfg.pallas == "interpret":
        kw.update(use_pallas="cgstep", pallas_interpret=True)
    return kw


def _solve_group_dp_shardmap(cfg, mesh, coeffs, spec, x0, tol, max_iter):
    """Pure-dp SPMD group solve: ``shard_map`` over the batch axis.

    ``pallas_call`` does not shard under jit's sharding propagation, so the
    dp path is an explicit ``shard_map``: each device runs the full batched
    solver — fused Pallas MGCG kernels included — on its local batch slice.
    There are no collectives inside (per-image freezing, monitors and
    reductions are all per-image), so each device's ``while_loop`` trip count
    is independent and results are bitwise identical to the single-device
    run of the same slice (tested in tests/test_sharding.py).
    """
    from jax import shard_map

    from ..parallel.mesh import P

    def dp_spec(a):
        return P("dp", *([None] * (jnp.ndim(a) - 1)))

    in_specs = jax.tree.map(dp_spec, (coeffs, spec, x0))
    from ..solvers.driver import SolveResult

    out_specs = SolveResult(x=dp_spec(x0), deff=P("dp"), conv=P("dp"),
                            iters=P("dp"))
    kw = dict(omega=cfg.omega, tol=tol, max_iter=max_iter,
              check_every=cfg.check_every, criterion=cfg.criterion,
              **_pallas_kwargs(cfg))

    import functools as _ft

    @_ft.partial(shard_map, mesh=mesh, in_specs=in_specs,
                 out_specs=out_specs, check_vma=False)
    def run(c_l, s_l, x0_l):
        return solve_batched(cfg.solver, c_l, s_l, x0_l, **kw)

    return jax.jit(run)(coeffs, spec, x0)


def _solve_group_on_mesh(cfg, mesh, coeffs, spec, x0, tol, max_iter,
                         gas_np=None):
    """Run one shape group's batched solve on the pipeline mesh.

    sp == 1: pure data parallelism — an explicit ``shard_map`` over the batch
    axis runs the regular batched solver per device, fused Pallas kernels
    included (per-image freezing and reductions are per-image, so results
    are bitwise identical to the single-device run).
    sp > 1: rows additionally sharded via the halo solvers (sweep solvers).
    """
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    (coeffs, spec, x0), bsz = _pad_batch((coeffs, spec, x0), dp)

    if sp > 1:
        if cfg.solver not in ("jacobi", "mgcg"):
            raise ValueError(
                f"SP: {sp} in batch mode supports solver=jacobi (halo sweep) "
                f"or solver=mgcg (sharded multigrid-PCG); got {cfg.solver!r} "
                f"— use SP: 1 (pure dp) for other solvers")
        ny = x0.shape[-2]
        if ny % sp:
            raise ValueError(f"image rows ({ny}) must divide SP ({sp})")
        if cfg.solver == "mgcg":
            from ..parallel.halo import sharded_solve_mgcg

            res = sharded_solve_mgcg(
                coeffs, spec, x0, mesh, tol=tol, max_iter=max_iter,
                check_every=cfg.check_every or 10, criterion=cfg.criterion,
                first_window=cfg.first_window)
        else:
            from ..parallel.halo import sharded_solve_jacobi

            res = sharded_solve_jacobi(
                coeffs, spec, x0, mesh, omega=cfg.omega or 2.0 / 3.0, tol=tol,
                max_iter=max_iter,
                check_every=cfg.check_every or 10_000, criterion=cfg.criterion)
    else:
        if cfg.solver in ("dcg", "dmg"):
            coeffs, spec, x0 = _dp_shard(mesh, (coeffs, spec, x0))
            members = None
            if gas_np is not None:
                pad = x0.shape[0] - bsz
                members = np.concatenate(
                    [gas_np, np.repeat(gas_np[-1:], pad, axis=0)]) if pad else gas_np
            kw = {}
            if cfg.solver == "dmg":
                from ..solvers.dmg import solve_dmg_batched as _defl_solve

                kw["criterion"] = cfg.criterion
            else:
                from ..solvers.deflation import solve_dcg_batched as _defl_solve
            res = _defl_solve(coeffs, spec, x0, tol=tol, max_iter=max_iter,
                              check_every=cfg.check_every, members=members,
                              **kw)
        else:
            res = _solve_group_dp_shardmap(cfg, mesh, coeffs, spec, x0, tol,
                                           max_iter)
    return jax.tree.map(lambda a: a[:bsz] if a.ndim else a, res)


_build_coeffs_batch = jax.vmap(fvm.fvm_coefficients, in_axes=(0, None, None))
_build_coeffs_batch_masked = jax.vmap(
    fvm.fvm_coefficients, in_axes=(0, None, None, 0, None))
_flux_spec_batch = jax.vmap(make_flux_spec, in_axes=(0, None, None))


def _group_by_shape(imgs: Sequence[np.ndarray], indices: Sequence[int],
                    max_group: int) -> List[List[int]]:
    """Bucket image indices by (H, W); split buckets larger than max_group."""
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i in indices:
        buckets[imgs[i].shape].append(i)
    groups: List[List[int]] = []
    for _, idxs in sorted(buckets.items()):
        if max_group <= 0:
            groups.append(idxs)
        else:
            groups.extend(idxs[k:k + max_group] for k in range(0, len(idxs), max_group))
    return groups


def solve_image_group(cfg: SimulationConfig, imgs_np: np.ndarray):
    """2-phase batched solve of one same-shape group.

    Args:
      imgs_np: (B, H, W) uint8 pixels.
    Returns:
      (deff, conv, iters, x_fields, time_s) with leading batch dim.
    """
    dtype = cfg.np_dtype
    classes = np.stack([
        phases.amplify(phases.two_phase_classes(im), cfg.mesh_amp_y, cfg.mesh_amp_x)
        for im in imgs_np
    ])
    bsz, ny, nx = classes.shape
    d_field = jnp.asarray(
        phases.d_field_from_classes(classes, cfg.d_fluid, cfg.d_solid, dtype=dtype)
    )
    coeffs = _build_coeffs_batch(d_field, cfg.c_left, cfg.c_right)
    spec = _flux_spec_batch(d_field, cfg.c_left, cfg.c_right)
    x0 = jnp.broadcast_to(
        _linear_init(ny, nx, cfg.c_left, cfg.c_right, dtype), (bsz, ny, nx)
    )
    mesh = _pipeline_mesh(cfg)
    if mesh is not None:
        res, dt = time_fn(_solve_group_on_mesh, cfg, mesh, coeffs, spec, x0,
                          cfg.convergence, cfg.max_iter)
    elif cfg.compact_batches and cfg.solver in ("cg", "mgcg"):
        from ..solvers.compact import solve_batched_compacted
        from ..solvers.dispatch import _lookup

        res, dt = time_fn(
            solve_batched_compacted, _lookup(cfg.solver, batched=True),
            coeffs, spec, x0,
            omega=cfg.omega, tol=cfg.convergence, max_iter=cfg.max_iter,
            check_every=cfg.check_every, criterion=cfg.criterion,
            **_pallas_kwargs(cfg),
        )
    else:
        # matrix-free level 0 measured NEUTRAL in 2D — see the gate note in
        # pipeline/single.py; available via solve_mgcg_batched's d_field=
        mf_ok = False
        res, dt = time_fn(
            solve_batched,
            cfg.solver, coeffs, spec, x0,
            omega=cfg.omega, tol=cfg.convergence, max_iter=cfg.max_iter,
            check_every=cfg.check_every, criterion=cfg.criterion,
            **_pallas_kwargs(cfg),
            **({"d_field": d_field} if mf_ok else {}),
        )
    deff = np.asarray(res.deff, np.float64) / cfg.d_fluid  # Deff2D.cuh:2017
    return deff, np.asarray(res.conv), np.asarray(res.iters), np.asarray(res.x), dt


def _solve_batched_3p(cfg, coeffs, spec, x, tol, max_iter, gas_np):
    """3-phase batched stage solve: routes 'dcg' (needs per-image gas-component
    masks for its deflation spaces, mirroring pipeline/single._solve3p) or the
    regular dispatch."""
    mesh = _pipeline_mesh(cfg)
    if mesh is not None:
        return _solve_group_on_mesh(cfg, mesh, coeffs, spec, x, tol, max_iter,
                                    gas_np=gas_np)
    if cfg.solver == "dmg":
        from ..solvers.dmg import solve_dmg_batched

        return solve_dmg_batched(coeffs, spec, x, tol=tol, max_iter=max_iter,
                                 check_every=cfg.check_every,
                                 criterion=cfg.criterion, members=gas_np)
    if cfg.solver == "dcg":
        from ..solvers.deflation import solve_dcg_batched

        return solve_dcg_batched(coeffs, spec, x, tol=tol, max_iter=max_iter,
                                 check_every=cfg.check_every, members=gas_np)
    return solve_batched(
        cfg.solver, coeffs, spec, x,
        omega=cfg.omega, tol=tol, max_iter=max_iter,
        check_every=cfg.check_every, criterion=cfg.criterion,
        **_pallas_kwargs(cfg),
    )


def solve_image_group_3phase(cfg: SimulationConfig, imgs_np: np.ndarray):
    """3-phase batched solve of one same-shape group, DCG homotopy included
    (stage ladder depends only on the global DCG, so all images share it)."""
    dtype = cfg.np_dtype
    class_list, mask_list = [], []
    for im in imgs_np:
        ff = floodfill.flood_fill(im > 200)
        class_list.append(
            phases.amplify(phases.three_phase_classes(im), cfg.mesh_amp_y, cfg.mesh_amp_x)
        )
        mask_list.append(
            phases.amplify((im > 200) | ff.isolated, cfg.mesh_amp_y, cfg.mesh_amp_x)
        )
    classes = np.stack(class_list)
    mask_np = np.stack(mask_list)
    mask = jnp.asarray(mask_np)
    gas_np = ((classes == phases.GAS) & ~mask_np)
    gas_np = gas_np if cfg.solver in ("dcg", "dmg") else None
    bsz, ny, nx = classes.shape

    def build(dcg_val):
        d_field = jnp.asarray(
            phases.d_field_from_classes(
                classes, cfg.d_fluid, cfg.d_solid, dcg_val, dtype=dtype)
        )
        return (
            _build_coeffs_batch_masked(d_field, cfg.c_left, cfg.c_right, mask,
                                       needs_spd(cfg.solver)),
            _flux_spec_batch(d_field, cfg.c_left, cfg.c_right),
        )

    x = jnp.broadcast_to(
        _linear_init(ny, nx, cfg.c_left, cfg.c_right, dtype), (bsz, ny, nx)
    )
    stage_max_iter = (1_000_000 if cfg.solver in ("jacobi", "rbsor", "jacobi_pallas")
                      else cfg.max_iter)
    # dmg skips the homotopy pre-stages (κ-robust; see pipeline/single.py)
    stages = [] if cfg.solver == "dmg" else dcg_stages(cfg.d_gas)
    for stage_num, dcg_t in enumerate(stages, start=1):
        vprint(cfg.verbose, f"Pre-Cond Stage {stage_num}: DCG = {dcg_t:1.3e}")
        coeffs, spec = build(dcg_t)
        res = _solve_batched_3p(cfg, coeffs, spec, x, cfg.convergence * 10,
                                stage_max_iter, gas_np)
        x = res.x

    coeffs, spec = build(cfg.d_gas)
    res, dt = time_fn(
        _solve_batched_3p, cfg, coeffs, spec, x, cfg.convergence,
        cfg.max_iter, gas_np)
    deff = np.asarray(res.deff, np.float64) / cfg.d_fluid
    fr = [phases.phase_fractions(c) for c in classes]
    svf = np.asarray([f[0] for f in fr])
    lvf = np.asarray([f[1] for f in fr])
    return deff, np.asarray(res.conv), np.asarray(res.iters), np.asarray(res.x), dt, svf, lvf


def _prefetched(groups, prepare):
    """Yield ``(group, prepare(group))`` with the next group's host
    preprocessing overlapped with the caller's device work on the current
    one (single worker thread; JAX dispatch is async so the solve call
    returns to the loop quickly)."""
    if not groups:
        return
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(prepare, groups[0])
        for i, group in enumerate(groups):
            data = fut.result()
            if i + 1 < len(groups):
                fut = pool.submit(prepare, groups[i + 1])
            yield group, data


def _attribute_time(total_s: float, iters: np.ndarray) -> np.ndarray:
    """Per-image Time attribution for a fused group solve: proportional to
    each image's sweep count (the reference reports true per-image GPU time;
    a fused batch has one wall-clock, split honestly by work done)."""
    tot = float(np.sum(iters))
    if tot <= 0:
        return np.full(iters.shape, total_s / max(len(iters), 1))
    return total_s * np.asarray(iters, np.float64) / tot


def batch_sim(cfg: SimulationConfig, imgs: Optional[Sequence[np.ndarray]] = None) -> np.ndarray:
    """2-phase batch pipeline (reference BatchSim, Deff2D.cuh:1843).

    Returns the (NumImg, 9) output table:
    imgNum, porosity, PathFlag, Deff, Time, nElements, converge, ds, df.
    """
    cfg.validate()
    if imgs is None:
        imgs = img_io.load_batch(cfg.num_images, cfg.image_dir)
    n = len(imgs)
    out = np.zeros((n, 9))

    inc = writers.IncrementalBatchWriter(cfg.output_name) if cfg.incremental_output else None
    done = inc.completed() if inc else set()
    pending = [i for i in range(n) if i not in done]
    if done:
        vprint(cfg.verbose, f"Resuming batch: {len(done)} images already completed")

    groups = _group_by_shape(imgs, pending, cfg.batch_size)

    def prepare(group):
        stack = np.stack([imgs[i] for i in group])
        stats = [(phases.porosity(imgs[i]),
                  floodfill.flood_fill(imgs[i] > 150).path_flag) for i in group]
        return stack, stats

    for group, (stack, stats) in _prefetched(groups, prepare):
        deff, conv, iters, _, dt = solve_image_group(cfg, stack)
        times = _attribute_time(dt, iters)
        for k, i in enumerate(group):
            im = imgs[i]
            poro, pf = stats[k]
            ne = im.shape[0] * cfg.mesh_amp_y * im.shape[1] * cfg.mesh_amp_x
            row = (i, poro, int(pf), float(deff[k]), float(times[k]),
                   ne, float(conv[k]), cfg.d_solid, cfg.d_fluid)
            out[i] = row
            if inc:
                inc.write_row(row)
            vprint(cfg.verbose, f"Number {i} DCF = {cfg.d_fluid}, Deff {float(deff[k])}")

    if not cfg.incremental_output:
        writers.write_batch(cfg.output_name, [tuple(r) for r in out])
    return out


def batch_sim_3phase(cfg: SimulationConfig, imgs: Optional[Sequence[np.ndarray]] = None) -> np.ndarray:
    """3-phase batch pipeline (reference BatchSim3Phase, Deff2D.cuh:2056).

    Returns the (NumImg, 11) output table:
    imgNum, SVF, LVF, PathFlag, Deff, Time, nElements, converge, ds, df, dg.
    """
    cfg.validate()
    if imgs is None:
        imgs = img_io.load_batch(cfg.num_images, cfg.image_dir)
    n = len(imgs)
    out = np.zeros((n, 11))

    inc = (writers.IncrementalBatchWriter(cfg.output_name, three_phase=True)
           if cfg.incremental_output else None)
    done = inc.completed() if inc else set()
    pending = [i for i in range(n) if i not in done]

    groups = _group_by_shape(imgs, pending, cfg.batch_size)

    def prepare(group):
        stack = np.stack([imgs[i] for i in group])
        flags = [floodfill.flood_fill(imgs[i] > 200).path_flag for i in group]
        return stack, flags

    for group, (stack, flags) in _prefetched(groups, prepare):
        deff, conv, iters, x, dt, svf, lvf = solve_image_group_3phase(cfg, stack)
        times = _attribute_time(dt, iters)
        for k, i in enumerate(group):
            im = imgs[i]
            ne = im.shape[0] * cfg.mesh_amp_y * im.shape[1] * cfg.mesh_amp_x
            row = (i, float(svf[k]), float(lvf[k]), int(flags[k]),
                   float(deff[k]), float(times[k]), ne, float(conv[k]),
                   cfg.d_solid, cfg.d_fluid, cfg.d_gas)
            out[i] = row
            if inc:
                inc.write_row(row)
            if cfg.print_cmap:
                writers.write_cmap(f"CMAP_{i:05d}.csv", x[k])

    if not cfg.incremental_output:
        writers.write_batch_3phase(cfg.output_name, [tuple(r) for r in out])
    return out

"""Analytical validation oracles (documentation PDF §5.3).

Parallel slabs:  Deff = eps*Df + (1-eps)*Ds                (eq. 7)
Series slabs:    Deff = (eps/Df + (1-eps)/Ds)^-1           (eq. 8)
3-phase parallel: Deff = LVF*Df + SVF*Ds + GVF*Dg          (eq. 9)
Special cases: thin-phase series (3% width, contrast > 1e6, Deff = 33.33,
PDF §5.3.1) and the 3-phase parallel 30/40/30 case with Dg = 1,237,500
(Deff = 371,250.4, PDF §5.3.2).

These cases are exact for the FVM discretization (piecewise-constant fields
aligned with the mesh), so tight tolerances apply.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from effectivediffusivityfvm_tpu.config import SimulationConfig
from effectivediffusivityfvm_tpu.io.images import (
    parallel_slab,
    series_slab,
    three_phase_parallel_slab,
)
from effectivediffusivityfvm_tpu.models import phases
from effectivediffusivityfvm_tpu.ops import fvm
from effectivediffusivityfvm_tpu.ops.flux import make_flux_spec
from effectivediffusivityfvm_tpu.pipeline.single import single_sim, single_sim_3phase
from effectivediffusivityfvm_tpu.solvers.jacobi import solve_jacobi


def solve_image(img, df, ds, tol=1e-11, n=None):
    classes = phases.two_phase_classes(img)
    d = jnp.asarray(phases.d_field_from_classes(classes, df, ds, dtype=np.float64))
    c = fvm.fvm_coefficients(d, 0.0, 1.0)
    spec = make_flux_spec(d, 0.0, 1.0)
    ny, nx = d.shape
    x0 = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.float64) / nx, (ny, nx))
    res = solve_jacobi(c, spec, x0, tol=tol, max_iter=3_000_000,
                       check_every=1000, criterion="residual")
    return float(res.deff)


@pytest.mark.parametrize("eps", [0.1, 0.3, 0.5, 0.7, 0.9])
@pytest.mark.parametrize("ds", [1e-1, 1e-3])
def test_parallel_slab_sweep(eps, ds):
    deff = solve_image(parallel_slab(50, eps), 1.0, ds, tol=1e-12)
    np.testing.assert_allclose(deff, eps * 1.0 + (1 - eps) * ds, rtol=1e-6)


@pytest.mark.parametrize("eps", [0.1, 0.5, 0.9])
@pytest.mark.parametrize("ds", [1e-1, 1e-2])
def test_series_slab_sweep(eps, ds):
    deff = solve_image(series_slab(50, eps), 1.0, ds, tol=1e-13)
    np.testing.assert_allclose(deff, 1.0 / (eps / 1.0 + (1 - eps) / ds), rtol=1e-6)


def test_thin_phase_high_contrast():
    """PDF §5.3.1: 3% solid slab in series, fluid/solid contrast 1e6.

    Deff = (0.97/1e6 + 0.03/1)^-1 = 33.33 (in units of the raw system; the
    CSV column is normalized by D_fluid).  Exercises the DCF continuation
    ladder (stages 100, 1e4, 1e6) through the full 2-phase pipeline.
    """
    img = series_slab(100, 0.97)
    cfg = SimulationConfig(
        n_phase=2, d_fluid=1e6, d_solid=1.0, convergence=1e-9,
        max_iter=3_000_000, check_every=1000, dtype="float64",
        criterion="residual",
    )
    res = single_sim(cfg, img=img, write_output=False)
    deff_raw = res.deff * cfg.d_fluid
    expected = 1.0 / (0.97 / 1e6 + 0.03 / 1.0)
    np.testing.assert_allclose(deff_raw, expected, rtol=1e-4)
    np.testing.assert_allclose(expected, 33.33, rtol=1e-3)


def test_three_phase_parallel_headline():
    """PDF §5.3.2: 30/40/30 solid/fluid/gas parallel slabs, Dg = 1,237,500,
    Ds = 0, Df = 1 -> Deff = 371,250.4.  Exercises the DCG homotopy."""
    img = three_phase_parallel_slab(100, svf=0.3, lvf=0.4)
    cfg = SimulationConfig(
        n_phase=3, d_fluid=1.0, d_solid=0.0, d_gas=1_237_500.0,
        convergence=1e-9, max_iter=3_000_000, check_every=1000,
        dtype="float64", criterion="residual",
    )
    res = single_sim_3phase(cfg, img=img, write_output=False)
    np.testing.assert_allclose(res.deff, 0.4 * 1.0 + 0.3 * 1_237_500.0, rtol=1e-5)
    assert res.svf == pytest.approx(0.3)
    assert res.lvf == pytest.approx(0.4)
    assert res.path_flag


def test_three_phase_eq9_small():
    # Note Ds must be 0 here: 3-phase solid cells are pinned to c=0 but the
    # boundary-flux formula still evaluates D_solid*(CR-0)/(dx/2) on solid
    # rows at the right boundary — exactly like the reference
    # (Deff2D.cuh:1257), whose eq. 9 validations all use Ds=0.
    img = three_phase_parallel_slab(60, svf=0.2, lvf=0.5)
    cfg = SimulationConfig(
        n_phase=3, d_fluid=2.0, d_solid=0.0, d_gas=50.0,
        convergence=1e-10, max_iter=3_000_000, check_every=1000,
        dtype="float64", criterion="residual",
    )
    res = single_sim_3phase(cfg, img=img, write_output=False)
    expected = (0.5 * 2.0 + 0.3 * 50.0) / 2.0  # normalized by D_fluid
    np.testing.assert_allclose(res.deff, expected, rtol=1e-6)

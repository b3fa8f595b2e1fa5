"""Solver registry: route a config's solver name to an implementation.

The reference's only live solver is the damped-Jacobi kernel (``updateX_SOR``,
Deff2D.cuh:69-92; the undamped ``updateX_V1`` variant is present but commented
out at both call sites, Deff2D.cuh:1091/1236).  This framework additionally
ships red-black SOR and Jacobi-preconditioned CG (BASELINE.json configs 2-3)
and a fused Pallas Jacobi kernel; all share the same call signature and
:class:`~.jacobi.SolveResult` so pipelines stay solver-agnostic.
"""

from __future__ import annotations

from .jacobi import SolveResult, solve_jacobi, solve_jacobi_batched

__all__ = ["solve", "solve_batched", "needs_spd", "SolveResult"]


def needs_spd(name: str) -> bool:
    """True if ``name`` requires the symmetrized (SPD) masked assembly.

    Krylov solvers (cg/mgcg/cgir/dcg) need symmetry for their convergence
    theory; the fused Pallas kernel reconstructs east/south couplings as
    rolls of a_w/a_n (ops/kernels/jacobi_vmem.py), which silently applies a
    transposed operator on an unsymmetric masked system.  The symmetrized
    assembly has the identical exact solution (see fvm.fvm_coefficients), so
    every pipeline routes 3-phase systems for these solvers through it via
    this single predicate.
    """
    return name in ("cg", "mgcg", "cgir", "dcg", "dmg", "jacobi_pallas")


def _lookup(name: str, batched: bool):
    if name == "jacobi":
        return solve_jacobi_batched if batched else solve_jacobi
    if name == "rbsor":
        from .rbsor import solve_rbsor, solve_rbsor_batched
        return solve_rbsor_batched if batched else solve_rbsor
    if name == "cg":
        from .cg import solve_cg, solve_cg_batched
        return solve_cg_batched if batched else solve_cg
    if name == "mgcg":
        from .multigrid import solve_mgcg, solve_mgcg_batched
        return solve_mgcg_batched if batched else solve_mgcg
    if name == "cgir":
        from .refine import solve_cgir, solve_cgir_batched
        return solve_cgir_batched if batched else solve_cgir
    if name == "dcg":
        from .deflation import solve_dcg, solve_dcg_batched
        return solve_dcg_batched if batched else solve_dcg
    if name == "dmg":
        from .dmg import solve_dmg, solve_dmg_batched
        return solve_dmg_batched if batched else solve_dmg
    if name == "jacobi_pallas":
        from .jacobi_pallas import solve_jacobi_pallas, solve_jacobi_pallas_batched
        return solve_jacobi_pallas_batched if batched else solve_jacobi_pallas
    raise ValueError(f"unknown solver {name!r}")


def solve(name, coeffs, spec, x0, **kw) -> SolveResult:
    return _lookup(name, batched=False)(coeffs, spec, x0, **kw)


def solve_batched(name, coeffs, spec, x0, **kw) -> SolveResult:
    return _lookup(name, batched=True)(coeffs, spec, x0, **kw)

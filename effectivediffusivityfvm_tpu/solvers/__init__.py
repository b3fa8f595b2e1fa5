from .jacobi import SolveResult, solve_jacobi, solve_jacobi_batched

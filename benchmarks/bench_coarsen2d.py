"""A/B the 2D Galerkin coarsening formulations on the real chip.

The 3D A/B (bench_coarsen3d.py) measured the blocked (K,2,I,2,J,2)
reshape at ~60x slower than stride-2 slice pair-sums; the 2D `coarsen`
(solvers/multigrid.py) uses the same (I,2,J,2) blocked reshape.  The
headline bench builds a batched hierarchy over batch x 512^2 cells per
solve group, so this measures both formulations at bench shape.

  base    blocked (I,2,J,2) reshape-sums (pre-round-4 coarsen)
  slices  stride-2 slice pair-sums on y, reshape pair-sum on x only
          where a pair SUM is needed; stride-2 slices for odd/even
          column selection

Usage: python benchmarks/bench_coarsen2d.py [n] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def timed(fn, *args, reps=10, name=""):
    tc = time.perf_counter()
    np.asarray(fn(*args))
    print(f"  [{name}: compiled+first {time.perf_counter()-tc:.1f}s]",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main(n: int = 512, batch: int = 64):
    import jax
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm

    rng = np.random.default_rng(11)
    d = jnp.asarray(
        np.where(rng.random((batch, n, n)) < 0.65, 1.0, 1e-6), jnp.float32)
    c = fvm.fvm_coefficients(d, 0.0, 1.0)
    c = jax.tree.map(jax.block_until_ready, c)
    print(f"device={jax.devices()[0].device_kind}, level-0 {batch}x{n}^2")

    def blocks(a):
        ny, nx = a.shape[-2], a.shape[-1]
        return a.reshape(a.shape[:-2] + (ny // 2, 2, nx // 2, 2))

    def base_core(cc):
        ae_b = blocks(cc.a_e)
        as_b = blocks(cc.a_s)
        a_e_c = ae_b[..., :, :, :, 1].sum(-2)
        a_s_c = as_b[..., :, 1, :, :].sum(-1)
        internal = ae_b[..., :, :, :, 0].sum(-2) + as_b[..., :, 0, :, :].sum(-1)
        diag_r = blocks(cc.diag).sum(axis=(-3, -1))
        b_c = blocks(cc.b).sum(axis=(-3, -1))
        return a_e_c, a_s_c, internal, diag_r - 2.0 * internal, b_c

    def ysum(a):
        return a[..., 0::2, :] + a[..., 1::2, :]

    def xsum(a):
        s = a.shape
        return a.reshape(s[:-1] + (s[-1] // 2, 2)).sum(-1)

    def slices_core(cc):
        t_e = ysum(cc.a_e)                 # (..., I, nx)
        a_e_c = t_e[..., 1::2]
        t_s = xsum(cc.a_s)                 # (..., ny, J)
        a_s_c = t_s[..., 1::2, :]
        internal = t_e[..., 0::2] + t_s[..., 0::2, :]
        diag_r = xsum(ysum(cc.diag))
        b_c = xsum(ysum(cc.b))
        return a_e_c, a_s_c, internal, diag_r - 2.0 * internal, b_c

    def sumall(f):
        return jax.jit(lambda cc: sum(jnp.sum(l) for l in f(cc)))

    f_b, f_s = jax.jit(base_core), jax.jit(slices_core)
    out_b = [np.asarray(a) for a in f_b(c)]
    out_s = [np.asarray(a) for a in f_s(c)]
    for nm, a, b in zip(("a_e", "a_s", "int", "diag", "b"), out_b, out_s):
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)
        print(f"  rel err {nm}: {err:.2e}")

    t_n = timed(jax.jit(lambda cc: cc.diag[0, 0, 0] + 1.0), c, name="null")
    t_b = timed(sumall(base_core), c, name="base")
    t_s = timed(sumall(slices_core), c, name="slices")
    nb, ns = t_b - t_n, t_s - t_n
    print(f"null   {t_n*1e3:7.2f} ms (dispatch floor, subtracted)")
    print(f"base   {nb*1e3:7.2f} ms")
    print(f"slices {ns*1e3:7.2f} ms   ({nb/max(ns,1e-9):.2f}x)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64)

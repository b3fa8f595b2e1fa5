"""A/B the 3D Galerkin coarsening formulations on the real chip.

The breakdown bench (bench3d_breakdown.py) showed build_hierarchy_3d is
~78 ms of the ~144 ms 256^3 solve — ~40x the HBM traffic ideal.  Suspect:
the `_blocks3` reshape to (K,2,I,2,J,2) + strided sums forces 2-element
lane layouts.  Candidates, same math:

  base    current coarsen_3d (_blocks3 reshape-sums)
  slices  stride-2 slice pair-sums on z/y (major dims), reshape-sum only
          for the x pairing, select axes via stride-2 slices of the
          already-4x-reduced intermediates
  matmul  like slices, but the x pairing/selection is a (nx, nx/2)
          0/1 selection matmul at precision HIGHEST (exact in fp32)

Usage: python benchmarks/bench_coarsen3d.py [n]
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


def main(n: int = 256):
    import jax
    import jax.numpy as jnp

    from effectivediffusivityfvm_tpu.ops import fvm3d
    from effectivediffusivityfvm_tpu.solvers import solvers3d

    rng = np.random.default_rng(11)
    d = jnp.asarray(
        np.where(rng.random((n, n, n)) < 0.65, 1.0, 1e-6), jnp.float32)
    c = jax.tree.map(lambda a: a[None],
                     fvm3d.fvm_coefficients_3d(d, 0.0, 1.0))
    c = jax.tree.map(jax.block_until_ready, c)
    print(f"device={jax.devices()[0].device_kind}, level-0 {n}^3")

    def zsum(a):
        return a[..., 0::2, :, :] + a[..., 1::2, :, :]

    def ysum(a):
        return a[..., 0::2, :] + a[..., 1::2, :]

    def xsum_reshape(a):
        s = a.shape
        return a.reshape(s[:-1] + (s[-1] // 2, 2)).sum(-1)

    def make_xops(nx, dtype):
        j = jnp.arange(nx)[:, None]
        k = jnp.arange(nx // 2)[None, :]
        pair = (j // 2 == k)
        S = pair.astype(dtype)                       # pair sum
        Ee = (pair & (j % 2 == 0)).astype(dtype)     # even select
        Eo = (pair & (j % 2 == 1)).astype(dtype)     # odd select
        return S, Ee, Eo

    def core(cc, xsum, xsel_odd, xsel_even):
        """a_e_c, a_s_c, a_d_c, internal, diag_c, b_c from block reductions."""
        t_e = zsum(ysum(cc.a_e))               # (K, I, nx): pair z,y
        a_e_c = xsel_odd(t_e)
        int_e = xsel_even(t_e)
        t_s = xsum(zsum(cc.a_s))               # (K, ny, J)
        a_s_c = t_s[..., 1::2, :]
        int_s = t_s[..., 0::2, :]
        t_d = ysum(xsum(cc.a_d))               # (nz, I, J)
        a_d_c = t_d[..., 1::2, :, :]
        int_d = t_d[..., 0::2, :, :]
        internal = int_e + int_s + int_d
        diag_c = xsum(ysum(zsum(cc.diag))) - 2.0 * internal
        b_c = xsum(ysum(zsum(cc.b)))
        return a_e_c, a_s_c, a_d_c, internal, diag_c, b_c

    def finish(a_e_c, a_s_c, a_d_c, internal, diag_c, b_c):
        """Mirror/zero-edge concats + floor/diag_inv, matching the tail of
        solvers3d.coarsen_3d so the timed work is apples-to-apples with
        variant_base (ADVICE r4)."""
        zx = jnp.zeros_like(a_e_c[..., :, :, :1])
        zy = jnp.zeros_like(a_s_c[..., :, :1, :])
        zz = jnp.zeros_like(a_d_c[..., :1, :, :])
        a_e_m = jnp.concatenate([a_e_c[..., :, :, :-1], zx], axis=-1)
        a_w_m = jnp.concatenate([zx, a_e_m[..., :, :, :-1]], axis=-1)
        a_s_m = jnp.concatenate([a_s_c[..., :, :-1, :], zy], axis=-2)
        a_n_m = jnp.concatenate([zy, a_s_m[..., :, :-1, :]], axis=-2)
        a_d_m = jnp.concatenate([a_d_c[..., :-1, :, :], zz], axis=-3)
        a_u_m = jnp.concatenate([zz, a_d_m[..., :-1, :, :]], axis=-3)
        diag_r = diag_c + 2.0 * internal
        floor = jnp.asarray(1e-6, diag_c.dtype) * diag_r
        ok = diag_c > floor
        diag_inv = jnp.where(ok, 1.0 / jnp.where(ok, diag_c, 1.0), 0.0)
        return solvers3d.StencilCoeffs3D(
            a_w_m, a_e_m, a_n_m, a_s_m, a_u_m, a_d_m, diag_c, diag_inv, b_c)

    def variant_slices(cc):
        return finish(*core(cc, xsum_reshape,
                            lambda a: a[..., 1::2], lambda a: a[..., 0::2]))

    def variant_matmul(cc):
        nx = cc.a_e.shape[-1]
        S, Ee, Eo = make_xops(nx, cc.a_e.dtype)
        mm = lambda a, M: jax.lax.dot_general(
            a, M, (((a.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return finish(*core(cc, lambda a: mm(a, S),
                            lambda a: mm(a, Eo), lambda a: mm(a, Ee)))

    def variant_base(cc):
        return solvers3d.coarsen_3d(cc)

    def sumall(f):
        return jax.jit(lambda cc: sum(
            jnp.sum(l) for l in jax.tree.leaves(f(cc))))

    base = jax.jit(variant_base)
    f_s = jax.jit(variant_slices)
    f_m = jax.jit(variant_matmul)
    base_t, fs_t, fm_t = (sumall(variant_base), sumall(variant_slices),
                          sumall(variant_matmul))

    # correctness: every variant now returns the full finished
    # StencilCoeffs3D — compare leaves directly against base
    out_b = jax.tree.map(np.asarray, base(c))
    for name, f in (("slices", f_s), ("matmul", f_m)):
        out_v = jax.tree.map(np.asarray, f(c))
        errs = {
            k: np.max(np.abs(getattr(out_v, k) - getattr(out_b, k)))
            / max(np.max(np.abs(getattr(out_b, k))), 1e-30)
            for k in ("a_e", "diag", "b")}
        print(f"{name}: rel err a_e {errs['a_e']:.2e}, "
              f"diag {errs['diag']:.2e}, b {errs['b']:.2e}")

    t_n = timed(jax.jit(lambda cc: cc.diag[0, 0, 0, 0] + 1.0), c,
                name="null")
    t_b = timed(base_t, c, name="base")
    t_s = timed(fs_t, c, name="slices")
    t_m = timed(fm_t, c, name="matmul")
    nb, ns, nm = t_b - t_n, t_s - t_n, t_m - t_n
    print(f"null   {t_n*1e3:7.2f} ms (dispatch floor, subtracted below)")
    print(f"base   {nb*1e3:7.2f} ms")
    print(f"slices {ns*1e3:7.2f} ms   ({nb/max(ns, 1e-9):.2f}x)")
    print(f"matmul {nm*1e3:7.2f} ms   ({nb/max(nm, 1e-9):.2f}x)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

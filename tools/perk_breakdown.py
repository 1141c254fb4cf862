"""Per-k-point stage breakdown at the bench config (TPU).

Times: (a) assembly only (matrix out), (b) full solve (assembly+GMRES),
(c) solve alone from a pre-assembled matrix, for several GMRES restarts
and tolerances.  Run: python tools/perk_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

cache = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx

N_END = 32
N_SIDE = 4
SPACING = 4.0
K0 = 8.0


def lattice_centers(n_side, spacing, d=3):
    g = (np.arange(n_side) - (n_side - 1) / 2) * spacing
    xx, yy = np.meshgrid(g, g)
    centers = np.zeros((n_side * n_side, d))
    centers[:, 0] = xx.ravel()
    centers[:, 1] = yy.ravel()
    return centers


def timeit(f, *args, n=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    c = create_from_branching_types("ba")
    centers = jnp.asarray(lattice_centers(N_SIDE, SPACING), dtype=jnp.float32)
    radii = jnp.ones(N_SIDE * N_SIDE, dtype=jnp.float32)
    direction = jnp.asarray(np.array([1.0, 0.0, 0.0], dtype=np.float32))

    def asm_only(k):
        calc = biem(
            c, centers=centers, radii=radii, k=k, n_end=N_END, force_matrix=True
        )
        return calc.matrix

    def rhs_only(k):
        uin, _ = plane_wave(k=k, direction=direction)
        from biem_helmholtz_sphere_tpu.biem._core import (
            _check_biem_inputs,
            _rhs_expansion,
        )

        centers2, radii2, k2, eta2, alpha2, beta2 = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        return _rhs_expansion(
            c, N_END, centers2, radii2, alpha2, beta2, uin, None, k2.ndim
        )

    def full(k):
        uin, _ = plane_wave(k=k, direction=direction)
        calc = biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin)
        return calc.density

    t_asm, matrix = timeit(jax.jit(asm_only), jnp.float32(K0))
    t_rhs, f_exp = timeit(jax.jit(rhs_only), jnp.float32(K0))
    t_full, _ = timeit(jax.jit(full), jnp.float32(K0))
    print(f"assembly only: {t_asm:.4f} s")
    print(f"rhs only:      {t_rhs:.4f} s")
    print(f"full:          {t_full:.4f} s  -> solve ~ {t_full - t_asm - t_rhs:.4f} s")

    n_sys = matrix.shape[-4] * matrix.shape[-3]
    m2 = matrix.reshape((n_sys, n_sys))
    f2 = f_exp.reshape((n_sys,))

    for restart, tol in [(24, None), (16, None), (32, None), (24, 3e-5), (16, 3e-5), (12, 3e-5)]:
        def sol(m, f, restart=restart, tol=tol):
            return cplx.gmres_solve(m, f, restart=restart, tol=tol)

        t_sol, x = timeit(jax.jit(sol), m2, f2)
        r = cplx.einsum("ij,j->i", cplx.C.of(m2), cplx.C.of(x)) - cplx.C.of(f2)
        rn = float(jnp.linalg.norm(r.re**2 + r.im**2) ** 0.5)
        bn = float(jnp.linalg.norm(f2.re**2 + f2.im**2) ** 0.5)
        print(
            f"gmres restart={restart} tol={tol}: {t_sol:.4f} s, "
            f"true relres {rn / bn:.2e}"
        )


if __name__ == "__main__":
    main()

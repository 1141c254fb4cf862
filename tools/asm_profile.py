"""Assembly stage breakdown at the bench config (TPU).

Times translation-only (rotation+coaxial over distinct offsets), the
radial tables, and full _assemble, to see where the ~0.1 s goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.biem._core import (
    _assemble,
    _check_biem_inputs,
    _radial_rows_scaled,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types, from_cartesian
from biem_helmholtz_sphere_tpu.translation._scaled import sr_scaled

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


def timeit(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    c = create_from_branching_types("ba")
    centers_np = lattice_centers(N_SIDE, SPACING)
    centers = jnp.asarray(centers_np, dtype=jnp.float32)
    radii = jnp.ones(N_SIDE * N_SIDE, dtype=jnp.float32)
    c2, r2, k2, e2, a2, b2 = _check_biem_inputs(
        c, centers, radii, jnp.float32(K0), None, 1.0, 0.0
    )

    bu, bv = np.triu_indices(N_SIDE * N_SIDE, k=1)
    t_np = np.round(centers_np[bu] - centers_np[bv], 12)
    uniq = np.unique(t_np, axis=0)
    print(f"pairs {len(bu)}, distinct offsets {len(uniq)}")
    t_cart = jnp.asarray(uniq.T, dtype=jnp.float32)

    def trans_only(k):
        return sr_scaled(
            c, from_cartesian(c, t_cart), N_END, k[..., None],
            kind="SR", t_cart=t_cart, method=None,
        )

    def radial_only(k):
        return _radial_rows_scaled(c, N_END, r2, k, e2, a2, b2)

    def asm(k):
        return _assemble(c, N_END, c2, r2, k, e2, a2, b2, None, stable=True)

    t_t = timeit(jax.jit(trans_only), jnp.float32(K0))
    t_r = timeit(jax.jit(radial_only), jnp.float32(K0))
    t_a = timeit(jax.jit(asm), jnp.float32(K0))
    print(f"translation only ({len(uniq)} offsets): {t_t:.4f} s")
    print(f"radial tables:                        {t_r:.4f} s")
    print(f"full _assemble:                       {t_a:.4f} s")


if __name__ == "__main__":
    main()

"""Sub-stage timing of dense assembly at the bench config (sync mode).

Stages: coaxial_scaled (9 uniq radii), rotation_matrix (24 uniq offsets),
sr_scaled (rot + coax + sandwich), full _assemble.  The gap between
sr_scaled and _assemble is the gather + radial-fold + scatter cost.
Run idle: timeout 1500 python tools/asm_profile.py [n_end]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.biem._core import _assemble, _check_biem_inputs
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.translation._rotation import rotation_matrix
from biem_helmholtz_sphere_tpu.translation._scaled import coaxial_scaled, sr_scaled

N_END = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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


def timeit(f, *a, n=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n


def main():
    c = create_from_branching_types("ba")
    centers = lattice_centers(N_SIDE, SPACING).astype(np.float32)
    radii = np.ones(N_SIDE * N_SIDE, dtype=np.float32)
    bu, bv = np.triu_indices(16, k=1)
    t_np = np.round(centers[bu] - centers[bv], 12)
    uniq = np.unique(t_np, axis=0)
    r_uniq = np.unique(np.round(np.linalg.norm(uniq, axis=1), 10))
    print(f"n_end={N_END}: {len(uniq)} uniq offsets, {len(r_uniq)} uniq radii",
          flush=True)
    # force sync mode before any timing
    _ = np.asarray(jnp.ones((4,)))

    def coax_step(k):
        m, s = coaxial_scaled(c, jnp.asarray(r_uniq.astype(np.float32)),
                              N_END, k[..., None])
        return m.re.sum() + m.im.sum() + s.sum()

    def rot_step(k):
        th = uniq / np.linalg.norm(uniq, axis=1, keepdims=True)
        m = rotation_matrix(c, jnp.asarray(th.astype(np.float32)) *
                            jnp.sign(k), N_END)
        return m.re.sum() + m.im.sum()

    def sr_step(k):
        t_cart = jnp.moveaxis(jnp.asarray(uniq.astype(np.float32)), -1, 0)
        from biem_helmholtz_sphere_tpu.coords import from_cartesian

        mant, s = sr_scaled(c, from_cartesian(c, t_cart), N_END,
                            k[..., None], t_cart=t_cart)
        return mant.re.sum() + mant.im.sum() + s.sum()

    def asm_step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        m = _assemble(c, N_END, cc, rr, kk, eta, al, be, None, stable=True)
        return m.re.sum() + m.im.sum()

    k0 = jnp.float32(K0)
    for name, f in [("coax(9r)", coax_step), ("rot(24t)", rot_step),
                    ("sr_scaled(24t)", sr_step), ("assemble", asm_step)]:
        t = timeit(jax.jit(f), k0)
        print(f"{name:16s} {t*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

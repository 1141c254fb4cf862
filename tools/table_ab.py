"""A/B: assembly time with lru-cached tables as host numpy vs device arrays.

The host-numpy conversion (commit a729411) avoided the captured-buffer
dispatch degradation; this measures whether embedding the tables as HLO
literals slowed the assembly program itself.  Run order: numpy first
(the current code), then device-array variant, then a canary to see if
the device-array program re-triggers the dispatch degradation.
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
from biem_helmholtz_sphere_tpu.ops.cplx import C
from biem_helmholtz_sphere_tpu.translation import _rotation, _scaled  # noqa: F401

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


def timeit(f, *a, n=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n


canary = jax.jit(jnp.sin)
xc = jnp.ones((16,))


def can(tag):
    print(f"canary [{tag}]: {timeit(canary, xc, n=20) * 1000:.2f} ms", flush=True)


def main():
    c = create_from_branching_types("ba")
    centers = lattice_centers(N_SIDE, SPACING).astype(np.float32)
    radii = np.ones(N_SIDE * N_SIDE, dtype=np.float32)

    def asm_step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        m = _assemble(c, N_END, cc, rr, kk, eta, al, be, None, stable=True)
        return m.re.sum() + m.im.sum()

    k0 = jnp.float32(K0)
    can("start")
    t_np = timeit(jax.jit(asm_step), k0)
    print(f"assemble [numpy tables]:  {t_np:.4f} s", flush=True)
    can("after numpy-table run")

    # device-array variant: wrap the cached-table constructors
    orig_coax = _rotation._coax_tables.__wrapped__
    orig_rot = _rotation._rot_tables.__wrapped__

    def to_dev(x):
        if isinstance(x, C):
            return C(jnp.asarray(x.re), jnp.asarray(x.im))
        return jnp.asarray(x)

    from functools import lru_cache

    _rotation._coax_tables = lru_cache(maxsize=32)(
        lambda *a: tuple(to_dev(x) for x in orig_coax(*a))
    )
    _rotation._rot_tables = lru_cache(maxsize=32)(
        lambda *a: tuple(to_dev(x) for x in orig_rot(*a))
    )

    def asm_step2(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        m = _assemble(c, N_END, cc, rr, kk, eta, al, be, None, stable=True)
        return m.re.sum() + m.im.sum() + 0.0  # distinct jaxpr -> fresh compile

    t_dev = timeit(jax.jit(asm_step2), k0)
    print(f"assemble [device tables]: {t_dev:.4f} s", flush=True)
    can("after device-table run")


if __name__ == "__main__":
    main()

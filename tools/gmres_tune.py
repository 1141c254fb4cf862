"""Bench-config dense-GMRES: restart sweep -> per-k time + true residual."""
import os
import sys
import time

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")
import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    _assemble,
    _check_biem_inputs,
    _rhs_expansion,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx

N_END = 32
K0 = 8.0
B = 16
N = B * N_END * N_END

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers = jnp.asarray(
    np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1), jnp.float32
)
radii = jnp.ones(B, jnp.float32)
direction = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

configs = [(16, 12), (24, 8), (32, 6), (48, 4), (64, 3)]
if len(sys.argv) > 1:
    configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]

for restart, maxiter in configs:

    def step(k, restart=restart, maxiter=maxiter):
        uin, _ = plane_wave(k=k, direction=direction)
        centers_, radii_, k_, eta_, alpha_, beta_ = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        f = _rhs_expansion(c, N_END, centers_, radii_, alpha_, beta_, uin, None, 0)
        f2 = f.reshape((N,))
        m = _assemble(c, N_END, centers_, radii_, k_, eta_, alpha_, beta_, None)
        m2 = m.reshape((N, N))
        x = cplx.gmres_solve(m2, f2, restart=restart, maxiter=maxiter)
        r = cplx.einsum("ij,j->i", m2, x) - f2
        def nrm(z):
            return jnp.sqrt(jnp.sum(z.abs2()))
        return x, nrm(r) / nrm(f2)

    jit_step = jax.jit(step)
    x, res = jit_step(jnp.float32(K0))
    jax.block_until_ready(x)
    ts = []
    for kk in (7.9, 8.0, 8.1):
        t0 = time.perf_counter()
        x, res = jit_step(jnp.float32(kk))
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    print(
        f"restart={restart:3d} maxiter={maxiter:2d}: per-k {np.mean(ts):.3f}s  "
        f"true rel residual {float(res):.3e}"
    )

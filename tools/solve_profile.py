"""Stage-time breakdown of the bench config on TPU: translation, dense
assembly, GMRES solve (plus iteration-count estimate via residual)."""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C

N_END = 32
K0 = 8.0

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers = jnp.asarray(
    np.stack([xx.ravel(), yy.ravel(), np.zeros(16)], axis=1), dtype=jnp.float32
)
radii = jnp.ones(16, dtype=jnp.float32)
direction = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)


def assemble(k):
    uin, _ = plane_wave(k=k, direction=direction)
    calc = biem(
        c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin,
        force_matrix=True, solver="direct",
    )
    return calc.matrix


def full(k):
    uin, _ = plane_wave(k=k, direction=direction)
    calc = biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin)
    return calc.density


# NOTE: force_matrix=True + solver="direct" would LU 32k rows -> overflows
# vmem; instead time assembly alone by returning the matrix.
def assemble_only(k):
    uin, _ = plane_wave(k=k, direction=direction)
    calc = biem(
        c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin,
        force_matrix=True, solver="gmres",
    )
    return calc.matrix, calc.density


jfull = jax.jit(full)
o = jfull(jnp.float32(K0))
jax.block_until_ready(o)
t0 = time.perf_counter()
o = jfull(jnp.float32(8.01))
jax.block_until_ready(o)
t_full = time.perf_counter() - t0
print(f"full (assembly+solve): {t_full:.3f} s")

jasm = jax.jit(lambda k: assemble_only(k)[0])
m = jasm(jnp.float32(K0))
jax.block_until_ready(m)
t0 = time.perf_counter()
m = jasm(jnp.float32(8.01))
jax.block_until_ready(m)
t_asm = time.perf_counter() - t0
print(f"assembly only (translation + blocks): {t_asm:.3f} s -> solve ~ {t_full - t_asm:.3f} s")

# matvec cost on the dense matrix
b = C(jnp.ones((16 * 1024,), jnp.float32), jnp.zeros((16 * 1024,), jnp.float32))
m2 = C(m.re.reshape(16 * 1024, 16 * 1024), m.im.reshape(16 * 1024, 16 * 1024))
mv = jax.jit(lambda mm, x: cplx.einsum("ij,j->i", mm, x))
y = mv(m2, b)
jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(10):
    y = mv(m2, y)
jax.block_until_ready(y)
t_mv = (time.perf_counter() - t0) / 10
print(f"dense matvec: {t_mv*1e3:.2f} ms -> implied GMRES matvec count ~ {(t_full-t_asm)/t_mv:.0f}")

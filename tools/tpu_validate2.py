"""Bench-config validation on TPU with the rotation translation path:
solve the 16-ball n_end=32 system at k=8, then check the sound-soft
boundary condition u_in + u_scat ~ 0 directly at off-quadrature surface
points of several spheres."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

N_END = 32
K0 = 8.0

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(16)], axis=1).astype(np.float32)
centers = jnp.asarray(centers_np)
radii = jnp.ones(16, dtype=jnp.float32)
direction = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
k = jnp.float32(K0)

uin, _ = plane_wave(k=k, direction=direction)
calc = jax.jit(
    lambda: biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin)
)()
jax.block_until_ready(calc.density)
dre = np.asarray(calc.density.re) if hasattr(calc.density, "re") else np.asarray(calc.density)
print("density finite:", np.isfinite(dre).all())

# surface points slightly off the quadrature nodes, on 4 spheres
rng = np.random.default_rng(7)
pts = []
for b in (0, 5, 10, 15):
    v = rng.normal(size=(3, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=0)
    pts.append(centers_np[b][:, None] + 1.0000005 * v)
x = jnp.asarray(np.concatenate(pts, axis=1))

us = jax.jit(lambda cl, xx_: cl.uscat(xx_))(calc, x)
ure = np.asarray(us.re) if hasattr(us, "re") else np.asarray(us.real)
uim = np.asarray(us.im) if hasattr(us, "im") else np.asarray(us.imag)
u_sc = ure + 1j * uim
x_np = np.asarray(x)
u_in = np.exp(1j * K0 * x_np[0])
res = np.abs(u_in + u_sc)
print(f"sound-soft BC residual: max {res.max():.3e}  mean {res.mean():.3e}  (|u_in|=1)")

"""TPU probe: rotation+coaxial (fixed degree-block mask) vs band scan at
bench scale (n_end=32, 24 distinct lattice offsets, k=8), high precision."""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.translation import translation_matrix

N_END = 32
K0 = 8.0

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers = np.stack([xx.ravel(), yy.ravel(), np.zeros(16)], axis=1)
diff = centers[:, None, :] - centers[None, :, :]
offs = np.unique(diff.reshape(-1, 3), axis=0)
offs = offs[np.linalg.norm(offs, axis=1) > 1e-9]
print(f"{len(offs)} distinct offsets, |t| in [{np.linalg.norm(offs,axis=1).min():.2f}, {np.linalg.norm(offs,axis=1).max():.2f}]")

t = jnp.asarray(offs.T, dtype=jnp.float32)
k = jnp.full((len(offs),), K0, dtype=jnp.float32)

f_rot = jax.jit(lambda t_, k_: translation_matrix(c, t_, N_END, k_, kind="SR", method="rotation"))
f_band = jax.jit(lambda t_, k_: translation_matrix(c, t_, N_END, k_, kind="SR", method="triplet"))

o_rot = f_rot(t, k)
jax.block_until_ready(o_rot)
t0 = time.perf_counter()
o_rot = f_rot(t, k)
jax.block_until_ready(o_rot)
t_rot = time.perf_counter() - t0

o_band = f_band(t, k)
jax.block_until_ready(o_band)
t0 = time.perf_counter()
o_band = f_band(t, k)
jax.block_until_ready(o_band)
t_band = time.perf_counter() - t0

a = o_rot.to_numpy()
b = o_band.to_numpy()
rel = np.abs(a - b) / (np.abs(b).max(axis=-1, keepdims=True) + 1e-30)
print(f"rotation: {t_rot:.3f} s   band-scan: {t_band:.3f} s   speedup {t_band/t_rot:.1f}x")
print(f"rel (row-max normalized) max: {rel.max():.3e}  finite: {np.isfinite(a).all()}")

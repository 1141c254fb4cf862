"""uscat field-evaluation stage breakdown at the bench config.

Times, per evaluation chunk: (a) full uscat, (b) harmonics-only,
(c) radial (spherical_jh_all) only, (d) from_cartesian only, plus the
chunk-size sensitivity.  Run: python -m tools.uscat_profile
"""

import os
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

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types, from_cartesian
from biem_helmholtz_sphere_tpu.harmonics import harmonics
from biem_helmholtz_sphere_tpu.special import spherical_jh_all

N_END = 32
K0 = 8.0
B = 16

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers = jnp.asarray(
    np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1), jnp.float32
)
radii = jnp.ones(B, jnp.float32)
direction = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

uin, _ = plane_wave(k=jnp.float32(K0), direction=direction)
calc = biem(
    c, centers=centers, radii=radii, k=jnp.float32(K0), n_end=N_END, uin=uin
)
jax.block_until_ready(calc.density)

rng = np.random.default_rng(0)


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{label}: {dt*1e3:8.2f} ms")
    return dt


for chunk in (2048, 8192, 32768):
    x = jnp.asarray(rng.normal(size=(3, chunk)).astype(np.float32) * 20.0)

    full = jax.jit(lambda xc: calc.uscat(xc))
    t_full = timeit(f"uscat        chunk={chunk:6d}", full, x)

    def harm_only(xc):
        rel = xc[:, :, None] - jnp.moveaxis(centers, -1, 0)[:, None, :]
        sph = from_cartesian(c, rel)
        return harmonics(c, sph, N_END)

    t_h = timeit(f"  harmonics  chunk={chunk:6d}", jax.jit(harm_only), x)

    def radial_only(xc):
        rel = xc[:, :, None] - jnp.moveaxis(centers, -1, 0)[:, None, :]
        r = jnp.sqrt(jnp.sum(rel * rel, axis=0))
        return spherical_jh_all(3, N_END, K0 * r)[2]

    t_r = timeit(f"  radial     chunk={chunk:6d}", jax.jit(radial_only), x)

    def sph_only(xc):
        rel = xc[:, :, None] - jnp.moveaxis(centers, -1, 0)[:, None, :]
        sph = from_cartesian(c, rel)
        return sph["r"] + sph[c.root.nid]

    t_s = timeit(f"  from_cart  chunk={chunk:6d}", jax.jit(sph_only), x)
    print(
        f"  -> pts/s {chunk/t_full:.3e}  (harm {100*t_h/t_full:.0f}%, "
        f"radial {100*t_r/t_full:.0f}%, from_cart {100*t_s/t_full:.0f}%)"
    )

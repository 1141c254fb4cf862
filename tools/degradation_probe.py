"""Verify the axon captured-buffer dispatch degradation is gone.

A jitted program that captures an eager DEVICE array degrades every
subsequent dispatch in the session to ~27 ms (BENCH_NOTES.md).  After
converting all cached tables to host numpy (HLO literals), running the
full bench-scale solve must leave a tiny canary program's dispatch time
unchanged.  Run: timeout 1500 python tools/degradation_probe.py
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

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types


def timeit(f, *a, n=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n


def lattice_centers(n_side, spacing, d=3):
    g = (np.arange(n_side) - (n_side - 1) / 2) * spacing
    xx, yy = np.meshgrid(g, g)
    centers = np.zeros((n_side * n_side, d))
    centers[:, 0] = xx.ravel()
    centers[:, 1] = yy.ravel()
    return centers


def main():
    canary = jax.jit(jnp.sin)
    xc = jnp.ones((16,))
    print(f"canary before: {timeit(canary, xc) * 1000:.2f} ms", flush=True)

    c = create_from_branching_types("ba")
    centers = lattice_centers(4, 4.0).astype(np.float32)
    radii = np.ones(16, np.float32)
    direction = np.array([1.0, 0.0, 0.0], np.float32)

    def solve_step(k):
        uin, _ = plane_wave(k=k, direction=direction)
        calc = biem(c, centers=centers, radii=radii, k=k, n_end=32, uin=uin)
        return calc.density

    f = jax.jit(solve_step)
    t0 = time.perf_counter()
    f(jnp.float32(8.0)).block_until_ready()
    print(f"bench-scale compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
    t = timeit(f, jnp.float32(8.0), n=5)
    print(f"bench-scale per-k: {t:.4f} s", flush=True)
    print(f"canary after : {timeit(canary, xc) * 1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Probe: per-k cost of (a) scalar-k loop with per-call block, (b) scalar-k
loop enqueue-all-then-block, (c) vmapped k-block of 2/3/4 — at the bench
config (n_end=32, B=16, 3D 'ba', GMRES).  Run on an IDLE host.
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

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

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


c = create_from_branching_types("ba")
centers = lattice_centers(N_SIDE, SPACING).astype(np.float32)
radii = np.ones(N_SIDE * N_SIDE, dtype=np.float32)
direction = np.array([1.0, 0.0, 0.0], dtype=np.float32)


def solve_step(k):
    uin, _ = plane_wave(k=k, direction=direction)
    calc = biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin)
    return calc.density


solve_jit = jax.jit(solve_step)
# force sync dispatch mode up front (BENCH_NOTES: one early readback)
np.asarray(solve_jit(jnp.float32(K0)).real[0, 0])

# (a) scalar loop, per-call block
ks = np.linspace(K0 - 0.25, K0 + 0.25, 3).astype(np.float32)
t0 = time.perf_counter()
for kk in ks:
    solve_jit(jnp.float32(kk)).block_until_ready()
print(f"(a) scalar per-call block : {(time.perf_counter()-t0)/len(ks):.4f} s/k")

# (b) scalar loop, enqueue all then block once
t0 = time.perf_counter()
outs = [solve_jit(jnp.float32(kk)) for kk in ks]
for o in outs:
    o.block_until_ready()
print(f"(b) scalar enqueue-then-block: {(time.perf_counter()-t0)/len(ks):.4f} s/k")

# (c) vmapped k-blocks
for blk in (2, 3):
    kb = np.linspace(K0 - 0.25, K0 + 0.25, blk).astype(np.float32)
    vstep = jax.jit(jax.vmap(solve_step))
    try:
        out = vstep(jnp.asarray(kb))
        out.block_until_ready()
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            vstep(jnp.asarray(kb)).block_until_ready()
        dt = (time.perf_counter() - t0) / reps / blk
        print(f"(c) vmap k-block={blk}       : {dt:.4f} s/k")
    except Exception as e:
        print(f"(c) vmap k-block={blk} FAILED: {type(e).__name__}: {e}")
        break

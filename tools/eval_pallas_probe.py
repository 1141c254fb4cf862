"""A/B the Pallas fused-eval kernel vs the XLA scan on the real chip.

Bench eval harness (B=16, n_end=32, 2^17 points, chunked lax.map),
best-of-5, for BHS_PALLAS_EVAL in {0, 1} x chunk sizes.  Also checks
the two paths agree numerically on-device.
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

from biem_helmholtz_sphere_tpu.biem import biem, plane_wave
from biem_helmholtz_sphere_tpu.cli._accuracy import lattice_centers
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

EVAL_POINTS = 1 << 17

c = create_from_branching_types("ba")
centers = np.concatenate([lattice_centers(4, 2), np.zeros((16, 1))], axis=1)
radii = jnp.ones(16)
k = jnp.float32(8.0)
uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0, 0.0]))
calc = biem(c, centers=centers, radii=radii, k=k, n_end=32, uin=uin)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(3, EVAL_POINTS)).astype(np.float32) * 20.0)

chunks = [int(s) for s in os.environ.get("PROBE_CHUNKS", "16384").split(",")]
vals = {}
for use_pallas in ("0", "1"):
    os.environ["BHS_PALLAS_EVAL"] = use_pallas
    for chunk in chunks:

        def eval_chunked(calc_, xx):
            xs = xx.reshape(3, -1, chunk)
            xs = jnp.moveaxis(xs, 1, 0)
            return jax.lax.map(lambda xc: calc_.uscat(xc), xs)

        ej = jax.jit(eval_chunked)
        out = ej(calc, x)
        out.re.block_until_ready()
        vals[(use_pallas, chunk)] = np.asarray(out.re) + 1j * np.asarray(
            out.im
        )
        dt = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            ej(calc, x).re.block_until_ready()
            dt = min(dt, time.perf_counter() - t0)
        print(
            f"pallas={use_pallas} chunk={chunk:6d}: "
            f"{EVAL_POINTS / dt:.3e} pts/s ({dt * 1e3:.1f} ms)",
            flush=True,
        )

for chunk in chunks:
    a = vals[("0", chunk)].ravel()
    b = vals[("1", chunk)].ravel()
    fin = np.isfinite(a)
    rel = np.abs(b[fin] - a[fin]).max() / np.abs(a[fin]).max()
    print(f"chunk={chunk}: pallas vs xla on-device rel err {rel:.3e}")

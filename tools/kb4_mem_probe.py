"""Where does the KB=4 k-blocked bench OOM? (VERDICT r2 item 5)

AOT-compiles the bench.py block_step at several k-block sizes and prints
XLA's compiled memory analysis (no execution), to locate the
[KB, 16384, 16384] temporaries — BENCH_NOTES.md says ~3 of them (matrix
re, im, one transposed-layout copy) put KB=4 past the 15.75G v5e HBM.

Usage: PROBE_KBS=2,4 python tools/kb4_mem_probe.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "high")
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

N_END = 32
N_SIDE = 4
SPACING = 4.0


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
nb = len(centers)

for kb in [int(s) for s in os.environ.get("PROBE_KBS", "2,4").split(",")]:
    centers_b = np.broadcast_to(centers, (kb, nb, 3))
    radii_b = np.broadcast_to(radii, (kb, nb))
    dir_b = np.broadcast_to(direction[:, None], (3, kb))

    def block_step(k):
        uin, _ = plane_wave(k=k, direction=dir_b)
        calc = biem(
            c, centers=centers_b, radii=radii_b, k=k, n_end=N_END, uin=uin
        )
        u0 = calc.uscat(jnp.zeros((3, 1)))
        return u0.re.reshape(kb), u0.im.reshape(kb)

    kwarm = np.linspace(7.5, 7.6, kb).astype(np.float32)
    lowered = jax.jit(block_step).lower(jnp.asarray(kwarm))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"KB={kb}:")
    print(f"  {ma}")
    gib = 1 << 30
    for attr in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(ma, attr, None)
        if v is not None:
            print(f"  {attr}: {v / gib:.2f} GiB")
    print(flush=True)

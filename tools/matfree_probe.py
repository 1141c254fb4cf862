"""TPU probe: matrix-free matvec time + GMRES convergence at bench config."""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    _check_biem_inputs,
    _matfree_operator,
    _rhs_expansion,
)
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
k = jnp.float32(K0)

centers_, radii_, k_, eta_, alpha_, beta_ = _check_biem_inputs(
    c, centers, radii, k, None, 1.0, 0.0
)
uin, _ = plane_wave(k=k, direction=direction)
f = _rhs_expansion(c, N_END, centers_, radii_, alpha_, beta_, uin, None, 0)
f2 = f.reshape((16 * 1024,))

mv, diag = _matfree_operator(
    c, N_END, np.asarray(centers_), radii_, k_, eta_, alpha_, beta_, None
)

mv_jit = jax.jit(mv)
y = mv_jit(f2)
jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(20):
    y = mv_jit(y)
jax.block_until_ready(y)
t_mv = (time.perf_counter() - t0) / 20
print(f"matfree matvec: {t_mv*1e3:.2f} ms")

# GMRES convergence: relative residual after k iterations, manual restart-free
def solve(nit):
    import jax.scipy.sparse.linalg as spla

    x, _ = spla.gmres(
        mv, f2, tol=1e-6, atol=0.0, restart=nit, maxiter=nit,
        M=lambda z: z / diag, solve_method="batched",
    )
    return x

for nit in (24, 48, 96):
    sj = jax.jit(lambda f_, n=nit: solve(n))
    x = sj(f2)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = sj(f2)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    r = mv_jit(x) - C.of(f2) if False else None
    rr = mv(x)
    num = float(abs(rr - f).reshape(-1).re.max()) if hasattr(abs(rr - f), "re") else None
    res = abs(rr - C(f2.re if hasattr(f2, "re") else None, None)) if False else None
    # residual norm
    dr = rr - f.reshape((16 * 1024,))
    rn = float(jnp.sqrt((dr.re**2 + dr.im**2).sum()))
    bn = float(jnp.sqrt((f2.re**2 + f2.im**2).sum())) if hasattr(f2, "re") else float(jnp.sqrt((f.re.reshape(-1)**2 + f.im.reshape(-1)**2).sum()))
    print(f"gmres {nit:3d} iters: {dt:.3f} s  rel residual {rn/bn:.3e}")

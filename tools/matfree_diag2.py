"""Which in-jit operator is wrong? Apply BOTH the matfree mv and the
dense matvec (tables built inside one jit program) to the CPU-f64 truth
density and to the rhs; report residuals + per-degree deviation profile.
"""
import os
import time

import numpy as np
import jax

# persistent cache DISABLED: probing for stale-cache poisoning
jax.config.update("jax_default_matmul_precision", "high")

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    _assemble,
    _check_biem_inputs,
    _matfree_operator,
    _rhs_expansion,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.harmonics._index import basis
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C

N_END = 32
K0 = 8.0
B = 16
H = N_END * N_END
N = B * H

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1).astype(
    np.float32
)
centers = jnp.asarray(centers_np)
radii = jnp.ones(B, dtype=jnp.float32)
k = jnp.float32(K0)
direction = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)

centers_, radii_, k_, eta_, alpha_, beta_ = _check_biem_inputs(
    c, centers, radii, k, None, 1.0, 0.0
)
uin, _ = plane_wave(k=k, direction=direction)

truth_np = np.load("/tmp/density_cpu64.npz")["density"].reshape(-1)
truth = C(
    jnp.asarray(truth_np.real.astype(np.float32)),
    jnp.asarray(truth_np.imag.astype(np.float32)),
)


@jax.jit
def diag_fn(xt):
    f = _rhs_expansion(c, N_END, centers_, radii_, alpha_, beta_, uin, None, 0)
    f2 = f.reshape((N,))
    mv, dg = _matfree_operator(
        c, N_END, centers_np, radii_, k_, eta_, alpha_, beta_, None
    )
    m = _assemble(c, N_END, centers_, radii_, k_, eta_, alpha_, beta_, None)
    m2 = m.reshape((N, N))

    y_mf = mv(xt)
    y_dn = cplx.einsum("ij,j->i", m2, xt)

    def nrm(z):
        return jnp.sqrt(jnp.sum(z.abs2()))

    dev = (y_mf - y_dn).abs2().reshape(B, H)  # per (ball, harm)
    return (
        nrm(y_mf - f2) / nrm(f2),
        nrm(y_dn - f2) / nrm(f2),
        nrm(y_mf - y_dn) / nrm(y_dn),
        jnp.sqrt(jnp.sum(dev, axis=1)),  # per-ball deviation
        jnp.sqrt(jnp.sum(dev, axis=0)),  # per-harm deviation
        nrm(f2),
    )


t0 = time.perf_counter()
out = [np.asarray(v) for v in diag_fn(truth)]
print(f"({time.perf_counter() - t0:.1f}s)")
print(f"||mv(truth)-f||/||f||    = {out[0]:.3e}   <- matfree operator residual")
print(f"||dense(truth)-f||/||f|| = {out[1]:.3e}   <- dense operator residual")
print(f"||mv-dense||/||dense||   = {out[2]:.3e}")
b_ = basis(c, N_END)
n_root = np.asarray(b_.n_root)
per_harm = out[4]
per_deg = np.zeros(N_END)
for n in range(N_END):
    sel = n_root == n
    per_deg[n] = np.sqrt((per_harm[sel] ** 2).sum())
print("per-ball dev:", np.array2string(out[3], precision=2))
print("per-degree dev:", np.array2string(per_deg, precision=2))

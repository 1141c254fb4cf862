"""Probe: bf16-stored matrix for the GMRES matvec (halves HBM traffic)
with f32 outer iterative refinement.  Measures per-k time and TRUE f32
residual at the bench config vs the plain f32 GMRES.

Run: python -m tools.bf16_gmres_probe
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

from biem_helmholtz_sphere_tpu import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    _assemble,
    _check_biem_inputs,
    _rhs_expansion,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C

N_END = 32
K0 = 8.0
B = 16
N = B * N_END * N_END

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers = jnp.asarray(
    np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1), jnp.float32
)
radii = jnp.ones(B, jnp.float32)
direction = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)


def setup(k):
    uin, _ = plane_wave(k=k, direction=direction)
    centers_, radii_, k_, eta_, alpha_, beta_ = _check_biem_inputs(
        c, centers, radii, k, None, 1.0, 0.0
    )
    f = _rhs_expansion(c, N_END, centers_, radii_, alpha_, beta_, uin, None, 0)
    f2 = f.reshape((N,))
    m = _assemble(c, N_END, centers_, radii_, k_, eta_, alpha_, beta_, None)
    m2 = m.reshape((N, N))
    return m2, f2


def nrm(z):
    return jnp.sqrt(jnp.sum(z.abs2()))


def true_res(m2, f2, x):
    r = cplx.einsum("ij,j->i", m2, x) - f2
    return nrm(r) / nrm(f2)


def plain(k):
    m2, f2 = setup(k)
    x = cplx.gmres_solve(m2, f2)
    return x, true_res(m2, f2, x)


def bf16_ir(k, n_outer=2, restart=24, maxiter=20):
    m2, f2 = setup(k)
    mlow = C(m2.re.astype(jnp.bfloat16), m2.im.astype(jnp.bfloat16))
    d = C(
        jnp.diagonal(m2.re, axis1=-2, axis2=-1),
        jnp.diagonal(m2.im, axis1=-2, axis2=-1),
    )

    def mv(x):
        # bf16 storage; accumulate f32 (einsum with preferred f32 output)
        def e(a, b):
            return jnp.einsum(
                "ij,j->i", a, b, preferred_element_type=jnp.float32
            )
        xr = x.re.astype(jnp.bfloat16)
        xi = x.im.astype(jnp.bfloat16)
        t1 = e(mlow.re, xr)
        t2 = e(mlow.im, xi)
        t3 = e(mlow.re + mlow.im, xr + xi)
        return C(t1 - t2, t3 - t1 - t2)

    x = cplx.gmres_solve_op(mv, d, f2, restart=restart, maxiter=maxiter)
    for _ in range(n_outer - 1):
        r = f2 - cplx.einsum("ij,j->i", m2, x)
        dx = cplx.gmres_solve_op(mv, d, r, restart=restart, maxiter=maxiter)
        x = x + dx
    return x, true_res(m2, f2, x)


def run(label, fn):
    jf = jax.jit(fn)
    x, res = jf(jnp.float32(K0))
    jax.block_until_ready(x)
    ts = []
    for kk in (7.9, 8.0, 8.1):
        t0 = time.perf_counter()
        x, res = jf(jnp.float32(kk))
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: per-k {np.mean(ts):.3f}s  true rel residual {float(res):.3e}")


if __name__ == "__main__":
    run("plain f32 gmres        ", plain)
    run("bf16 matvec, 1 outer   ", lambda k: bf16_ir(k, n_outer=1))
    run("bf16 matvec, 2 outer   ", lambda k: bf16_ir(k, n_outer=2))
    run("bf16 mv r12 mi4 2outer ", lambda k: bf16_ir(k, n_outer=2, restart=12, maxiter=4))

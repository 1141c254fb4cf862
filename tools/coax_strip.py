"""Strip-down bisect of coaxial_sr: which sub-expression degrades axon
dispatch?  Usage: python tools/coax_strip.py v0|v1|...|v5
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

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.special._family import spherical_jh_all
from biem_helmholtz_sphere_tpu.translation._ops import _a_const
from biem_helmholtz_sphere_tpu.translation._rotation import _coax_tables


def timeit(f, *a, n=10):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n


canary = jax.jit(jnp.sin)
xc = jnp.ones((16,))


def can(tag):
    print(f"canary [{tag}]: {timeit(canary, xc, n=20) * 1000:.2f} ms", flush=True)


which = sys.argv[1]
c = create_from_branching_types("ba")
n_end = 6
d = 3
zf, w, tz, t_cols, ell, cs = _coax_tables(c, n_end, False)
n_bands = 2 * n_end - 1
rdt = jnp.float32


def make_step(level):
    def step(r, k):
        zfj = zf.astype(rdt)
        wj = w.astype(rdt)
        tzj, tcj, ellj, csj = jax.lax.optimization_barrier(
            (
                jnp.asarray(tz.astype(rdt)),
                jnp.asarray(t_cols.astype(rdt)),
                jnp.asarray(ell),
                jnp.asarray(cs),
            )
        )
        acc = tzj.sum() + tcj.sum() + r.sum() + k
        if level == 0:
            return acc
        u = jnp.einsum("qn,qa,qb->nab", tzj * wj[:, None], tcj, tcj)
        lsum = ellj[:, None] + ellj[None, :]
        u = jnp.where(lsum[None] >= jnp.arange(n_bands)[:, None, None], u, 0.0)
        if level == 1:
            return acc + u.sum()
        z = k * r
        jf, _, hf, _ = spherical_jh_all(d, n_bands, z)
        coef = cplx.ipow(np.arange(n_bands)) * (_a_const(d) * zfj) * hf
        if level == 2:
            return acc + u.sum() + coef.re.sum() + coef.im.sum()
        m = cplx.C(
            jnp.einsum("...n,nab->...ab", coef.re, u),
            jnp.einsum("...n,nab->...ab", coef.im, u),
        )
        if level == 3:
            return acc + m.re.sum() + m.im.sum()
        p = cplx.ipow_device(ellj, rdt)
        m = (m * p[:, None]) * p.conj()[None, :]
        if level == 4:
            return acc + m.re.sum() + m.im.sum()
        mask = csj[:, None] == csj[None, :]
        m = cplx.where(mask, m, cplx.C.of(0.0))
        return acc + m.re.sum() + m.im.sum()

    return step


can("start")
lvl = int(which[1:])
f = jax.jit(make_step(lvl))
r = jnp.asarray(np.array([4.0], np.float32))
t = timeit(f, r, jnp.float32(1.0))
print(f"{which}: {t * 1000:.3f} ms", flush=True)
can("end")

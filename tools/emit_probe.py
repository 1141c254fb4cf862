"""Probe: assembly emit strategies at the bench config.

(old) gather [B,B',H,H'] + scalings -> moveaxis -> +diag-masked add
(new) one advanced-index gather emitting [B,H,B',H'] directly, scalings
      pre-arranged in that layout, diagonal fused into the same pass.

Checks bit-level agreement and times both (idle host).
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

from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C

B, H, NO = 16, 1024, 24
rng = np.random.default_rng(0)

folded = C(
    jnp.asarray(rng.normal(size=(NO, H, H)).astype(np.float32)),
    jnp.asarray(rng.normal(size=(NO, H, H)).astype(np.float32)),
)
reg = C(
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
)
blcc = C(
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
)
diag_v = C(
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
    jnp.asarray(rng.normal(size=(B, H)).astype(np.float32)),
)
sgn_np = 1.0 - 2.0 * (rng.integers(0, 2, size=H)).astype(np.float32)
sgn = jnp.asarray(sgn_np)

bu, bv = np.triu_indices(B, k=1)
ids = rng.integers(0, NO, size=len(bu))
pid = np.zeros((B, B), np.int32)
pid[bu, bv] = ids
pid[bv, bu] = ids
lower = np.tril(np.ones((B, B), dtype=bool), k=-1)
offdiag = ~np.eye(B, dtype=bool)


def old():
    rdt = jnp.float32
    sgn_or_1 = jnp.where(jnp.asarray(lower)[..., None], sgn, 1.0)
    rowm = (reg[..., :, None, :] * sgn_or_1) * jnp.asarray(offdiag, dtype=rdt)[
        ..., None
    ]
    colm = blcc[..., None, :, :] * sgn_or_1
    a_off = (rowm[..., None] * cplx.take(folded, pid, axis=-3)) * colm[..., None, :]
    a_t = cplx.moveaxis(a_off, -2, -3)
    ib = jax.lax.optimization_barrier(jnp.arange(B, dtype=jnp.int32))
    ih = jax.lax.optimization_barrier(jnp.arange(H, dtype=jnp.int32))
    mask = (ib[:, None, None, None] == ib[None, None, :, None]) & (
        ih[None, :, None, None] == ih[None, None, None, :]
    )
    dv = diag_v[..., :, :, None, None]
    return a_t + cplx.where(mask, cplx.broadcast_to(dv, a_t.shape), C.of(0.0))


def new():
    rdt = jnp.float32
    # row factor in [B, H, B'] layout; col factor in [B, 1, B', H']
    sgn_or_1 = jnp.where(jnp.asarray(lower)[:, None, :], sgn[None, :, None], 1.0)
    rowm = (reg[..., :, :, None] * sgn_or_1) * jnp.asarray(offdiag, dtype=rdt)[
        :, None, :
    ]  # [B, H, B']
    colm_s = jnp.where(
        jnp.asarray(lower)[:, None, :, None], sgn[None, None, None, :], 1.0
    )  # [B, 1, B', H']
    colm = blcc[..., None, None, :, :] * colm_s
    # one gather emitting [B, H, B', H'] directly
    pidx = jnp.asarray(pid)[:, None, :]  # [B, 1, B']
    hidx = jnp.arange(H)[None, :, None]  # [1, H, 1]
    g = folded[pidx, hidx]  # [B, H, B', H']
    ib = jax.lax.optimization_barrier(jnp.arange(B, dtype=jnp.int32))
    ih = jax.lax.optimization_barrier(jnp.arange(H, dtype=jnp.int32))
    mask = (ib[:, None, None, None] == ib[None, None, :, None]) & (
        ih[None, :, None, None] == ih[None, None, None, :]
    )
    dv = diag_v[..., :, :, None, None]
    out = (g * rowm[..., None]) * colm
    return out + cplx.where(mask, cplx.broadcast_to(dv, out.shape), C.of(0.0))


jo = jax.jit(old)
jn = jax.jit(new)
a = jo()
b = jn()
np.asarray(a.re[0, 0, 0, :2])  # force sync mode
err = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
print("max abs diff:", err)
if err != 0.0:
    print("FAIL: old() and new() emit paths disagree (expected bit-identical)")
    raise SystemExit(1)

for name, f in (("old", jo), ("new", jn)):
    f().block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        f().block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

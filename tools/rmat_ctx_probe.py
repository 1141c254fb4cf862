"""Context-dependence reproducer: batch rmat vs lax.map rmat in ONE jit."""
import os
import numpy as np
import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import (
    create_from_branching_types,
    from_cartesian,
    to_cartesian,
)
from biem_helmholtz_sphere_tpu.translation._rotation import (
    _root_axis,
    _rotation_to_axis,
)

c = create_from_branching_types("ba")
axis = _root_axis(c)

B = 16
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1)
bu, bv = np.triu_indices(B, k=1)
t_np = np.round(centers_np[bu] - centers_np[bv], 12)
uniq, _ = np.unique(t_np, axis=0, return_inverse=True)
NO = len(uniq)


@jax.jit
def probe_a():
    """t_hat from the device roundtrip (as in sr_rotation)."""
    t24 = jnp.moveaxis(jnp.asarray(uniq), -1, 0)
    sph = from_cartesian(c, t24)
    tc = to_cartesian(c, {**sph, "r": jnp.ones_like(sph["r"])})
    t_hat = jnp.moveaxis(tc, 0, -1).astype(jnp.float32)
    r24 = _rotation_to_axis(t_hat, axis, 3)
    r_ch = jax.lax.map(
        lambda th: _rotation_to_axis(th, axis, 3), t_hat.reshape((NO, 1, 3))
    ).reshape(r24.shape)
    return r24, r_ch, t_hat


@jax.jit
def probe_b(t_hat):
    """t_hat as a program input."""
    r24 = _rotation_to_axis(t_hat, axis, 3)
    r_ch = jax.lax.map(
        lambda th: _rotation_to_axis(th, axis, 3), t_hat.reshape((NO, 1, 3))
    ).reshape(r24.shape)
    return r24, r_ch


@jax.jit
def probe_c():
    """t_hat = t/|t| directly, no spherical roundtrip."""
    t24 = jnp.asarray(uniq).astype(jnp.float32)  # [NO, 3]
    t_hat = t24 / jnp.linalg.norm(t24, axis=-1, keepdims=True)
    r24 = _rotation_to_axis(t_hat, axis, 3)
    r_ch = jax.lax.map(
        lambda th: _rotation_to_axis(th, axis, 3), t_hat.reshape((NO, 1, 3))
    ).reshape(r24.shape)
    return r24, r_ch


r24, r_ch, t_hat = probe_a()
print("A (roundtrip t_hat): max diff", float(jnp.max(jnp.abs(r24 - r_ch))))
th_np = np.asarray(t_hat)
r24b, r_chb = probe_b(jnp.asarray(th_np))
print("B (input t_hat):     max diff", float(jnp.max(jnp.abs(r24b - r_chb))))
print("t_hat finite:", np.isfinite(th_np).all(), " norms:",
      np.abs(np.linalg.norm(th_np, axis=1) - 1).max())

r24c, r_chc = probe_c()
print("C (t/|t| in-program): max diff", float(jnp.max(jnp.abs(r24c - r_chc))))
import numpy as _np
ref = np_ref = None

"""TPU probe: translation_matrix on 48 offsets at once vs lax.map
chunks of 16 — are the values the same?"""
import numpy as np
import jax

import os
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "high")
import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.translation._ops import translation_matrix

N_END = 32
K0 = 8.0
B = 16

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1).astype(
    np.float32
)
bu, bv = np.triu_indices(B, k=1)
t_np = np.round(centers_np[bu] - centers_np[bv], 12)
uniq, _ = np.unique(t_np, axis=0, return_inverse=True)
NO = len(uniq)  # 24 for the 4x4 lattice
k = jnp.float32(K0)


@jax.jit
def probe():
    t48 = jnp.moveaxis(jnp.asarray(uniq), -1, 0)  # [3, NO]
    sr48 = translation_matrix(c, t48, N_END, k[..., None], kind="SR")

    # exact dense-path chunking: pad to a multiple of 16, lax.map
    pad = 2 * 16 - NO
    t_pad = jnp.concatenate([t48, jnp.repeat(t48[..., :1], pad, axis=-1)], axis=-1)
    t_chunks = jnp.moveaxis(t_pad.reshape((3, 2, 16)), 1, 0)

    def one(tc):
        return translation_matrix(c, tc, N_END, k[..., None], kind="SR")

    src = jax.lax.map(one, t_chunks)  # C [2, 16, H, H]
    srch = src.reshape((32,) + src.shape[-2:])[:NO]

    d2 = (sr48 - srch).abs2()
    per_off = jnp.sqrt(jnp.sum(d2, axis=(-2, -1)))
    mag = jnp.sqrt(jnp.sum(srch.abs2(), axis=(-2, -1)))
    return per_off, mag, jnp.max(abs(sr48 - srch)), jnp.max(abs(srch))


po, mag, dmax, mmax = [np.asarray(v) for v in probe()]
print("max |diff| =", dmax, "  max |sr| =", mmax)
print("per-offset rel:", np.array2string(po / mag, precision=2))

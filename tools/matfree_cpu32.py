"""CPU float32: matfree mv applied to the f64 truth — isolates whether
the 39% TPU deviation is an f32-formulation problem or a backend bug."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    _check_biem_inputs,
    _matfree_operator,
    _rhs_expansion,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops.cplx import C

N_END = 32
K0 = 8.0
B = 16
N = B * N_END * N_END

c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(B)], axis=1).astype(
    np.float32
)
centers = jnp.asarray(centers_np)
radii = jnp.ones(B, dtype=jnp.float32)
k = jnp.float32(K0)
uin, _ = plane_wave(
    k=k, direction=jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
)
centers_, radii_, k_, eta_, alpha_, beta_ = _check_biem_inputs(
    c, centers, radii, k, None, 1.0, 0.0
)

truth_np = np.load("/tmp/density_cpu64.npz")["density"].reshape(-1)
truth = C(
    jnp.asarray(truth_np.real.astype(np.float32)),
    jnp.asarray(truth_np.imag.astype(np.float32)),
)


@jax.jit
def resid(xt):
    f = _rhs_expansion(c, N_END, centers_, radii_, alpha_, beta_, uin, None, 0)
    f2 = f.reshape((N,))
    mv, _ = _matfree_operator(
        c, N_END, centers_np, radii_, k_, eta_, alpha_, beta_, None
    )
    r = mv(xt) - f2

    def nrm(z):
        return jnp.sqrt(jnp.sum(z.abs2()))

    return nrm(r) / nrm(f2)


print(f"CPU f32 ||mv(truth)-f||/||f|| = {float(resid(truth)):.3e}")

"""CPU f64 ground truth for the bench config (matfree GMRES, tol 1e-11)."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

N_END = 32; K0 = 8.0
c = create_from_branching_types("ba")
g = (np.arange(4) - 1.5) * 4.0
xx, yy = np.meshgrid(g, g)
centers_np = np.stack([xx.ravel(), yy.ravel(), np.zeros(16)], axis=1)
centers = jnp.asarray(centers_np)
radii = jnp.ones(16)
k = jnp.asarray(K0)
uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0, 0.0]))
calc = biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin, solver="gmres")
d = calc.density.to_numpy()
np.savez("/tmp/density_cpu64.npz", density=d)
print("saved; finite:", np.isfinite(d).all())

# f64 BC residual of the f64 density
rng = np.random.default_rng(7)
pts = []
for bb in (0, 5, 10, 15):
    v = rng.normal(size=(3, 64))
    v /= np.linalg.norm(v, axis=0)
    pts.append(centers_np[bb][:, None] + 1.0000005 * v)
x = jnp.asarray(np.concatenate(pts, axis=1))
us = calc.uscat(x).to_numpy()
res = np.abs(np.exp(1j*K0*np.asarray(x)[0]) + us)
print(f"CPU f64 BC residual: max {res.max():.3e} mean {res.mean():.3e}")

# and of the TPU density, evaluated in f64
try:
    dt = np.load("/tmp/density_tpu.npz")["gmres"]
    from biem_helmholtz_sphere_tpu.ops.cplx import C
    calc2 = calc.__class__(**{**calc.__dict__, "density": C.of(jnp.asarray(dt))})
    us2 = calc2.uscat(x).to_numpy()
    res2 = np.abs(np.exp(1j*K0*np.asarray(x)[0]) + us2)
    print(f"TPU density, f64 eval BC residual: max {res2.max():.3e} mean {res2.mean():.3e}")
    print("TPU vs CPU density rel err:", np.abs(dt - d).max() / np.abs(d).max())
except Exception as e:
    print("tpu density compare skipped:", e)

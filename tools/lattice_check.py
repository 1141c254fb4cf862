"""Quick correctness check: lattice_operator vs _matfree_operator."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from biem_helmholtz_sphere_tpu.biem import _core
from biem_helmholtz_sphere_tpu.biem._lattice import lattice_operator, lattice_routing
from biem_helmholtz_sphere_tpu.cli._accuracy import lattice_centers
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.harmonics._index import basis
from biem_helmholtz_sphere_tpu.ops.cplx import C

rng = np.random.default_rng(0)

for btype, d, n_side, n_end, method in [
    ("a", 2, 2, 6, "triplet"),
    ("a", 2, 4, 5, "triplet"),
    ("ba", 3, 3, 4, "rotation"),
]:
    c = create_from_branching_types(btype)
    centers = lattice_centers(n_side, d)
    n_balls = centers.shape[0]
    radii = jnp.ones((n_balls,))
    k = jnp.asarray(1.3)
    eta = jnp.asarray(1.0)
    alpha = C.of(jnp.ones(()))
    beta = C.of(jnp.zeros(()))
    h_num = basis(c, n_end).num

    mv_ref, diag_ref = _core._matfree_operator(
        c, n_end, centers, radii, k, eta, alpha, beta, method
    )
    op = lattice_operator(c, n_end, centers, radii, k, eta, alpha, beta, method)[:2]
    assert op is not None, f"lattice not detected for {btype} n_side={n_side}"
    mv_lat, diag_lat = op

    x = C(
        jnp.asarray(rng.standard_normal((n_balls * h_num,))),
        jnp.asarray(rng.standard_normal((n_balls * h_num,))),
    ).astype(diag_ref.dtype)

    y_ref = jax.jit(mv_ref)(x)
    y_lat = jax.jit(mv_lat)(x)
    dd = max(
        float(jnp.abs(diag_ref.re - diag_lat.re).max()),
        float(jnp.abs(diag_ref.im - diag_lat.im).max()),
    )
    err = max(
        float(jnp.abs(y_ref.re - y_lat.re).max()),
        float(jnp.abs(y_ref.im - y_lat.im).max()),
    )
    scale = float(jnp.abs(y_ref.re).max())
    print(f"{btype} d={d} B={n_balls} n_end={n_end}: diag diff {dd:.2e}, "
          f"mv diff {err:.2e} (scale {scale:.2e})")
    assert dd == 0.0
    assert err <= 1e-4 * max(scale, 1.0), (err, scale)

# batched k
c = create_from_branching_types("a")
centers = lattice_centers(2, 2)
radii = jnp.ones((4,))
k = jnp.asarray([1.0, 2.0, 3.0])
eta = jnp.asarray(1.0)
alpha = C.of(jnp.ones(()))
beta = C.of(jnp.ones(()) * 0.5)
h_num = basis(c, 5).num
mv_ref, diag_ref = _core._matfree_operator(
    c, 5, centers, radii, k, eta, alpha, beta, "triplet"
)
op = lattice_operator(c, 5, centers, radii, k, eta, alpha, beta, "triplet")[:2]
mv_lat, diag_lat = op
x = C(
    jnp.asarray(rng.standard_normal((3, 4 * h_num))),
    jnp.asarray(rng.standard_normal((3, 4 * h_num))),
).astype(diag_ref.dtype)
y_ref = jax.jit(mv_ref)(x)
y_lat = jax.jit(mv_lat)(x)
err = max(
    float(jnp.abs(y_ref.re - y_lat.re).max()),
    float(jnp.abs(y_ref.im - y_lat.im).max()),
)
scale = float(jnp.abs(y_ref.re).max())
print(f"batched k: mv diff {err:.2e} (scale {scale:.2e})")
assert err <= 1e-4 * max(scale, 1.0)
print("OK")

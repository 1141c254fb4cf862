"""Circulant-preconditioner A/B on 2D lattices (round 4).

Measures GMRES iterations + wall time + solution agreement for the
lattice-FFT operator with Jacobi vs block-circulant preconditioning at
f64 artifact tolerances — the 256-sphere case is the BENCH_NOTES
restarted-GMRES stagnation row; 1024/4096 are the missing accuracy
family depths.
"""
import os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from biem_helmholtz_sphere_tpu.biem import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import _check_biem_inputs, _rhs_dispatch
from biem_helmholtz_sphere_tpu.biem._lattice import lattice_operator
from biem_helmholtz_sphere_tpu.cli._accuracy import lattice_centers
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx

n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_end = int(sys.argv[2]) if len(sys.argv) > 2 else 19
tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-13
restart = int(sys.argv[4]) if len(sys.argv) > 4 else 192

c = create_from_branching_types("a")
centers = lattice_centers(n_side, 2)
nb = n_side * n_side
radii = np.ones(nb)
k = jnp.asarray(1.0)
uin, _ = plane_wave(k=k, direction=np.array([1.0, 0.0]))
cen, rad, kc, eta, al, be = _check_biem_inputs(c, centers, radii, k, None, 1.0, 0.0)
f = _rhs_dispatch(c, n_end, cen, rad, al, be, uin, None, 0)
n = nb * (2 * n_end - 1)
f2 = f.reshape((n,))

for use_pre in (False, True):
    t0 = time.perf_counter()
    mv, diag, pre = lattice_operator(c, n_end, centers, rad, kc, eta, al, be,
                                     None, stable=False, precond=use_pre)
    x, rr, it = cplx.gmres_solve_op(
        mv, diag, f2, tol=tol, restart=restart, maxiter=20,
        with_info=True, precond=pre,
    )
    x.block_until_ready()
    dt = time.perf_counter() - t0
    # true residual check
    r = f2 - mv(x)
    true_rr = float(jnp.sqrt(r.abs2().sum()) / jnp.sqrt(f2.abs2().sum()))
    xb = x.reshape((nb, 2 * n_end - 1))
    print(f"precond={use_pre}: iters={int(it)} relres={float(np.max(np.asarray(rr))):.2e} "
          f"true_relres={true_rr:.2e} wall={dt:.1f}s", flush=True)

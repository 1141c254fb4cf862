"""Circulant-preconditioner A/B on 2D lattices (round 4) — RESULT:
RETIRED.  Measured (f64, k=1, tol 1e-13, long basis):
  64 balls:  Jacobi 136 iters | padded-embedding circulant 156 |
             Strang circulant 150
  256 balls: Jacobi 454 iters (45 s, restart 512, NO stagnation) |
             Strang circulant 2459 (424 s)
Per-frequency symbols are well-conditioned (smin >= 0.13), so the
failure is approximation error: the 2D Hankel kernel decays ~r^-1/2,
too slowly for circulant aliasing — wrapped offsets inject
neighbor-strength spurious couplings.  The production answer is
long-basis GMRES + warm-start continuation (tools/nballs_family4.py).
The script now measures the Jacobi (production) path only; the
circulant builder was deleted from _lattice.py (round-3 lesson: dead
losing kernels get retired, not env-gated).
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

for use_pre in (False,):
    t0 = time.perf_counter()
    mv, diag, pre = lattice_operator(c, n_end, centers, rad, kc, eta, al, be,
                                     None, stable=False)
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

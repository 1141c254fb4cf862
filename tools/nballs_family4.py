"""4096-sphere f64 depth family (round 4; VERDICT r3 next-2).

Solves the 2D 'a' 64x64-lattice rows at n_end {19, 22, 26, 32}, CPU
float64, GMRES tol 1e-13, NON-restarted long-basis GMRES (restart =
--restart, maxiter 3) with a warm-start chain across n_end (the
previous row's density, zero-padded in the harmonic axis, is an
excellent x0 at the same k).  Restarted GMRES(192) stagnated here
(docs/roadmap.md round 3); superlinear convergence needs the full
basis (BENCH_NOTES.md 256-sphere LU-vs-GMRES note).

Appends rows to accuracy/accuracy.csv in the sweep schema (incl. the
round-4 solve_relres/solve_iters columns).  Usage:
    python tools/nballs_family4.py [n_side] [restart] [n_end,n_end,...]
"""
import os, sys, time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from biem_helmholtz_sphere_tpu.biem import plane_wave
from biem_helmholtz_sphere_tpu.biem._core import (
    BIEMResultCalculator, _check_biem_inputs, _rhs_dispatch,
)
from biem_helmholtz_sphere_tpu.biem._lattice import lattice_operator
from biem_helmholtz_sphere_tpu.cli._accuracy import (
    _open_sweep_csv, lattice_centers, provenance,
)
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C

n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
restart = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
n_ends = (
    [int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
    else [19, 22, 26, 32]
)
precond = os.environ.get("BHS_FAM4_PRECOND", "0") == "1"

c = create_from_branching_types("a")
centers = lattice_centers(n_side, 2)
nb = n_side * n_side
radii = np.ones(nb)
k = jnp.asarray(1.0)
uin, _ = plane_wave(k=k, direction=np.array([1.0, 0.0]))
out_dir = os.environ.get(
    "BHS_FAM4_OUT",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "accuracy"
    ),
)
os.makedirs(out_dir, exist_ok=True)
path = os.path.join(out_dir, "accuracy.csv")

prev = None  # (n_end, density C [B, H])
fh, wr = _open_sweep_csv(path)
with fh:
    for n_end in n_ends:
        h = 2 * n_end - 1
        t0 = time.perf_counter()
        cen, rad, kc, eta, al, be = _check_biem_inputs(
            c, centers, radii, k, None, 1.0, 0.0
        )
        f = _rhs_dispatch(c, n_end, cen, rad, al, be, uin, None, 0)
        n = nb * h
        f2 = f.reshape((n,))
        mv, diag, pre = lattice_operator(
            c, n_end, centers, rad, kc, eta, al, be, None,
            stable=False, precond=precond,
        )
        x0 = None
        if prev is not None:
            n0, d0 = prev
            h0 = 2 * n0 - 1
            # the 2D flat layout is degree-major ([0, -1, 1, -2, 2, ...]),
            # so the n0 basis is a PREFIX of the n basis
            padded = C.zeros((nb, h), dtype=jnp.float64)
            padded = padded.at_set((slice(None), slice(0, h0)), d0)
            x0 = padded.reshape((n,))
        x, rr, it = cplx.gmres_solve_op(
            mv, diag, f2, tol=1e-13, restart=restart, maxiter=3,
            x0=x0, with_info=True, precond=pre,
        )
        x.block_until_ready()
        dens = x.reshape((nb, h))
        calc = BIEMResultCalculator(
            c=c, centers=cen, radii=rad, k=kc, eta=eta, density=dens,
            matrix=None, uin=None, n_end=n_end, kind="outer",
        )
        u0c = calc.uscat(jnp.zeros((2, 1)))
        u0 = complex(u0c.to_numpy().reshape(-1)[0])
        dt = time.perf_counter() - t0
        rrf = float(np.max(np.asarray(rr)))
        if not (np.isfinite(u0.real) and np.isfinite(u0.imag)):
            print(f"n_end={n_end}: NON-FINITE uscat, skipping row", flush=True)
            continue
        prov = provenance(dens, u0c)
        wr.writerow([
            "a", "n_balls", nb, 1.0, n_end, u0.real, u0.imag,
            round(dt, 4), "cpu:0", "float64", *prov,
            f"{rrf:.3e}", int(it),
        ])
        fh.flush()
        print(
            f"n_end={n_end}: u0={u0.real:.12f}{u0.imag:+.12f}j "
            f"iters={int(it)} relres={rrf:.2e} wall={dt:.0f}s",
            flush=True,
        )
        prev = (n_end, dens)
print("FAMILY4_DONE")

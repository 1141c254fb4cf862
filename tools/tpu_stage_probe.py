"""Staged TPU-backend probe after an axon-terminal wedge.

Runs progressively heavier programs, printing PASS/time for each, so a
recurrence of the remote-compile hang can be attributed to a specific
program shape.  Run WITHOUT arguments on the default (axon) backend:

    timeout 1200 python tools/tpu_stage_probe.py

Stages: device init -> tiny op -> while_loop -> scan+cond (GMRES inner
shape) -> small dense GMRES -> n_end=16 solve -> bench-scale (n_end=32,
16 balls) solve.  Each stage is independently useful: if stage N hangs,
kill the process and report stage N (the terminal usually needs
minutes-to-hours to recover after a hang — do NOT retry immediately).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def stage(name):
    print(f"[stage] {name} ...", flush=True)
    return time.perf_counter()


def done(t0):
    print(f"        PASS ({time.perf_counter() - t0:.1f}s)", flush=True)


def main():
    t0 = stage("device init")
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices(), flush=True)
    done(t0)

    t0 = stage("tiny op")
    jnp.ones(128).sum().block_until_ready()
    done(t0)

    t0 = stage("while_loop matvec")
    a = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)), jnp.float32)

    @jax.jit
    def wloop(a, b):
        def body(st):
            i, x = st
            return i + 1, a @ x * 0.01 + b

        return jax.lax.while_loop(lambda st: st[0] < 20, body, (0, b))[1]

    jax.block_until_ready(wloop(a, jnp.ones(512, jnp.float32)))
    done(t0)

    t0 = stage("scan+cond (GMRES inner shape)")
    from biem_helmholtz_sphere_tpu.ops import cplx
    from biem_helmholtz_sphere_tpu.ops.cplx import C

    rng = np.random.default_rng(0)
    n = 512
    m_np = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)) + np.eye(n) * (
        60 + 5j
    )
    b_np = rng.normal(size=(n,)) + 1j * rng.normal(size=(n,))
    ac = C(jnp.asarray(m_np.real, jnp.float32), jnp.asarray(m_np.imag, jnp.float32))
    bc = C(jnp.asarray(b_np.real, jnp.float32), jnp.asarray(b_np.imag, jnp.float32))
    x = jax.jit(lambda A, B: cplx.gmres_solve(A, B))(ac, bc)
    x.block_until_ready()
    err = float(np.abs(x.to_numpy() - np.linalg.solve(m_np, b_np)).max())
    print(f"        gmres err {err:.1e}", flush=True)
    done(t0)

    t0 = stage("n_end=16 two-sphere solve (full pipeline)")
    from biem_helmholtz_sphere_tpu import biem, plane_wave
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

    c = create_from_branching_types("ba")
    uin, _ = plane_wave(
        k=jnp.float32(1.0), direction=jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    )
    calc = biem(
        c,
        centers=jnp.asarray([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]], jnp.float32),
        radii=jnp.ones(2, jnp.float32),
        k=jnp.float32(1.0),
        n_end=16,
        uin=uin,
    )
    u0 = calc.uscat(jnp.zeros((3, 1), jnp.float32))
    u0.block_until_ready()
    print("        uscat(0) =", u0.to_numpy()[0], flush=True)
    done(t0)

    t0 = stage("bench-scale solve (n_end=32, 16 balls, GMRES)")
    g = (np.arange(4) - 1.5) * 4.0
    xx, yy = np.meshgrid(g, g)
    centers = np.zeros((16, 3), np.float32)
    centers[:, 0] = xx.ravel()
    centers[:, 1] = yy.ravel()
    uin, _ = plane_wave(
        k=jnp.float32(8.0), direction=jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    )
    with jax.default_matmul_precision("high"):
        calc = biem(
            c,
            centers=jnp.asarray(centers),
            radii=jnp.ones(16, jnp.float32),
            k=jnp.float32(8.0),
            n_end=32,
            uin=uin,
        )
        calc.density.block_until_ready()
    done(t0)
    print("ALL STAGES PASS", flush=True)


if __name__ == "__main__":
    main()

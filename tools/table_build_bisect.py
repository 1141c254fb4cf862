"""Which step of the eager (ensure_compile_time_eval) table build
degrades axon dispatch?  Each stage prints the canary after running.
Usage: python tools/table_build_bisect.py <stage>
stages: basis, rule, quad, nodetable, harm, roottable, eager_ops
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

import jax.numpy as jnp


def timeit(f, *a, n=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n


canary = jax.jit(jnp.sin)
xc = jnp.ones((16,))


def can(tag):
    print(f"canary [{tag}]: {timeit(canary, xc) * 1000:.2f} ms", flush=True)


stage = sys.argv[1]
can("start")

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

c = create_from_branching_types("ba")
n_end = 6

if stage == "basis":
    from biem_helmholtz_sphere_tpu.harmonics._index import basis

    with jax.ensure_compile_time_eval():
        b = basis(c, n_end)
        print("basis num:", b.num, flush=True)
elif stage == "rule":
    from biem_helmholtz_sphere_tpu.harmonics._quad import _node_rule

    with jax.ensure_compile_time_eval():
        th, w = _node_rule(c.root, 4 * (n_end - 1) + 2)
        print("rule:", np.asarray(th).shape, flush=True)
elif stage == "quad":
    from biem_helmholtz_sphere_tpu.harmonics._quad import sphere_quadrature

    with jax.ensure_compile_time_eval():
        sph, w = sphere_quadrature(c, 2 * (n_end - 1))
        print("quad:", np.asarray(w).shape, flush=True)
elif stage == "nodetable":
    from biem_helmholtz_sphere_tpu.harmonics._eval import _node_table
    from biem_helmholtz_sphere_tpu.harmonics._index import basis
    from biem_helmholtz_sphere_tpu.harmonics._quad import _node_rule

    with jax.ensure_compile_time_eval():
        b = basis(c, n_end)
        th, w = _node_rule(c.root, 4 * (n_end - 1) + 2)
        t = _node_table(c.root, b.node_jobs[c.root.nid], {c.root.nid: jnp.asarray(th)})
        print("nodetable:", np.asarray(t).shape, flush=True)
elif stage == "harm":
    from biem_helmholtz_sphere_tpu.harmonics._eval import harmonics
    from biem_helmholtz_sphere_tpu.harmonics._quad import sphere_quadrature

    with jax.ensure_compile_time_eval():
        sph, w = sphere_quadrature(c, 2 * (n_end - 1))
        sph_j = {k_: jnp.asarray(v) for k_, v in sph.items()}
        y = harmonics(c, sph_j, n_end)
        print("harm:", np.asarray(y.re).shape, flush=True)
elif stage == "eager_ops":
    # plain eager elementwise / einsum ops, no library code
    with jax.ensure_compile_time_eval():
        a = jnp.linspace(0.0, 1.0, 4096).reshape(64, 64)
        b = jnp.sin(a) @ jnp.cos(a)
        cc = jnp.einsum("ab,cb->ac", b, b)
        print("eager_ops:", float(cc.sum()), flush=True)

can("end")

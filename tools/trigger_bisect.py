"""Bisect which program class degrades axon dispatch (fresh session)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")
import jax.numpy as jnp

def timeit(f, *a, n=20):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): jax.block_until_ready(f(*a))
    return (time.perf_counter() - t0) / n

canary = jax.jit(jnp.sin)
xc = jnp.ones((16,))
def can(tag):
    print(f"canary [{tag}]: {timeit(canary, xc)*1000:.2f} ms", flush=True)

can("start")
which = sys.argv[1]
if which == "bigmatmul":
    a = jnp.ones((8192, 8192), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    print("bigmatmul:", timeit(f, a, n=3), flush=True)
elif which == "small_solve":
    from biem_helmholtz_sphere_tpu import biem, plane_wave
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    centers = np.array([[0.,2.,0.],[0.,-2.,0.]], np.float32)
    def step(k):
        uin, _ = plane_wave(k=k, direction=np.array([1.,0.,0.], np.float32))
        return biem(c, centers=centers, radii=np.ones(2, np.float32), k=k,
                    n_end=6, uin=uin).density
    f = jax.jit(step)
    t0=time.perf_counter(); f(jnp.float32(1.0)).block_until_ready()
    print(f"small solve compile: {time.perf_counter()-t0:.1f}s", flush=True)
    print("small solve per-k:", timeit(f, jnp.float32(1.0), n=5), flush=True)
elif which == "biglit":
    big = np.ones((2016, 1024), np.float32)  # ~8 MB literal
    f = jax.jit(lambda x: (x[None, :] * big).sum())
    print("biglit:", timeit(f, jnp.ones((1024,)), n=5), flush=True)
can("end")

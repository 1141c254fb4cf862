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
elif which == "assemble_small":
    from biem_helmholtz_sphere_tpu.biem._core import _assemble, _check_biem_inputs
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    centers = np.array([[0.,2.,0.],[0.,-2.,0.]], np.float32)
    def step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, np.ones(2, np.float32), k, None, 1.0, 0.0)
        m = _assemble(c, 6, cc, rr, kk, eta, al, be, None, stable=True)
        return m.re.sum() + m.im.sum()
    print("assemble_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "assemble_plain":
    # stable=False (no scale compensation) — isolates the scaled path
    from biem_helmholtz_sphere_tpu.biem._core import _assemble, _check_biem_inputs
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    centers = np.array([[0.,2.,0.],[0.,-2.,0.]], np.float32)
    def step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, np.ones(2, np.float32), k, None, 1.0, 0.0)
        m = _assemble(c, 6, cc, rr, kk, eta, al, be, None, stable=False)
        return m.re.sum() + m.im.sum()
    print("assemble_plain:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "rhs_small":
    from biem_helmholtz_sphere_tpu.biem._core import _check_biem_inputs, _rhs_dispatch
    from biem_helmholtz_sphere_tpu import plane_wave
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    centers = np.array([[0.,2.,0.],[0.,-2.,0.]], np.float32)
    def step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, np.ones(2, np.float32), k, None, 1.0, 0.0)
        uin, _ = plane_wave(k=kk, direction=np.array([1.,0.,0.], np.float32))
        f = _rhs_dispatch(c, 6, cc, rr, al, be, uin, None, kk.ndim)
        return f.re.sum() + f.im.sum()
    print("rhs_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "lu_small":
    from biem_helmholtz_sphere_tpu.ops import cplx
    from biem_helmholtz_sphere_tpu.ops.cplx import C
    rng = np.random.default_rng(0)
    m = C(jnp.asarray(rng.normal(size=(72, 72)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(72, 72)).astype(np.float32)))
    f = C(jnp.asarray(rng.normal(size=72).astype(np.float32)),
          jnp.asarray(rng.normal(size=72).astype(np.float32)))
    print("lu_small:", timeit(jax.jit(cplx.solve), m, f, n=5), flush=True)
elif which == "gmres_small":
    from biem_helmholtz_sphere_tpu.ops import cplx
    from biem_helmholtz_sphere_tpu.ops.cplx import C
    rng = np.random.default_rng(0)
    mr = rng.normal(size=(512, 512)).astype(np.float32)
    m = C(jnp.asarray(mr + 20*np.eye(512, dtype=np.float32)),
          jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32)))
    f = C(jnp.asarray(rng.normal(size=512).astype(np.float32)),
          jnp.asarray(rng.normal(size=512).astype(np.float32)))
    print("gmres_small:", timeit(jax.jit(cplx.gmres_solve), m, f, n=5), flush=True)
elif which == "while_loop":
    def step(x):
        def body(c):
            i, v = c
            return i + 1, v * 1.0001 + 0.1
        def cond(c):
            return c[0] < 50
        return jax.lax.while_loop(cond, body, (0, x))[1].sum()
    print("while_loop:", timeit(jax.jit(step), jnp.ones((128,)), n=5), flush=True)
elif which == "scan":
    def step(x):
        def body(c, _):
            return c * 1.0001 + 0.1, c.sum()
        out, ys = jax.lax.scan(body, x, None, length=50)
        return out.sum() + ys.sum()
    print("scan:", timeit(jax.jit(step), jnp.ones((128,)), n=5), flush=True)
elif which == "optbarrier":
    def step(x):
        y = x * 2.0
        y = jax.lax.optimization_barrier(y)
        return y.sum()
    print("optbarrier:", timeit(jax.jit(step), jnp.ones((128,)), n=5), flush=True)
elif which == "gather":
    idx = np.tile(np.arange(36, dtype=np.int32), 4)
    def step(x):
        return jnp.take(x, jnp.asarray(idx), axis=-1).sum()
    print("gather:", timeit(jax.jit(step), jnp.ones((8, 36)), n=5), flush=True)
elif which == "trans_small":
    from biem_helmholtz_sphere_tpu.translation._ops import translation_matrix
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    t = np.array([[0.0], [4.0], [0.0]], np.float32)
    def step(k):
        m = translation_matrix(c, t, 6, k[..., None], kind="SR", method=None)
        return m.re.sum() + m.im.sum()
    print("trans_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "radial_small":
    from biem_helmholtz_sphere_tpu.biem._core import _radial_rows, _check_biem_inputs
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    centers = np.array([[0.,2.,0.],[0.,-2.,0.]], np.float32)
    def step(k):
        cc, rr, kk, eta, al, be = _check_biem_inputs(
            c, centers, np.ones(2, np.float32), k, None, 1.0, 0.0)
        s, r, b = _radial_rows(c, 6, rr, kk, eta, al, be)
        return s.re.sum() + r.re.sum() + b.im.sum()
    print("radial_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "bessel_small":
    from biem_helmholtz_sphere_tpu.special._family import spherical_jh_all
    def step(k):
        j, jp, h, hp = spherical_jh_all(3, 6, k * jnp.ones((2,)))
        return j.re.sum() + h.im.sum() + jp.re.sum() + hp.im.sum()
    print("bessel_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "coax_small":
    from biem_helmholtz_sphere_tpu.translation._rotation import coaxial_sr
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    def step(k):
        m = coaxial_sr(c, jnp.asarray(np.array([4.0], np.float32)), 6, k[..., None])
        return m.re.sum() + m.im.sum()
    print("coax_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "rotmat_small":
    from biem_helmholtz_sphere_tpu.translation._rotation import rotation_matrix
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
    c = create_from_branching_types("ba")
    th = np.array([[0.0, 1.0, 0.0]], np.float32)
    def step(s):
        m = rotation_matrix(c, jnp.asarray(th) * s, 6)
        return m.re.sum() + m.im.sum()
    print("rotmat_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "harm_small":
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types, from_cartesian
    from biem_helmholtz_sphere_tpu.harmonics._eval import harmonics
    c = create_from_branching_types("ba")
    pts = np.random.default_rng(0).normal(size=(3, 64)).astype(np.float32)
    def step(s):
        sph = from_cartesian(c, jnp.asarray(pts) * s)
        y = harmonics(c, sph, 6)
        return y.re.sum() + y.im.sum()
    print("harm_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "fromcart_small":
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types, from_cartesian
    c = create_from_branching_types("ba")
    pts = np.random.default_rng(0).normal(size=(3, 64)).astype(np.float32)
    def step(s):
        sph = from_cartesian(c, jnp.asarray(pts) * s)
        return sum(v.sum() for v in sph.values())
    print("fromcart_small:", timeit(jax.jit(step), jnp.float32(1.0), n=5), flush=True)
elif which == "optbarrier_const":
    n = np.arange(36, dtype=np.int32)
    def step(x):
        nb = jax.lax.optimization_barrier(jnp.asarray(n))
        mask = nb[:, None] == nb[None, :]
        return jnp.where(mask, x, 0.0).sum()
    print("optbarrier_const:", timeit(jax.jit(step), jnp.ones((36, 36)), n=5), flush=True)
elif which == "mask_const":
    n = np.arange(36, dtype=np.int32)
    def step(x):
        nb = jnp.asarray(n)
        mask = nb[:, None] == nb[None, :]
        return jnp.where(mask, x, 0.0).sum()
    print("mask_const:", timeit(jax.jit(step), jnp.ones((36, 36)), n=5), flush=True)
elif which == "optbarrier_f32const":
    n = np.arange(36, dtype=np.float32)
    def step(x):
        nb = jax.lax.optimization_barrier(jnp.asarray(n))
        return (x * nb).sum()
    print("optbarrier_f32const:", timeit(jax.jit(step), jnp.ones((36,)), n=5), flush=True)
elif which == "dotlit":
    big = np.random.default_rng(0).normal(size=(512, 512)).astype(np.float32)
    def step(x):
        return (big @ x).sum()
    print("dotlit:", timeit(jax.jit(step), jnp.ones((512, 512)), n=5), flush=True)
elif which == "dotlit_small":
    big = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
    def step(x):
        return (big @ x).sum()
    print("dotlit_small:", timeit(jax.jit(step), jnp.ones((64, 64)), n=5), flush=True)
elif which == "einsum3":
    q, h = 128, 36
    ta = np.random.default_rng(0).normal(size=(q, h)).astype(np.float32)
    def step(v):
        u = jnp.einsum("qn,qa,qb->nab", v[:, None] * jnp.asarray(ta[:, :11]), ta, ta)
        return u.sum()
    print("einsum3:", timeit(jax.jit(step), jnp.ones((q,)), n=5), flush=True)
elif which == "scatter":
    b2 = np.arange(2)[:, None]
    h2 = np.arange(36)[None, :]
    def step(v):
        a = jnp.zeros((2, 36, 2, 36))
        return a.at[b2, h2, b2, h2].set(v).sum()
    print("scatter:", timeit(jax.jit(step), jnp.ones((2, 36)), n=5), flush=True)
can("end")

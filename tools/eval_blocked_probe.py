"""A/B: m-blocked fused eval vs the unblocked scan on TPU (round 4).

Measures uscat pts/s at the bench config (16 balls, n_end=32, f32)
for the unblocked baseline and the blocked path over (mbs, chunk).
Usage: python tools/eval_blocked_probe.py [configs]
  configs = comma-separated entries base:CHUNK or blk:MBS:CHUNK
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

configs = (
    sys.argv[1].split(",") if len(sys.argv) > 1
    else ["base:16384", "blk:16:16384", "blk:8:16384", "blk:32:16384",
          "blk:16:4096"]
)

import jax
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "high")
import jax.numpy as jnp
from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

N_END, N_SIDE, SPACING, K0 = 32, 4, 4.0, 8.0
EVAL_POINTS = 1 << 17

g = (np.arange(N_SIDE) - (N_SIDE - 1) / 2) * SPACING
xx, yy = np.meshgrid(g, g)
centers = np.zeros((N_SIDE * N_SIDE, 3), np.float32)
centers[:, 0] = xx.ravel(); centers[:, 1] = yy.ravel()
c = create_from_branching_types("ba")
uin, _ = plane_wave(k=jnp.float32(K0), direction=np.array([1.,0.,0.], np.float32))
calc = biem(c, centers=centers, radii=np.ones(16, np.float32),
            k=jnp.float32(K0), n_end=N_END, uin=uin)
calc.density.block_until_ready()
# sync-mode readback (see bench.py)
if not np.isfinite(float(np.asarray(calc.density.re[0, 0]))):
    raise RuntimeError("solve non-finite")

rng = np.random.default_rng(0)
x_np = rng.normal(size=(3, EVAL_POINTS)).astype(np.float32) * 20.0
x = jnp.asarray(x_np)

for cfg in configs:
    parts = cfg.split(":")
    os.environ["BHS_EVAL_BLOCKED"] = "0"
    os.environ["BHS_EVAL_HALF"] = "0"
    os.environ["BHS_EVAL_PM"] = "0"
    os.environ.pop("BHS_EVAL_MBS", None)
    if parts[0] == "pm":
        os.environ["BHS_EVAL_PM"] = "1"
        chunk = int(parts[1]); label = f"pm chunk={chunk}"
    elif parts[0] == "base":
        chunk = int(parts[1]); label = f"base chunk={chunk}"
    elif parts[0] == "half":
        os.environ["BHS_EVAL_HALF"] = "1"
        if parts[1] != "0":
            os.environ["BHS_EVAL_MBS"] = parts[1]
        chunk = int(parts[2]); label = f"half mbs={parts[1]} chunk={chunk}"
    else:
        os.environ["BHS_EVAL_BLOCKED"] = "1"
        os.environ["BHS_EVAL_MBS"] = parts[1]
        chunk = int(parts[2]); label = f"blk mbs={parts[1]} chunk={chunk}"

    def eval_chunked(calc_, xx_):
        xs = xx_.reshape(3, -1, chunk)
        xs = jnp.moveaxis(xs, 1, 0)
        return jax.lax.map(lambda xc: calc_.uscat(xc), xs)

    ev = jax.jit(eval_chunked)
    out = ev(calc, x)
    out.re.block_until_ready()
    if not np.all(np.isfinite(np.asarray(out.re).ravel()[:8] )):
        print(f"{label}: WARN first elems not finite")
    dt = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        ev(calc, x).re.block_until_ready()
        dt = min(dt, time.perf_counter() - t0)
    print(f"{label}: {EVAL_POINTS/dt:.3e} pts/s ({dt*1e3:.1f} ms)", flush=True)

"""North-star benchmark (BASELINE.json): BIE assembly+solve per k-point at
n_balls=16, n_end=32 (3D), plus uscat field-evaluation throughput, on one
TPU chip in complex64 (real-pair representation; GMRES solver — the XLA
TPU block-LU overflows scoped vmem beyond ~18k rows, and the second-kind
combined-field system converges in tens of matvecs anyway).

Baseline: the same algorithm in vectorized NumPy/SciPy on this machine's
CPU (tools/baseline_numpy.py) — the reference package itself cannot run
here (its ultrasphere/numba dependency stack is not installed; see
BASELINE.md).  Raw measurements and methodology: BENCH_NOTES.md.  If a
direct n_end=32 measurement exists in tools/baseline_32.log it is used;
otherwise the conservative (sub-FLOP-exponent) extrapolation from the
measured n_end=16/20 runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import re
import signal
import sys
import time

import numpy as np

# Watchdog: the axon TPU tunnel can wedge (a stuck remote compile blocks
# even device enumeration indefinitely).  Fail loudly instead of hanging
# the caller; normal runs finish in ~2-4 min including first compiles.
_WATCHDOG_S = 1500


def _watchdog(signum, frame):
    print(
        "bench.py watchdog: no result after "
        f"{_WATCHDOG_S}s (TPU backend wedged?); aborting",
        file=sys.stderr,
    )
    os._exit(1)

N_END = 32
N_SIDE = 4  # 4x4 lattice -> 16 balls
SPACING = 4.0
K0 = 8.0
N_K = 3  # timed k-points (distinct values, same compiled program)
EVAL_POINTS = 1 << 17
EVAL_CHUNK = 2048

# Conservative extrapolation of the measured NumPy baseline to n_end=32
# (BENCH_NOTES.md): translation 632.7 s x (32/20)^3.45 + solve 47 s x
# (32/20)^6 + assembly ~ 2 s x (32/20)^4.
BASELINE_SECONDS_PER_K_FALLBACK = 3995.0


def _baseline_seconds():
    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tools", "baseline_32.log")
    try:
        text = open(log).read()
        m = re.search(r"n_end=32 B=16: total ([0-9.]+)s", text)
        if m:
            return float(m.group(1)), "measured"
    except OSError:
        pass
    return BASELINE_SECONDS_PER_K_FALLBACK, "extrapolated"


def lattice_centers(n_side, spacing, d=3):
    g = (np.arange(n_side) - (n_side - 1) / 2) * spacing
    xx, yy = np.meshgrid(g, g)
    centers = np.zeros((n_side * n_side, d))
    centers[:, 0] = xx.ravel()
    centers[:, 1] = yy.ravel()
    return centers


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(_WATCHDOG_S)
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # "high" (3-pass bf16) restores true-float32 matmul accuracy on TPU
    # (sound-soft BC residual 6e-4 vs 2.7e-2 at the bf16 default) for a
    # ~29% per-solve cost; see BENCH_NOTES.md.
    jax.config.update("jax_default_matmul_precision", "high")

    import jax.numpy as jnp

    from biem_helmholtz_sphere_tpu import biem, plane_wave
    from biem_helmholtz_sphere_tpu.coords import create_from_branching_types

    c = create_from_branching_types("ba")
    # Closed-over geometry as HOST numpy: lowers to HLO literals
    # instead of captured device buffers (BENCH_NOTES.md).
    centers = lattice_centers(N_SIDE, SPACING).astype(np.float32)
    radii = np.ones(N_SIDE * N_SIDE, dtype=np.float32)
    direction = np.array([1.0, 0.0, 0.0], dtype=np.float32)

    def solve_step(k):
        uin, _ = plane_wave(k=k, direction=direction)
        calc = biem(c, centers=centers, radii=radii, k=k, n_end=N_END, uin=uin)
        return calc.density

    solve_jit = jax.jit(solve_step)

    # compile (excluded from timing; persistent-cached across runs)
    solve_jit(jnp.float32(K0)).block_until_ready()

    ks = np.linspace(K0 - 0.25, K0 + 0.25, N_K).astype(np.float32)
    t0 = time.perf_counter()
    for kk in ks:
        solve_jit(jnp.float32(kk)).block_until_ready()
    per_k = (time.perf_counter() - t0) / N_K

    # field-evaluation throughput (chunked to bound [chunk, B, H] memory)
    uin, _ = plane_wave(k=jnp.float32(K0), direction=direction)
    calc = biem(
        c, centers=centers, radii=radii, k=jnp.float32(K0), n_end=N_END, uin=uin
    )

    def eval_chunked(calc_, x):
        xs = x.reshape(3, -1, EVAL_CHUNK)
        xs = jnp.moveaxis(xs, 1, 0)  # [nchunk, 3, chunk]
        return jax.lax.map(lambda xc: calc_.uscat(xc), xs)

    eval_jit = jax.jit(eval_chunked)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, EVAL_POINTS)).astype(np.float32) * 20.0
    eval_jit(calc, jnp.asarray(x)).block_until_ready()  # compile
    t0 = time.perf_counter()
    eval_jit(calc, jnp.asarray(x)).block_until_ready()
    pts_per_s = EVAL_POINTS / (time.perf_counter() - t0)

    baseline, kind = _baseline_seconds()
    print(
        json.dumps(
            {
                "metric": (
                    "BIE assembly+solve wall-time per k-point, 16 balls, "
                    f"n_end=32, 3D, complex64 on one TPU chip (uscat eval "
                    f"{pts_per_s:.3e} pts/s; baseline {kind}: same-algorithm "
                    "NumPy/SciPy on host CPU, see BENCH_NOTES.md)"
                ),
                "value": round(per_k, 4),
                "unit": "s",
                "vs_baseline": round(baseline / per_k, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

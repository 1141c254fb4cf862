"""Minimal repro of XLA's "circular simplification loop" warning (round 5).

Since round 2 every solver compile logged

    algebraic_simplifier.cc: Algebraic simplifier is likely stuck in a
    circular simplification loop and ran for 50 runs ...

Round-5 bisect (solve -> rhs/radial -> special family -> cyl seeds ->
series) isolated the construct: a DEPENDENT HORNER CHAIN.  The
algebraic simplifier makes at least one rewrite per fixed-point run on
each level of an unrolled `s = s * x + c` chain, so its run count grows
with chain depth; past its hard cap of 50 runs it logs the warning (the
"likely stuck" heuristic — it is not actually cycling, just converging
one level per run).  Nothing repo-specific is involved: a plain REAL
60-level Horner chain on the CPU backend reproduces it, while 42 levels
(the repo's Bessel series length) do not alone — the warning appeared
because the J- and Y-series chains COMPOSE past 50 levels in the seed
computation (special/_cyl.py).

Fix shipped in special/_cyl.py::_guard: a jax.lax.optimization_barrier
every 16 Horner levels caps the chain depth the simplifier can see;
evaluation order and rounding are unchanged, and the warning is gone
from solver/bench/dryrun compiles.

Run:  python tools/simplifier_repro.py [n_levels=60]
Prints whether the warning fired for (a) the bare chain and (b) the
chain with a 16-level barrier guard.
"""

import subprocess
import sys

_BODY = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

n = int(sys.argv[1])
guard = sys.argv[2] == "guard"

def f(k):
    x = k * jnp.ones((2,))
    s = jnp.zeros((2,))
    for i in range(n, 0, -1):
        s = s * x + float(i)
        if guard and i % 16 == 0:
            s = jax.lax.optimization_barrier(s)
    return s

jax.jit(f).lower(jnp.float64(1.0)).compile()
print("compiled")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    for mode in ("bare", "guard"):
        r = subprocess.run(
            [sys.executable, "-c", _BODY, str(n), mode],
            capture_output=True,
            text=True,
            timeout=600,
        )
        fired = "circular simplification" in r.stderr
        print(
            f"{n}-level real Horner chain ({mode}): "
            f"warning {'FIRED' if fired else 'absent'} (rc={r.returncode})"
        )


if __name__ == "__main__":
    main()

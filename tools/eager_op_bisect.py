"""Which EAGER (non-jit) op degrades axon dispatch?
Usage: python tools/eager_op_bisect.py <stage>
stages: ones, asarray, add, sin, matmul, einsum, reshape, linspace, iota
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

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

a = jnp.asarray(np.linspace(0.0, 1.0, 4096, dtype=np.float32).reshape(64, 64))
if stage == "ones":
    x = jnp.ones((64, 64))
elif stage == "asarray":
    x = a
elif stage == "add":
    x = a + a
elif stage == "sin":
    x = jnp.sin(a)
elif stage == "matmul":
    x = a @ a
elif stage == "einsum":
    x = jnp.einsum("ab,cb->ac", a, a)
elif stage == "reshape":
    x = a.reshape(4096)
elif stage == "linspace":
    x = jnp.linspace(0.0, 1.0, 4096)
elif stage == "iota":
    x = jnp.arange(4096)
else:
    x = xc
jax.block_until_ready(x)
print(stage, "done", flush=True)

can("end")

if stage == "readback":
    y = jnp.sin(a)
    print("readback:", np.asarray(y).shape, flush=True)
elif stage == "readback_input":
    print("readback_input:", np.asarray(a).shape, flush=True)
elif stage == "float_scalar":
    print("float_scalar:", float(jnp.sin(a).sum()), flush=True)
elif stage == "readback_jit":
    y = jax.jit(jnp.sin)(a)
    print("readback_jit:", np.asarray(y).shape, flush=True)
can("end2")

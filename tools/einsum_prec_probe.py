"""Probe: does the axon TPU honor matmul precision for batched
matrix-vector and small-N batched matmuls?  Compare against f64 CPU."""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
P, H, G, NN = 48, 1024, 1024, 24

a = rng.normal(size=(P, H, G)).astype(np.float32)
v = rng.normal(size=(P, G)).astype(np.float32)
w = rng.normal(size=(P, NN, G)).astype(np.float32)
big = rng.normal(size=(H, G)).astype(np.float32)
x1 = rng.normal(size=(G,)).astype(np.float32)

ref_mv = np.einsum("phg,pg->ph", a.astype(np.float64), v.astype(np.float64))
ref_mm = np.einsum("phg,png->pnh", a.astype(np.float64), w.astype(np.float64))
ref_1 = big.astype(np.float64) @ x1.astype(np.float64)

cpu = jax.devices("cpu")[0]
tpu = [d for d in jax.devices() if d.platform != "cpu"][0]

for prec in ("default", "high", "highest"):
    for dev, name in ((tpu, "tpu"), (cpu, "cpu")):
        aj = jax.device_put(jnp.asarray(a), dev)
        vj = jax.device_put(jnp.asarray(v), dev)
        wj = jax.device_put(jnp.asarray(w), dev)
        bigj = jax.device_put(jnp.asarray(big), dev)
        x1j = jax.device_put(jnp.asarray(x1), dev)

        @partial(jax.jit, device=dev)
        def run(aj, vj, wj, bigj, x1j, prec=prec):
            with jax.default_matmul_precision(prec):
                mv = jnp.einsum("phg,pg->ph", aj, vj)
                mm = jnp.einsum("phg,png->pnh", aj, wj)
                one = bigj @ x1j
            return mv, mm, one

        mv, mm, one = run(aj, vj, wj, bigj, x1j)
        e_mv = np.abs(np.asarray(mv) - ref_mv).max() / np.abs(ref_mv).max()
        e_mm = (
            np.abs(np.asarray(mm).transpose(0, 2, 1) - ref_mm.transpose(0, 2, 1)).max()
            / np.abs(ref_mm).max()
        )
        e_1 = np.abs(np.asarray(one) - ref_1).max() / np.abs(ref_1).max()
        print(
            f"{prec:8s} {name}: batched-mv {e_mv:.2e}  batched-mm(N=24) {e_mm:.2e}  "
            f"plain-mv {e_1:.2e}"
        )

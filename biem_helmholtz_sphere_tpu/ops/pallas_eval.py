r"""Pallas TPU kernel for the fused near-field harmonic contraction.

The XLA degree-major fused eval (biem/_eval_fused.py) measures ~1.9e6
pts/s at the bench config (B=16, n_end=32) against an ~8e6 pts/s VPU
compute ceiling: even fully unrolled, the [pts, B, M] scan carries and
the az/stpow epilogue spill to HBM (the acc tile alone is 132 MB per
16k-point chunk, far over the ~16 MB VMEM).  This kernel runs the whole
per-point pipeline — Jacobi three-term recurrences for every order
slot, density x radial accumulation, azimuthal phase + sin^|m| epilogue
— on a VMEM-resident point tile, so nothing of size [pts, B, M] ever
touches HBM.

Layout (Mosaic-friendly, everything 2-D): the grid is
(point-tiles, G) where G = (flattened leading batch) x balls; each cell
works on ONE ball's [P_TILE, MP] slab with rows = points (sublanes) and
lanes = the order-slot axis padded to MP (64-multiple).  Angles stream
in as [P_TILE, 1] columns (lane-broadcast in VMEM), the radial table as
a [P_TILE, n] block (per-degree static lane slice), and the per-step
recurrence coefficient tables as [n, MP] rows (sublane-broadcast).
The degree loop is statically unrolled so every slice index is a
compile-time constant — no dynamic lane offsets, no shape casts (the
earlier G*MP single-block formulation died in Mosaic's
infer-vector-layout on the [P, G, MP] -> [P, G*MP] reshape).

    step l:  pp   = (ct - a_l) * pn * invb1_l - (b_l invb1_l) * pm
             pp   = seed_l ? p0 : pp
             acc += (w2_l * pp) * rad_l          (complex x real x complex)
    epilogue: out = sum_m acc * e^{i m phi} * sin(theta)^|m| / sqrt(2pi)

The radial table rad (h^(1)_l(kr), overflow-clamped — _eval._h_clamped)
is computed OUTSIDE and streamed in per tile: it keeps the kernel
numerics identical to the XLA path, and its recurrence is over l
(cheap, [pts, G] wide) rather than per-slot.

Reference analogue: the Y-materializing evaluation _biem.py:922-966.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2PI_INV = 1.0 / np.sqrt(2.0 * np.pi)


def _eval_kernel(
    ct_ref,      # [1, P, 1] f32   cos(theta) for this ball
    st_ref,      # [1, P, 1] f32   sin(theta)
    phi_ref,     # [1, P, 1] f32   azimuth
    radr_ref,    # [1, P, n] f32   Re h_l(kr), lane l = degree
    radi_ref,    # [1, P, n] f32
    ab_ref,      # [n, MP] f32   a_l table
    binvb1_ref,  # [n, MP] f32   b_l * inv(b1_l)
    invb1_ref,   # [n, MP] f32   inv(b1_l)
    seed_ref,    # [n, MP] f32   1.0 at l == |m| else 0.0
    p0_ref,      # [1, MP] f32   seed value per slot
    w2r_ref,     # [1, n, MP] f32  Re w[g, l, m]  (runtime: density weights)
    w2i_ref,     # [1, n, MP] f32
    mflat_ref,   # [1, MP] f32   signed m per lane
    mabs_ref,    # [1, MP] f32   |m| per lane
    outr_ref,    # [1, P, 1] f32
    outi_ref,    # [1, P, 1] f32
    *,
    n,
    mp,
):
    p = ct_ref.shape[1]
    ct = ct_ref[0]          # [P, 1], lane-broadcasts against [*, MP]
    p0 = p0_ref[:]          # [1, MP], sublane-broadcasts
    radr = radr_ref[0]      # [P, n]
    radi = radi_ref[0]
    w2r = w2r_ref[0]        # [n, MP]
    w2i = w2i_ref[0]

    z = jnp.zeros((p, mp), jnp.float32)
    pm_, pn_ = z, z
    accr, acci = z, z
    # statically unrolled degree loop: all slices compile-time constant
    for l in range(n):
        # orthonormal Jacobi recurrence, division folded into tables
        pp = (ct - ab_ref[l : l + 1, :]) * pn_ * invb1_ref[l : l + 1, :] - (
            binvb1_ref[l : l + 1, :] * pm_
        )
        sd = seed_ref[l : l + 1, :]
        pp = pp * (1.0 - sd) + p0 * sd
        # rad_l: [P, 1] static lane slice, broadcast over slots
        rl = radr[:, l : l + 1]
        il = radi[:, l : l + 1]
        cr = w2r[l : l + 1, :] * pp
        ci = w2i[l : l + 1, :] * pp
        accr = accr + (cr * rl - ci * il)
        acci = acci + (cr * il + ci * rl)
        pm_, pn_ = pn_, pp

    # epilogue: az = e^{i m phi}, stpow = sin(theta)^{|m|}
    mf = mflat_ref[:]       # [1, MP]
    ma = mabs_ref[:]
    ph = phi_ref[0] * mf    # [P, MP]
    azr = jnp.cos(ph)
    azi = jnp.sin(ph)
    st = st_ref[0]          # [P, 1]
    tiny = jnp.float32(1e-30)
    logst = jnp.log(jnp.maximum(st, tiny))
    pw = jnp.exp(ma * logst)                     # [P, MP]
    stpow = jnp.where(ma == 0.0, 1.0, jnp.where(st < tiny, 0.0, pw))
    vr = (accr * azr - acci * azi) * stpow
    vi = (accr * azi + acci * azr) * stpow
    outr_ref[0] = vr.sum(axis=-1, keepdims=True) * np.float32(_SQRT_2PI_INV)
    outi_ref[0] = vi.sum(axis=-1, keepdims=True) * np.float32(_SQRT_2PI_INV)


@partial(jax.jit, static_argnames=("n", "g", "mp", "p_tile", "interpret"))
def fused_eval_pallas(
    ct, st, phi, radr, radi,
    w2r, w2i, ab, binvb1, invb1, seed, p0, mflat, mabs,
    *, n, g, mp, p_tile=256, interpret=False,
):
    """ct/st/phi: [G, P, 1] f32 (ball-leading so blocks tile the point
    axis in sublanes); radr/radi: [G, P, n] f32 (lane l = degree);
    w2*: [G, n, MP] runtime density weights; remaining tables:
    [n|1, MP] trace-time constants.  P must be a multiple of p_tile
    (caller pads).  Returns (outr, outi) [G, P, 1]."""
    p = ct.shape[1]
    grid = (p // p_tile, g)
    ang_spec = pl.BlockSpec(
        (1, p_tile, 1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    rad_spec = pl.BlockSpec(
        (1, p_tile, n), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (n, mp), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    one_spec = pl.BlockSpec(
        (1, mp), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    w2_spec = pl.BlockSpec(
        (1, n, mp), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, p_tile, 1), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    kern = partial(_eval_kernel, n=n, mp=mp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            ang_spec, ang_spec, ang_spec, rad_spec, rad_spec,
            tab_spec, tab_spec, tab_spec, tab_spec, one_spec,
            w2_spec, w2_spec, one_spec, one_spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((g, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((g, p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ct, st, phi, radr, radi, ab, binvb1, invb1, seed, p0, w2r, w2i,
      mflat, mabs)

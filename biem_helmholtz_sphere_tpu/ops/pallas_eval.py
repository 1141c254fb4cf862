r"""Pallas TPU kernel for the fused near-field harmonic contraction.

The XLA degree-major fused eval (biem/_eval_fused.py) measures 1.35e6
pts/s at the bench config (B=16, n_end=32) against an ~8e6 pts/s VPU
compute ceiling: even fully unrolled, the [pts, B, M] scan carries and
the az/stpow epilogue spill to HBM (the acc tile alone is 132 MB per
16k-point chunk, far over the ~16 MB VMEM).  This kernel runs the whole
per-point pipeline — Jacobi three-term recurrences for every order
slot, density x radial accumulation, azimuthal phase + sin^|m| epilogue
— on a VMEM-resident point tile, so nothing of size [pts, G, M] ever
touches HBM.

Layout: rows = point tile (P_TILE sublanes), lanes = G * MP where
G = (flattened leading batch) x balls and MP = the order-slot axis
padded to 64.  Angles and the radial table stream in at [P, G]-ish
width and are broadcast across slots IN VMEM; the per-step recurrence
coefficient tables ([n, G*MP]) are trace-time constants
(biem/_eval_fused._fused_tables) while the density weights w2 are
runtime inputs of the same shape.  The kernel body is pure VPU
arithmetic:

    step l:  pp   = (ct - a_l) * pn * invb1_l - (b_l invb1_l) * pm
             pp   = seed_l ? p0 : pp
             acc += (w2_l * pp) * rad_l          (complex x real x complex)
    epilogue: out = sum_m acc * e^{i m phi} * sin(theta)^|m| / sqrt(2pi)

The radial table rad (h^(1)_l(kr), overflow-clamped — _eval._h_clamped)
is computed OUTSIDE and streamed in per tile: it keeps the kernel
numerics identical to the XLA path, and its recurrence is over l
(cheap, [pts, G] wide) rather than per-slot.  Input traffic is
~(3 + 2 n) * G * 4 bytes/point — ~4 KB/pt at the bench config, versus
~12 KB/pt plus carry spills for the XLA path.

Reference analogue: the Y-materializing evaluation _biem.py:922-966.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2PI_INV = 1.0 / np.sqrt(2.0 * np.pi)


def _bcast_slots(x, mp):
    """[P, G] -> [P, G*MP] by repeating each column MP times (lane
    layout: lane = g * MP + m)."""
    p, g = x.shape
    return jnp.broadcast_to(x[:, :, None], (p, g, mp)).reshape(p, g * mp)


def _eval_kernel(
    ct_ref,      # [P, G] f32   cos(theta)
    st_ref,      # [P, G] f32   sin(theta)
    phi_ref,     # [P, G] f32   azimuth
    radr_ref,    # [P, n*G] f32  Re h_l(kr), degree-major (col l*G+g)
    radi_ref,    # [P, n*G] f32
    ab_ref,      # [n, GM] f32   a_l table
    binvb1_ref,  # [n, GM] f32   b_l * inv(b1_l)
    invb1_ref,   # [n, GM] f32   inv(b1_l)
    seed_ref,    # [n, GM] f32   1.0 at l == |m| else 0.0
    p0_ref,      # [1, GM] f32   seed value per slot
    w2r_ref,     # [n, GM] f32   Re w[g, m, l]  (runtime: density weights)
    w2i_ref,     # [n, GM] f32
    mflat_ref,   # [1, GM] f32   signed m per lane
    mabs_ref,    # [1, GM] f32   |m| per lane
    outr_ref,    # [P, G] f32
    outi_ref,    # [P, G] f32
    *,
    n,
    g,
    mp,
):
    p = ct_ref.shape[0]
    gm = g * mp
    ct = _bcast_slots(ct_ref[:], mp)
    p0 = p0_ref[0, :]

    def step(l, carry):
        pm_, pn_, accr, acci = carry
        # orthonormal Jacobi recurrence, division folded into tables
        pp = (ct - ab_ref[l, :]) * pn_ * invb1_ref[l, :] - (
            binvb1_ref[l, :] * pm_
        )
        sd = seed_ref[l, :]
        pp = pp * (1.0 - sd) + p0 * sd
        # rad_l per (p, g) broadcast over slots
        rl = _bcast_slots(radr_ref[:, pl.ds(l * g, g)], mp)
        il = _bcast_slots(radi_ref[:, pl.ds(l * g, g)], mp)
        cr = w2r_ref[l, :] * pp
        ci = w2i_ref[l, :] * pp
        accr = accr + (cr * rl - ci * il)
        acci = acci + (cr * il + ci * rl)
        return pn_, pp, accr, acci

    z = jnp.zeros((p, gm), jnp.float32)
    _, _, accr, acci = jax.lax.fori_loop(0, n, step, (z, z, z, z))

    # epilogue: az = e^{i m phi}, stpow = sin(theta)^{|m|}
    mf = mflat_ref[0, :]
    ma = mabs_ref[0, :]
    ph = _bcast_slots(phi_ref[:], mp) * mf
    azr = jnp.cos(ph)
    azi = jnp.sin(ph)
    st = _bcast_slots(st_ref[:], mp)
    tiny = jnp.float32(1e-30)
    logst = jnp.log(jnp.maximum(st, tiny))
    pw = jnp.exp(ma * logst)
    stpow = jnp.where(ma == 0.0, 1.0, jnp.where(st < tiny, 0.0, pw))
    vr = (accr * azr - acci * azi) * stpow
    vi = (accr * azi + acci * azr) * stpow
    outr_ref[:] = (
        vr.reshape(p, g, mp).sum(axis=-1) * np.float32(_SQRT_2PI_INV)
    )
    outi_ref[:] = (
        vi.reshape(p, g, mp).sum(axis=-1) * np.float32(_SQRT_2PI_INV)
    )


@partial(jax.jit, static_argnames=("n", "g", "mp", "p_tile", "interpret"))
def fused_eval_pallas(
    ct, st, phi, radr, radi,
    w2r, w2i, ab, binvb1, invb1, seed, p0, mflat, mabs,
    *, n, g, mp, p_tile=256, interpret=False,
):
    """ct/st/phi: [P, G] f32; radr/radi: [P, n*G] f32 (degree-major:
    column l*G+g holds h_l for batch-ball g); w2*: [n, G*MP] runtime
    density weights; remaining tables: [n|1, G*MP] trace-time constants.
    P must be a multiple of p_tile (caller pads).  Returns
    (outr, outi) [P, G]."""
    p = ct.shape[0]
    gm = g * mp
    grid = (p // p_tile,)
    ang_spec = pl.BlockSpec(
        (p_tile, g), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rad_spec = pl.BlockSpec(
        (p_tile, n * g), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (n, gm), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    one_spec = pl.BlockSpec(
        (1, gm), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (p_tile, g), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kern = partial(_eval_kernel, n=n, g=g, mp=mp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            ang_spec, ang_spec, ang_spec, rad_spec, rad_spec,
            tab_spec, tab_spec, tab_spec, tab_spec, one_spec,
            tab_spec, tab_spec, one_spec, one_spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((p, g), jnp.float32),
            jax.ShapeDtypeStruct((p, g), jnp.float32),
        ],
        interpret=interpret,
    )(ct, st, phi, radr, radi, ab, binvb1, invb1, seed, p0, w2r, w2i,
      mflat, mabs)

r"""Pallas TPU kernel for the banded (S|R) translation contraction.

Computes, for each sphere pair p and harmonic tile (a, b):

    out[p, a, b] = sum_{n''=0}^{deg_a + deg_b} coef[p, n''] *
                   sum_q w_q Z_{n''}(x[p, q]) conjY[q, a] Y[q, b]

with Z the zonal Gegenbauer kernel evaluated by its three-term
recurrence *inside the kernel*.  Compared with the XLA band scan
(translation/_ops.py::_sr_banded) this kernel

  * never materializes the [pairs, Q, H] band-scaled harmonics temp
    (it lives tile-by-tile in VMEM),
  * truncates the band loop per tile at deg_a + deg_b (the exact Gaunt
    support) instead of running all 2 n_end - 1 bands everywhere,
  * keeps the Yo/Yi tiles resident across the whole band loop.

Grid: (pairs, H/TA, H/TB, Q/QC); the Q-chunk axis is innermost and
accumulates into the same output block (the zonal recurrence is
independent per quadrature point, so each chunk reruns its own band
recurrence).  Complex values are (re, im) pairs; the four real
[TA, QC] x [TB, QC]^T matmuls per band run on the MXU.

Mosaic constraints honored (found empirically on the axon backend):
every loop-carried vector is a 2-D [1, QC] row (1-D carries hit an
"Invalid relayout" bug); per-band complex coefficients are scalar-
prefetch SMEM operands (dynamic scalar indexing of VMEM is
unsupported); harmonic tiles are passed transposed [H, Q] so no
in-kernel transposes are needed; the degree-sum mask is a precomputed
[H, H] operand.

Enable via translation_matrix(..., use_pallas=True) or the
BHS_TPU_PALLAS=1 environment variable; the XLA band scan remains the
reference implementation (and the CPU/interpret path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import C

TA = 128
TB = 128
QC = 512


def _kernel(nb_total, fre_ref, fim_ref, yor_ref, yoi_ref, yir_ref, yii_ref,
            dsum_ref, ore_ref, oim_ref):
    from jax.experimental import pallas as pl

    qc_idx = pl.program_id(3)

    @pl.when(qc_idx == 0)
    def _init():
        ore_ref[...] = jnp.zeros_like(ore_ref)
        oim_ref[...] = jnp.zeros_like(oim_ref)

    yor = yor_ref[...]  # [TA, QC] (transposed tiles)
    yoi = yoi_ref[...]
    yir = yir_ref[...]  # [TB, QC]
    yii = yii_ref[...]
    dsum = dsum_ref[...]  # [TA, TB]
    nb_tile = jnp.minimum(jnp.max(dsum) + 1.0, float(nb_total)).astype(jnp.int32)

    dn = (((1,), (1,)), ((), ()))  # contract the QC axis of both operands
    prec = jax.lax.Precision.HIGHEST  # full-f32 MXU passes: the oscillatory
    # harmonic products cancel heavily; bf16 input rounding costs ~10%

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32, precision=prec
        )

    def band_step(n2i, carry):
        acc_re, acc_im = carry  # [TA, TB]
        # band kernel row (precomputed in XLA): dynamic slice, no carries
        fre = fre_ref[0, pl.ds(n2i, 1), :]  # [1, QC]
        fim = fim_ref[0, pl.ds(n2i, 1), :]
        s_re = yor * fre - yoi * fim  # [TA, QC]
        s_im = yor * fim + yoi * fre
        u_re = _dot(s_re, yir) - _dot(s_im, yii)
        u_im = _dot(s_re, yii) + _dot(s_im, yir)
        keep = dsum >= n2i.astype(dsum.dtype)
        acc_re = acc_re + jnp.where(keep, u_re, 0.0)
        acc_im = acc_im + jnp.where(keep, u_im, 0.0)
        return acc_re, acc_im

    acc0 = jnp.zeros((TA, TB), dtype=jnp.float32)
    acc_re, acc_im = jax.lax.fori_loop(0, nb_tile, band_step, (acc0, acc0))
    ore_ref[0, :, :] += acc_re
    oim_ref[0, :, :] += acc_im


def _band_kernels(d, x, w, coef):
    """XLA precompute of F[p, n'', q] = coef[p, n''] w_q Z_{n''}(x[p, q])."""
    from scipy.special import gamma as _g

    omega = float(2.0 * np.pi ** (d / 2.0) / _g(d / 2.0))
    nu = 0.5 * (d - 2.0)
    nb = coef.shape[-1]

    def step(carry, n2):
        c_prev, c_cur = carry
        zonal = (2.0 * n2 + d - 2.0) / ((d - 2.0) * omega) * c_cur  # [P, Q]
        c_next = (2.0 * (n2 + nu) * x * c_cur - (n2 + 2.0 * nu - 1.0) * c_prev) / (
            n2 + 1.0
        )
        return (c_cur, c_next), zonal

    ns = jnp.arange(nb, dtype=x.dtype)
    (_, _), zs = jax.lax.scan(step, (jnp.zeros_like(x), jnp.ones_like(x)), ns)
    zonal = jnp.moveaxis(zs, 0, 1)  # [P, NB, Q]
    return coef[..., None] * (zonal * w)  # C [P, NB, Q]


def sr_banded_pallas_padded(d, x, w, coef, yo_conj, yi, degrees, interpret=False):
    """Pad Q to a multiple of QC (zero weights) and H to a multiple of the
    tile (zero-padded harmonics; columns sliced off) before the kernel."""
    p, q = x.shape
    h = yo_conj.shape[-1]
    qp = -(-q // QC) * QC
    hp = -(-h // max(TA, TB)) * max(TA, TB)
    if qp != q:
        x = jnp.pad(x, ((0, 0), (0, qp - q)))
        w = jnp.pad(w, (0, qp - q))
        yo_conj = C(
            jnp.pad(yo_conj.re, ((0, qp - q), (0, 0))),
            jnp.pad(yo_conj.im, ((0, qp - q), (0, 0))),
        )
        yi = C(
            jnp.pad(yi.re, ((0, qp - q), (0, 0))),
            jnp.pad(yi.im, ((0, qp - q), (0, 0))),
        )
    if hp != h:
        yo_conj = C(
            jnp.pad(yo_conj.re, ((0, 0), (0, hp - h))),
            jnp.pad(yo_conj.im, ((0, 0), (0, hp - h))),
        )
        yi = C(
            jnp.pad(yi.re, ((0, 0), (0, hp - h))),
            jnp.pad(yi.im, ((0, 0), (0, hp - h))),
        )
        degrees = jnp.pad(degrees, (0, hp - h))
    out = sr_banded_pallas(d, x, w, coef, yo_conj, yi, degrees, interpret)
    if hp != h:
        out = out[..., :h, :h]
    return out


@functools.partial(jax.jit, static_argnums=(0, 7))
def sr_banded_pallas(d, x, w, coef, yo_conj, yi, degrees, interpret=False):
    """Banded SR contraction via the Pallas kernel.

    d: dimension (static); x: [P, Q] cos(gamma); w: [Q]; coef: C [P, NB]
    (A_d i^{n''} h_{n''}(k|t|)); yo_conj, yi: C [Q, H]; degrees: [H] int.
    Returns C [P, H, H] (WITHOUT the i^{n'-n} phase factor).
    """
    from functools import partial

    from jax.experimental import pallas as pl

    p, q = x.shape
    h = yo_conj.shape[-1]
    nb = coef.shape[-1]
    if h % TA or h % TB or q % QC:
        raise ValueError(f"shapes must tile: H={h} (TA={TA}), Q={q} (QC={QC})")
    deg_f = degrees.astype(jnp.float32)
    dsum = deg_f[:, None] + deg_f[None, :]  # [H, H]

    f_bands = _band_kernels(
        float(d), x.astype(jnp.float32), w.astype(jnp.float32), coef.astype(jnp.float32)
    )  # C [P, NB, Q]

    grid = (p, h // TA, h // TB, q // QC)
    in_specs = [
        pl.BlockSpec((1, nb, QC), lambda pp, a, b, qc: (pp, 0, qc)),  # F re
        pl.BlockSpec((1, nb, QC), lambda pp, a, b, qc: (pp, 0, qc)),  # F im
        pl.BlockSpec((TA, QC), lambda pp, a, b, qc: (a, qc)),  # yoT re
        pl.BlockSpec((TA, QC), lambda pp, a, b, qc: (a, qc)),  # yoT im
        pl.BlockSpec((TB, QC), lambda pp, a, b, qc: (b, qc)),  # yiT re
        pl.BlockSpec((TB, QC), lambda pp, a, b, qc: (b, qc)),  # yiT im
        pl.BlockSpec((TA, TB), lambda pp, a, b, qc: (a, b)),  # dsum
    ]
    out_specs = [
        pl.BlockSpec((1, TA, TB), lambda pp, a, b, qc: (pp, a, b)),
        pl.BlockSpec((1, TA, TB), lambda pp, a, b, qc: (pp, a, b)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p, h, h), jnp.float32),
        jax.ShapeDtypeStruct((p, h, h), jnp.float32),
    ]
    kernel = partial(_kernel, nb)
    ore, oim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        f_bands.re,
        f_bands.im,
        yo_conj.re.T.astype(jnp.float32),
        yo_conj.im.T.astype(jnp.float32),
        yi.re.T.astype(jnp.float32),
        yi.im.T.astype(jnp.float32),
        dsum,
    )
    return C(ore, oim)

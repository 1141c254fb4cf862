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
recurrence).  Complex values are (re, im) pairs throughout; the four
real [TA, QC] x [QC, TB] matmuls per band run on the MXU.

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


def _kernel(d, omega, nb_total, x_ref, w_ref, cre_ref, cim_ref, yor_ref,
            yoi_ref, yir_ref, yii_ref, dega_ref, degb_ref, ore_ref, oim_ref):
    from jax.experimental import pallas as pl

    qc_idx = pl.program_id(3)

    @pl.when(qc_idx == 0)
    def _init():
        ore_ref[...] = jnp.zeros_like(ore_ref)
        oim_ref[...] = jnp.zeros_like(oim_ref)

    x = x_ref[0, :]  # [QC]
    wv = w_ref[0, :]
    yor = yor_ref[...]  # [QC, TA]
    yoi = yoi_ref[...]
    yir = yir_ref[...]  # [QC, TB]
    yii = yii_ref[...]
    dega = dega_ref[0, :]  # [TA] (float degrees)
    degb = degb_ref[0, :]
    dsum = dega[:, None] + degb[None, :]  # [TA, TB]
    nb_tile = jnp.minimum(
        jnp.max(dega) + jnp.max(degb) + 1.0, float(nb_total)
    ).astype(jnp.int32)

    nu = 0.5 * (d - 2.0)

    def band_step(n2i, carry):
        c_prev, c_cur, acc_re, acc_im = carry
        n2 = n2i.astype(x.dtype)
        zonal = (2.0 * n2 + d - 2.0) / ((d - 2.0) * omega) * c_cur  # [QC]
        f = wv * zonal
        cre = cre_ref[0, n2i]
        cim = cim_ref[0, n2i]
        # scaled = conjY * (coef * f)  (coef complex scalar, f real vector)
        fre = f * cre
        fim = f * cim
        s_re = yor * fre[:, None] - yoi * fim[:, None]  # [QC, TA]
        s_im = yor * fim[:, None] + yoi * fre[:, None]
        u_re = jnp.dot(s_re.T, yir, preferred_element_type=jnp.float32) - jnp.dot(
            s_im.T, yii, preferred_element_type=jnp.float32
        )
        u_im = jnp.dot(s_re.T, yii, preferred_element_type=jnp.float32) + jnp.dot(
            s_im.T, yir, preferred_element_type=jnp.float32
        )
        keep = dsum >= n2
        acc_re = acc_re + jnp.where(keep, u_re, 0.0)
        acc_im = acc_im + jnp.where(keep, u_im, 0.0)
        c_next = (2.0 * (n2 + nu) * x * c_cur - (n2 + 2.0 * nu - 1.0) * c_prev) / (
            n2 + 1.0
        )
        return c_cur, c_next, acc_re, acc_im

    c0 = jnp.ones_like(x)
    cm1 = jnp.zeros_like(x)
    acc0 = jnp.zeros((TA, TB), dtype=jnp.float32)
    _, _, acc_re, acc_im = jax.lax.fori_loop(
        0, nb_tile, band_step, (cm1, c0, acc0, acc0)
    )
    ore_ref[0, :, :] += acc_re
    oim_ref[0, :, :] += acc_im


def sr_banded_pallas_padded(d, x, w, coef, yo_conj, yi, degrees, interpret=False):
    """Pad Q to a multiple of QC (zero weights) and H to a multiple of the
    tile (sentinel degrees; columns sliced off) before the kernel."""
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
    from scipy.special import gamma as _g

    p, q = x.shape
    h = yo_conj.shape[-1]
    nb = coef.shape[-1]
    if h % TA or h % TB or q % QC:
        raise ValueError(f"shapes must tile: H={h} (TA={TA}), Q={q} (QC={QC})")
    omega = float(2.0 * np.pi ** (d / 2.0) / _g(d / 2.0))
    deg_f = degrees.astype(jnp.float32).reshape(1, h)
    w2 = w.reshape(1, q).astype(jnp.float32)

    grid = (p, h // TA, h // TB, q // QC)
    out_shape = [
        jax.ShapeDtypeStruct((p, h, h), jnp.float32),
        jax.ShapeDtypeStruct((p, h, h), jnp.float32),
    ]
    kernel = partial(_kernel, float(d), omega, nb)
    in_specs = [
        pl.BlockSpec((1, QC), lambda pp, a, b, qc: (pp, qc)),  # x
        pl.BlockSpec((1, QC), lambda pp, a, b, qc: (0, qc)),  # w
        pl.BlockSpec((1, nb), lambda pp, a, b, qc: (pp, 0)),  # coef re
        pl.BlockSpec((1, nb), lambda pp, a, b, qc: (pp, 0)),  # coef im
        pl.BlockSpec((QC, TA), lambda pp, a, b, qc: (qc, a)),  # yo re
        pl.BlockSpec((QC, TA), lambda pp, a, b, qc: (qc, a)),  # yo im
        pl.BlockSpec((QC, TB), lambda pp, a, b, qc: (qc, b)),  # yi re
        pl.BlockSpec((QC, TB), lambda pp, a, b, qc: (qc, b)),  # yi im
        pl.BlockSpec((1, TA), lambda pp, a, b, qc: (0, a)),  # deg a
        pl.BlockSpec((1, TB), lambda pp, a, b, qc: (0, b)),  # deg b
    ]
    out_specs = [
        pl.BlockSpec((1, TA, TB), lambda pp, a, b, qc: (pp, a, b)),
        pl.BlockSpec((1, TA, TB), lambda pp, a, b, qc: (pp, a, b)),
    ]
    ore, oim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        w2,
        coef.re.astype(jnp.float32),
        coef.im.astype(jnp.float32),
        yo_conj.re.astype(jnp.float32),
        yo_conj.im.astype(jnp.float32),
        yi.re.astype(jnp.float32),
        yi.im.astype(jnp.float32),
        deg_f,
        deg_f,
    )
    return C(ore, oim)

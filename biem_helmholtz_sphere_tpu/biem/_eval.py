r"""Scattered-field evaluation u_scat(x) (reference: biem_u, _biem.py:822-977).

Near field (x outside all spheres):

    u_scat(x) = sum_b sum_h phi[b,h] blc_{n_h}(rho_b, eta) h^{(1)}_{n_h}(k r_b)
                Y_h(x^_b),        r_b = |x - c_b|

Far field (x^ a unit direction):

    u_inf(x^) = (ik)^{-(d-1)/2} sum_b e^{-i k x^.c_b}
                sum_h (-i)^{n_h} phi[b,h] blc_{n_h}(rho_b, eta) Y_h(x^)

Invalid regions (inside a sphere for kind="outer", outside for "inner")
are NaN-masked functionally with cplx.where (the reference uses in-place
boolean assignment, _biem.py:971-976, which cannot trace under jit).
All complex values are real-pair C.
"""

import jax.numpy as jnp
import numpy as np

from ..coords import from_cartesian
from ..harmonics._eval import harmonics
from ..harmonics._index import assume_n_end_from_num, basis
from ..ops import cplx
from ..ops.cplx import C
from ..special._family import spherical_h_scaled
from ._eval_fused import fused_ba_dot, is_ba_tree
from ._layer import blc


def _h_clamped(d, n_end, z):
    """Outgoing radial table h_n(z) with overflow-clamped magnitude.

    For degrees far beyond convergence |h_n(kr)| overflows float32; the
    density there has underflowed to exactly 0 (its true value makes the
    product negligible — see _core._radial_rows_scaled), so the clamp
    only prevents 0 * inf = NaN from poisoning the harmonic sum.  For
    any representable density the true product is bounded, which forces
    the exponent below the clamp — so clamping never changes a
    contributing term.  Upward-only recurrence: cheaper than the full
    j+h table the unclamped path computed.
    """
    hm, he = spherical_h_scaled(d, n_end, z)
    lim = 80.0 if jnp.finfo(he.dtype).bits == 32 else 700.0
    return hm * jnp.exp(jnp.minimum(he, lim))


def biem_u(res, x, /, far_field=False, per_ball=False, expand_x=True):
    """Scattered field at cartesian points x: C.

    x: [c_ndim, ...(x)] if expand_x else [c_ndim, ...(x), ...(first)].
    Returns [...(x), ...(first)] (plus trailing B if per_ball).
    """
    if res.density is None:
        raise ValueError("The BIEMResult does not have density.")
    c = res.c
    d = c.c_ndim
    density = res.density
    n_end = assume_n_end_from_num(c, density.shape[-1])
    b_ = basis(c, n_end)
    n_idx = jnp.asarray(b_.n_root)
    centers = res.centers  # [...first, B, d]
    radii = res.radii
    k = res.k
    eta = res.eta
    ndim_first = k.ndim
    kind = res.kind

    x = jnp.asarray(x)
    ndim_x = x.ndim - 1 - (0 if expand_x else ndim_first)
    if expand_x:
        x_ = x[(...,) + (None,) * (ndim_first + 1)]  # [d, ...x, 1*first, 1(B)]
    else:
        x_ = x[..., None]  # [d, ...x, ...first, 1(B)]

    centers_t = jnp.moveaxis(centers, -1, 0)  # [d, ...first, B]
    centers_e = centers_t[(slice(None),) + (None,) * ndim_x + (...,)]
    rel = x_ - centers_e
    sph = from_cartesian(c, rel)
    r = sph["r"]  # [...x, ...first, B]

    def _expand_k(extra):
        if isinstance(k, C):
            return C(
                k.re[(None,) * ndim_x + (...,) + (None,) * extra],
                k.im[(None,) * ndim_x + (...,) + (None,) * extra],
            )
        return k[(None,) * ndim_x + (...,) + (None,) * extra]

    k_e = _expand_k(1)  # [...1, ...first, 1]
    radii_e = radii[(None,) * ndim_x + (...,)]  # [...1, ...first, B]
    eta_e = eta[(None,) * ndim_x + (...,) + (None,)]

    # combined-field coefficient on each source sphere: C [..., B, H]
    # (blc appends the harmonic axis itself; eta_e already carries the B axis)
    sd = blc(c, n_end, k_e, radii_e, eta_e)
    fused = is_ba_tree(c)
    if not far_field and not fused:
        h = _h_clamped(d, n_end, k_e * r)
        sd = sd * cplx.take(h, n_idx, axis=-1)

    dens = density[(None,) * ndim_x + (...,)]

    if far_field:
        # Y is evaluated at the observation direction x^ itself (the
        # asymptotic direction is the same for every sphere).  The
        # reference evaluates Y at the direction of (x^ - c_b)
        # (_biem.py:885,922), which does not converge to the true
        # far-field pattern for off-center spheres; we keep the correct
        # asymptotics here.
        phase_n = cplx.ipow(-b_.n_root.astype(np.int64))
        kk = k_e if isinstance(k_e, C) else C.of(k_e)
        pref = 1.0 / cplx.cpow(kk * 1j, (d - 1) / 2.0)
        phase_b = cplx.exp(kk * jnp.sum(x_ * -centers_e, axis=0) * 1j)
        farcoef = pref * phase_b  # [...x, ...first, B]
        if fused:
            sph_dir = from_cartesian(c, x_)
            u = fused_ba_dot(
                c,
                n_end,
                dens * sd * phase_n,
                sph_dir[c.root.nid],
                sph_dir[c.root.children[0].nid],
            ) * farcoef
        else:
            y = harmonics(c, from_cartesian(c, x_), n_end)
            u = (dens * sd * y * phase_n).sum(axis=-1) * farcoef
        if per_ball:
            return u
        return u.sum(axis=-1)

    if fused:
        # 3D fast path: the density contraction is accumulated inside
        # the Jacobi recurrence scan (no [points, B, H] temporaries) and
        # the per-point radial factor h_l(kr) is folded in by degree.
        h = _h_clamped(d, n_end, k_e * r)
        u = fused_ba_dot(
            c,
            n_end,
            dens * sd,
            sph[c.root.nid],
            sph[c.root.children[0].nid],
            rad=h,
        )
    else:
        y = harmonics(c, sph, n_end)  # C [...x, ...first, B, H]
        u = (dens * sd * y).sum(axis=-1)  # [...x, ...first, B]
    if not per_ball:
        u = u.sum(axis=-1)

    if kind == "outer":
        invalid = jnp.any(r < radii_e, axis=-1)
    elif kind == "inner":
        invalid = jnp.any(r > radii_e, axis=-1)
    else:
        raise ValueError(f"Invalid kind: {kind}")
    if per_ball:
        invalid = invalid[..., None]
    return cplx.where(invalid, C(jnp.nan, jnp.nan), u)

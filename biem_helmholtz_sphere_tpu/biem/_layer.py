r"""Layer-potential coefficients in the harmonic basis.

On a sphere of radius rho the single/double layer operators are diagonal
per harmonic degree n (reference docstring _biem.py:516-518):

    slc_n(rho) = i k^{d-2} rho^{d-1} j_n(k rho)
    dlc_n(rho) = i k^{d-1} rho^{d-1} j_n'(k rho)
    blc_n(rho, eta) = dlc_n(rho) - i eta slc_n(rho)     (combined field)

The potential of a density Y_h on the sphere, evaluated at radius r > rho,
is  slc_n(rho) h^{(1)}_n(k r) Y_h(x^)  (similarly dlc) — equivalently the
reference's `potential_coef(..., for_func="harmonics")`, while
`for_func="solution"` omits the outgoing h factor (used in assembly and
in the far field; reference: _biem.py:654-673, 896-915).  All values are
real-pair complex (ops/cplx.py).
"""

import jax.numpy as jnp

from ..harmonics._index import basis
from ..ops import cplx
from ..ops.cplx import C
from ..special._family import spherical_jh_all


def _times_k(k, x):
    """k * x for k real array or C."""
    return C.of(k) * x if isinstance(k, C) else jnp.asarray(k) * x


def layer_tables(d, n_end, k, rho):
    """(j, jp, h, hp) order tables at z = k*rho: each C [..., n_end]."""
    return spherical_jh_all(d, n_end, _times_k(k, jnp.asarray(rho)))


def slc_dlc(c, n_end, k, rho):
    """(slc, dlc) per flat harmonic: C [..., H]."""
    d = c.c_ndim
    b = basis(c, n_end)
    kk = k if isinstance(k, C) else C.of(jnp.asarray(k))
    rho = jnp.asarray(rho)
    j, jp, _, _ = layer_tables(d, n_end, k, rho)
    n_idx = jnp.asarray(b.n_root)
    pref = (kk ** (d - 2) * rho ** (d - 1) * 1j)[..., None]
    slc = pref * cplx.take(j, n_idx, axis=-1)
    dlc = pref * kk[..., None] * cplx.take(jp, n_idx, axis=-1)
    return slc, dlc


def blc(c, n_end, k, rho, eta):
    """Combined-field coefficient dlc - i eta slc per flat harmonic [..., H]."""
    s, dl = slc_dlc(c, n_end, k, rho)
    return dl - s * jnp.asarray(eta)[..., None] * 1j


def _gather_order(tab, n):
    """Elementwise tab[..., n[...]] with n broadcast to tab's batch shape."""
    idx = jnp.broadcast_to(n.astype(jnp.int32), tab.shape[:-1])
    return cplx.take_along_axis(tab, idx[..., None], axis=-1)[..., 0]


def potential_coef(
    n, d, k, y_abs, x_abs=None, derivative="S", limit=True, for_func="solution"
):
    """Reference-compatible `ultrasphere.potential_coef` (call sites:
    _biem.py:654-672, 723-741, 896-914), elementwise in (n, k, y_abs, x_abs).

    n: integer array of harmonic degrees.  derivative: "S" or "D".
    for_func: "solution" -> bare slc/dlc; "harmonics" -> additionally
    multiplied by the outgoing factor h^{(1)}_n(k * x_abs).  Returns C.
    """
    n = jnp.asarray(n)
    kk = k if isinstance(k, C) else C.of(jnp.asarray(k))
    y_abs = jnp.asarray(y_abs)
    shape = jnp.broadcast_shapes(n.shape, kk.shape, y_abs.shape)
    kk = cplx.broadcast_to(kk, shape)
    y_abs = jnp.broadcast_to(y_abs, shape)
    n_end = int(n.max()) + 1
    j, jp, _, _ = spherical_jh_all(int(d), n_end, kk * y_abs)
    pref = kk ** (d - 2) * y_abs ** (d - 1) * 1j
    if derivative == "S":
        coef = pref * _gather_order(j, n)
    elif derivative == "D":
        coef = pref * kk * _gather_order(jp, n)
    else:
        raise ValueError(f"derivative must be 'S' or 'D', got {derivative!r}")
    if for_func == "harmonics":
        if x_abs is None:
            raise ValueError("x_abs required for for_func='harmonics'")
        x_abs = jnp.broadcast_to(jnp.asarray(x_abs), shape)
        _, _, hx, _ = spherical_jh_all(int(d), n_end, kk * x_abs)
        coef = coef * _gather_order(hx, n)
    elif for_func != "solution":
        raise ValueError(
            f"for_func must be 'solution' or 'harmonics', got {for_func!r}"
        )
    return coef

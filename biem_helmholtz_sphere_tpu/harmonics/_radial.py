"""Radial factors per flat harmonic: j_n(kr), h^{(1)}_n(kr), derivatives.

Rebuild of `ultrasphere_harmonics.harmonics_regular_singular_component`
(reference call sites: _biem.py:752-788).
"""

import jax.numpy as jnp

from ..ops import cplx
from ..special._family import spherical_jh_all
from ._index import basis


def regular_singular_component(c, r, n_end, k, type="regular", derivative=False):
    """[..., num] radial factor per flat harmonic at radius r, wavenumber k.

    type="regular" -> j_n (or j_n'); type="singular" -> h^{(1)}_n (or h').
    r and k broadcast together; the harmonic axis is appended last.
    """
    b = basis(c, n_end)
    z = cplx.C.of(k) * jnp.asarray(r) if isinstance(k, cplx.C) else jnp.asarray(k) * jnp.asarray(r)
    j, jp, h, hp = spherical_jh_all(c.c_ndim, n_end, z)
    if type == "regular":
        tab = jp if derivative else j
    elif type == "singular":
        tab = hp if derivative else h
    else:
        raise ValueError(f"invalid type {type!r}")
    return cplx.take(tab, jnp.asarray(b.n_root), axis=-1)

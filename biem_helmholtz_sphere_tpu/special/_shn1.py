"""Single-order spherical Hankel/Bessel evaluation.

API parity with the reference's `ultrasphere.shn1(n, d, z, derivative=...)`
(used for point sources and the single-sphere fast path; reference:
_biem.py:440-447, 676-685).  Returns the real-pair complex type C.
"""

from ._family import spherical_jh_all


def shn1(n, d, z, derivative=False):
    """d-dimensional spherical Hankel h^{(1)}_n(z) (or its derivative)."""
    n = int(n)
    _, _, h, hp = spherical_jh_all(int(d), n + 1, z)
    return hp[..., n] if derivative else h[..., n]


def sjn(n, d, z, derivative=False):
    """d-dimensional spherical Bessel j_n(z) (or its derivative)."""
    n = int(n)
    j, jp, _, _ = spherical_jh_all(int(d), n + 1, z)
    return jp[..., n] if derivative else j[..., n]

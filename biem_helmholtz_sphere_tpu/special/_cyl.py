"""Complex-argument cylinder Bessel seeds J0, J1, H1_0, H1_1.

These are the only transcendental seeds the whole framework needs: every
d-dimensional spherical Bessel/Hankel function reduces to either the 2D
(integer-order cylinder) family or the 3D (half-integer, trigonometric)
family via j_n^{(d)}(z) = z^{-m} j^{(base)}_{n+m}(z) with d = base + 2m
(see special/_family.py).  The reference obtains these from scipy.special
(C/Fortran; reference: uv.lock:1723 via ultrasphere); here they are pure
JAX so they trace, jit, vmap and run on TPU.

Algorithm: ascending power series for |z| <= CUT (DLMF 10.2.2, 10.8.1),
Hankel asymptotic expansions for |z| > CUT (DLMF 10.17.5-6).  Accuracy at
the seam is ~1e-12 relative in float64.  Valid for Re z >= 0 (z = k*r with
r > 0, Re k >= 0); moderate Im z supported (|Im z| large degrades the
series branch through cancellation, matching the reference's domain of
practical use).
"""

import jax.numpy as jnp
import numpy as np

_EULER_GAMMA = 0.5772156649015328606
_CUT = 14.0
_N_SERIES = 42
_N_ASYM = 24


def _series_j01(z):
    """J0, J1 by ascending series: sum_k (-1)^k (z/2)^(2k+n) / (k! (k+n)!)."""
    q = (z / 2.0) ** 2  # (z/2)^2
    # Horner over k, highest term first.
    j0 = jnp.zeros_like(z)
    j1 = jnp.zeros_like(z)
    for k in range(_N_SERIES - 1, -1, -1):
        # log-space factorials: coefficients stay finite for all k
        lf_k = float(np.sum(np.log(np.arange(1, k + 1)))) if k > 0 else 0.0
        c0 = (-1.0) ** k * np.exp(-2.0 * lf_k)
        c1 = (-1.0) ** k * np.exp(-2.0 * lf_k - np.log(k + 1.0))
        j0 = j0 * q + c0
        j1 = j1 * q + c1
    return j0, j1 * (z / 2.0)


def _series_y01(z, j0, j1):
    """Y0, Y1 by the logarithmic ascending series (DLMF 10.8.1)."""
    q = (z / 2.0) ** 2
    lg = jnp.log(z / 2.0) + _EULER_GAMMA
    # Y0 = (2/pi) [ lg * J0 + sum_{k>=1} (-1)^{k+1} H_k q^k / (k!)^2 ]
    s0 = jnp.zeros_like(z)
    hk = 0.0
    coef0 = []
    for k in range(1, _N_SERIES):
        hk += 1.0 / k
        lf_k = float(np.sum(np.log(np.arange(1, k + 1))))
        coef0.append((-1.0) ** (k + 1) * hk * np.exp(-2.0 * lf_k))
    for c in reversed(coef0):
        s0 = (s0 + c) * q
    y0 = (2.0 / np.pi) * (lg * j0 + s0)

    # Y1 = (2/pi) lg J1 - (2/(pi z))
    #      - (1/pi) sum_{k>=0} (-1)^k (psi(k+1)+psi(k+2)) (z/2)^{2k+1} / (k!(k+1)!)
    s1 = jnp.zeros_like(z)
    coef1 = []
    psi1 = -_EULER_GAMMA
    for k in range(_N_SERIES):
        psi2 = psi1 + 1.0 / (k + 1.0)
        lf_k = float(np.sum(np.log(np.arange(1, k + 1)))) if k > 0 else 0.0
        lf_k1 = lf_k + np.log(k + 1.0)
        coef1.append((-1.0) ** k * (psi1 + psi2) * np.exp(-lf_k - lf_k1))
        psi1 = psi2
    for c in reversed(coef1):
        s1 = s1 * q + c
    # NOTE: Y1 (DLMF 10.8.1) uses plain ln(z/2); gamma is inside the psi terms.
    y1 = (
        (2.0 / np.pi) * (lg - _EULER_GAMMA) * j1
        - 2.0 / (np.pi * z)
        - (1.0 / np.pi) * s1 * (z / 2.0)
    )
    return y0, y1


def _asym_h1(nu, z):
    """H^{(1)}_nu(z) by the Hankel asymptotic expansion (DLMF 10.17.5)."""
    mu = 4.0 * nu * nu
    s = jnp.zeros_like(z)
    # a_k(nu) = prod_{j=1..k} (mu - (2j-1)^2) / (k! 8^k); series sum_k i^k a_k / z^k
    coefs = []
    a = 1.0
    for k in range(1, _N_ASYM):
        a *= (mu - (2.0 * k - 1.0) ** 2) / (k * 8.0)
        coefs.append((1j) ** k * a)
    inv = 1.0 / z
    for c in reversed(coefs):
        s = (s + c) * inv
    s = 1.0 + s
    omega = z - (0.5 * nu + 0.25) * np.pi
    return jnp.sqrt(2.0 / (np.pi * z)) * jnp.exp(1j * omega) * s


def _asym_h2(nu, z):
    """H^{(2)}_nu(z) by the conjugate asymptotic expansion (DLMF 10.17.6)."""
    mu = 4.0 * nu * nu
    s = jnp.zeros_like(z)
    coefs = []
    a = 1.0
    for k in range(1, _N_ASYM):
        a *= (mu - (2.0 * k - 1.0) ** 2) / (k * 8.0)
        coefs.append((-1j) ** k * a)
    inv = 1.0 / z
    for c in reversed(coefs):
        s = (s + c) * inv
    s = 1.0 + s
    omega = z - (0.5 * nu + 0.25) * np.pi
    return jnp.sqrt(2.0 / (np.pi * z)) * jnp.exp(-1j * omega) * s


def cyl_jh01(z):
    """Return (J0, J1, H1_0, H1_1) at complex z, elementwise.

    Replaces scipy.special.{j0,j1,hankel1} on the JAX compute path
    (reference capability: SURVEY.md section 2.4 item 2).
    """
    z = jnp.asarray(z)
    if not jnp.issubdtype(z.dtype, jnp.complexfloating):
        z = z * (1.0 + 0.0j)  # weak-typed promotion respects x64 setting
    big = jnp.abs(z) > _CUT
    # Evaluate both branches on safe arguments to avoid inf/nan pollution.
    z_small = jnp.where(big, jnp.ones_like(z), z)
    z_big = jnp.where(big, z, jnp.full_like(z, 2.0 * _CUT))

    j0_s, j1_s = _series_j01(z_small)
    y0_s, y1_s = _series_y01(z_small, j0_s, j1_s)
    h0_s = j0_s + 1j * y0_s
    h1_s = j1_s + 1j * y1_s

    h1a_0 = _asym_h1(0.0, z_big)
    h1a_1 = _asym_h1(1.0, z_big)
    h2a_0 = _asym_h2(0.0, z_big)
    h2a_1 = _asym_h2(1.0, z_big)
    j0_a = 0.5 * (h1a_0 + h2a_0)
    j1_a = 0.5 * (h1a_1 + h2a_1)

    j0 = jnp.where(big, j0_a, j0_s)
    j1 = jnp.where(big, j1_a, j1_s)
    h0 = jnp.where(big, h1a_0, h0_s)
    h1 = jnp.where(big, h1a_1, h1_s)
    return j0, j1, h0, h1

"""Tests for the special-function foundation layer.

Strategy (mirrors SURVEY.md section 4 implications): scipy as the oracle
for Bessel/Hankel (the reference consumed scipy.special through
`ultrasphere`), plus identity-based checks (Wronskian, orthonormality,
quadrature exactness) that do not rely on any external oracle.
"""

import numpy as np

from biem_helmholtz_sphere_tpu.ops.cplx import to_numpy as tonp
import pytest
import scipy.special as sp

from biem_helmholtz_sphere_tpu.special import (
    gauss_jacobi,
    orthonormal_jacobi_table,
    shn1,
    sjn,
    spherical_jh_all,
    uniform_circle,
)

Z = np.array([0.2, 1.0, 2.0, 5.0, 13.9, 14.1, 30.0, 120.0, 1000.0])
N_END = 36


def _ref_jh(d, n_end, z):
    nu = (d - 2) / 2.0
    n = np.arange(n_end)
    c = np.sqrt(np.pi / 2.0)
    j = c * z ** (-nu) * sp.jv(n + nu, z)
    h = c * z ** (-nu) * (sp.jv(n + nu, z) + 1j * sp.yv(n + nu, z))
    return j, h


@pytest.mark.parametrize("d", [2, 3, 4, 5, 6, 7])
def test_spherical_jh_vs_scipy(d):
    j, jp, h, hp = (tonp(a) for a in spherical_jh_all(d, N_END, Z))
    for i, z in enumerate(Z):
        jref, href = _ref_jh(d, N_END, z)
        finite = np.isfinite(href)
        np.testing.assert_allclose(j[i], jref, rtol=5e-9, atol=1e-280)
        np.testing.assert_allclose(h[i][finite], href[finite], rtol=5e-9)


@pytest.mark.parametrize("d", [2, 3, 4, 5])
def test_derivatives_by_finite_difference(d):
    eps = 1e-6
    for z in [0.7, 3.3, 17.0, 80.0]:
        jm, _, hm, _ = spherical_jh_all(d, 20, np.array(z - eps))
        jp_, _, hp_, _ = spherical_jh_all(d, 20, np.array(z + eps))
        j, jd, h, hd = spherical_jh_all(d, 20, np.array(z))
        np.testing.assert_allclose(
            tonp(jd), (tonp(jp_) - tonp(jm)) / (2 * eps), rtol=2e-4, atol=1e-12
        )
        np.testing.assert_allclose(
            tonp(hd), (tonp(hp_) - tonp(hm)) / (2 * eps), rtol=2e-4, atol=1e-12
        )


@pytest.mark.parametrize("d", [2, 3, 4, 6])
def test_wronskian_identity(d):
    # j_{n+1} h_n - j_n h_{n+1} = i / z^{d-1}  (exact Wronskian of the pair)
    z = np.array([0.5, 2.0, 9.0, 33.0])
    j, _, h, _ = (tonp(a) for a in spherical_jh_all(d, 25, z))
    w = j[:, 1:] * h[:, :-1] - j[:, :-1] * h[:, 1:]
    target = (1j * z ** (1.0 - d))[:, None] * np.ones_like(w)
    np.testing.assert_allclose(w, target, rtol=1e-9)


def test_complex_argument():
    zc = np.array([0.5 + 0.2j, 3.0 + 1.0j, 20.0 + 4.0j, 7.0 + 0.0j])
    for d in (2, 3, 4):
        nu = (d - 2) / 2.0
        n = np.arange(15)
        j, _, h, _ = (tonp(a) for a in spherical_jh_all(d, 15, zc))
        c = np.sqrt(np.pi / 2.0)
        for i, z in enumerate(zc):
            jref = c * z ** (-nu) * sp.jv(n + nu, z)
            href = c * z ** (-nu) * (sp.jv(n + nu, z) + 1j * sp.yv(n + nu, z))
            np.testing.assert_allclose(j[i], jref, rtol=5e-10, atol=1e-250)
            np.testing.assert_allclose(h[i], href, rtol=5e-10)


def test_large_order_large_argument():
    # 2D k-sweep regime (reference: accuracy/accuracy_k_a.csv reaches
    # k = 4096, n_end = 3444)
    z = np.array([4096.0])
    j, _, h, _ = (tonp(a) for a in spherical_jh_all(2, 3500, z))
    n = np.arange(3500)
    c = np.sqrt(np.pi / 2.0)
    jref = c * sp.jv(n, 4096.0)
    np.testing.assert_allclose(j[0], jref, rtol=0, atol=np.abs(jref).max() * 1e-9)


def test_shn1_sjn_single_order():
    z = np.array([1.0, 4.0])
    np.testing.assert_allclose(
        tonp(shn1(2, 3, z)), sp.spherical_jn(2, z) + 1j * sp.spherical_yn(2, z), rtol=1e-10
    )
    np.testing.assert_allclose(tonp(sjn(3, 3, z)), sp.spherical_jn(3, z), rtol=1e-10)
    np.testing.assert_allclose(
        tonp(sjn(1, 3, z, derivative=True)),
        sp.spherical_jn(1, z, derivative=True),
        rtol=1e-9,
    )


@pytest.mark.parametrize(
    "alpha,beta", [(0.0, 0.0), (0.5, 0.5), (2.0, 2.0), (3.5, 1.0), (10.5, 0.5)]
)
def test_gauss_jacobi_orthonormality(alpha, beta):
    # The rule must make the orthonormal Jacobi family exactly orthonormal.
    q = 24
    x, w = gauss_jacobi(q, alpha, beta)
    t = tonp(orthonormal_jacobi_table(x, q - 1, [alpha], [beta]))[:, 0, :]
    gram = (t * w[:, None]).T @ t
    np.testing.assert_allclose(gram, np.eye(q), atol=1e-10)


def test_gauss_jacobi_vs_scipy():
    x, w = gauss_jacobi(17, 1.5, 0.5)
    xs, ws = sp.roots_jacobi(17, 1.5, 0.5)
    np.testing.assert_allclose(np.sort(x), np.sort(xs), atol=1e-13)
    np.testing.assert_allclose(w[np.argsort(x)], ws[np.argsort(xs)], rtol=1e-11)


def test_uniform_circle_exactness():
    phi, w = uniform_circle(11)
    for m in range(-10, 11):
        val = np.sum(w * np.exp(1j * m * phi))
        np.testing.assert_allclose(val, 2 * np.pi if m == 0 else 0.0, atol=1e-12)

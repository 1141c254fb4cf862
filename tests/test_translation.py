"""Translation-operator tests: addition theorem, parity, stability.

The decisive test is translate-then-evaluate == evaluate (SURVEY.md
section 7 step 4): S_h(y+t) must equal sum_{h'} (S|R)[h',h](t) R_{h'}(y).
"""

import jax.numpy as jnp
import numpy as np

from biem_helmholtz_sphere_tpu.ops.cplx import to_numpy as tonp
import pytest

from biem_helmholtz_sphere_tpu.coords import (
    create_from_branching_types,
    from_cartesian,
)
from biem_helmholtz_sphere_tpu.harmonics import basis, harmonics
from biem_helmholtz_sphere_tpu.special import spherical_jh_all
from biem_helmholtz_sphere_tpu.translation import translation_matrix

CASES = [("a", 18), ("a", 60), ("ba", 14), ("bpa", 10), ("caa", 7), ("bba", 7)]


def _fields(c, n_end, x, k):
    """(S_h(x), R_h(x)) for a single point x."""
    d = c.c_ndim
    b = basis(c, n_end)
    y = tonp(harmonics(c, from_cartesian(c, x.reshape(d, 1)), n_end))[0]
    r = float(np.linalg.norm(x))
    j, _, h, _ = (tonp(a) for a in spherical_jh_all(d, n_end, np.array(k * r)))
    return h[b.n_root] * y, j[b.n_root] * y


@pytest.mark.parametrize("btype,n_end", CASES)
def test_translation_addition_theorem(btype, n_end, rng):
    c = create_from_branching_types(btype)
    d = c.c_ndim
    b = basis(c, n_end)
    k = 1.3
    t = rng.normal(size=(d,))
    t *= 4.0 / np.linalg.norm(t)
    y = rng.normal(size=(d,))
    y *= 0.2 / np.linalg.norm(y)  # small |y|: series tail far below matrix error

    s_direct, r_direct = _fields(c, n_end, y + t, k)
    _, r_y = _fields(c, n_end, y, k)

    sr = tonp(
        translation_matrix(c, jnp.asarray(t)[:, None], n_end, np.array([k]), kind="SR")
    )[0]
    rr = tonp(
        translation_matrix(c, jnp.asarray(t)[:, None], n_end, np.array([k]), kind="RR")
    )[0]
    low = b.n_root <= min(5, n_end // 2)
    s_t = r_y @ sr
    r_t = r_y @ rr
    np.testing.assert_allclose(s_t[low], s_direct[low], rtol=3e-7)
    np.testing.assert_allclose(
        r_t[low], r_direct[low], rtol=3e-7, atol=np.abs(r_direct[low]).max() * 1e-10
    )


@pytest.mark.parametrize("btype,n_end", [("a", 12), ("ba", 8), ("caa", 5)])
def test_parity_relation(btype, n_end, rng):
    # SR(-t)[h',h] = (-1)^{n+n'} SR(t)[h',h]
    c = create_from_branching_types(btype)
    d = c.c_ndim
    b = basis(c, n_end)
    t = rng.normal(size=(d,))
    t *= 3.0 / np.linalg.norm(t)
    k = np.array([0.9])
    sr = tonp(
        translation_matrix(c, jnp.asarray(t)[:, None], n_end, k, kind="SR")
    )[0]
    srm = tonp(
        translation_matrix(c, -jnp.asarray(t)[:, None], n_end, k, kind="SR")
    )[0]
    par = (-1.0) ** (b.n_root[:, None] + b.n_root[None, :])
    np.testing.assert_allclose(
        srm, par * sr, atol=np.abs(sr).max() * 1e-12, rtol=1e-9
    )


def test_large_n_end_stability():
    # The naive dense evaluation is destroyed by eps*|h_{2n}(kt)| pollution
    # here (reference regime: accuracy sweeps at high n_end); the stable
    # paths must keep low-degree entries accurate.
    c = create_from_branching_types("ba")
    n_end = 24
    b = basis(c, n_end)
    t = np.array([0.0, 2.0, 3.0])
    k = np.array([1.0])
    sr = tonp(
        translation_matrix(c, jnp.asarray(t)[:, None], n_end, k, kind="SR")
    )[0]
    # exact low-degree column h=0: SR[h',0] = (A_d/sqrt(omega)) (-1)^{n'}
    #   h_{n'}(kt) conj(Y_{h'}(t^))  (from the triplet formula, h = 0)
    from scipy.special import gamma

    d = 3
    a_d = 2.0 ** ((d + 1) / 2) * np.pi ** ((d - 1) / 2)
    omega = 2 * np.pi ** (d / 2) / gamma(d / 2)
    yt = tonp(
        harmonics(c, from_cartesian(c, jnp.asarray(t).reshape(3, 1)), n_end)
    )[0]
    rt = np.linalg.norm(t)
    h = tonp(spherical_jh_all(3, n_end, np.array(rt))[2])
    col = a_d / np.sqrt(omega) * (-1.0) ** b.n_root * h[b.n_root] * np.conj(yt)
    h0 = int(np.where(b.n_root == 0)[0][0])
    # rtol accommodates the rotation+coaxial default path (~3.5e-10 at
    # n_end=24 in float64; the band scan sits below 1e-10)
    np.testing.assert_allclose(sr[:, h0], col, rtol=1e-9)


def test_method_constraints():
    c = create_from_branching_types("ba")
    t = jnp.asarray(np.array([[0.0], [0.0], [3.0]]))
    with pytest.raises(ValueError):
        translation_matrix(c, t, 4, np.array([1.0]), kind="SR", method="plane_wave")
    with pytest.raises(ValueError):
        translation_matrix(c, t, 4, np.array([1.0]), kind="XX")
    with pytest.raises(ValueError):
        translation_matrix(c, t, 4, np.array([1.0]), method="bogus")
    # gumerov (recurrence ladders) agrees with the quadrature algorithms
    a = tonp(translation_matrix(c, t, 4, np.array([1.0]), method="gumerov"))
    b_ = tonp(translation_matrix(c, t, 4, np.array([1.0]), method="triplet"))
    np.testing.assert_allclose(a, b_, rtol=1e-12, atol=np.abs(b_).max() * 1e-12)
    # and, like the reference (_biem.py:569-572), is restricted to "ba"
    for bad in ("a", "caa"):
        cb = create_from_branching_types(bad)
        tb = jnp.asarray(np.zeros((cb.c_ndim, 1)) + 2.0)
        with pytest.raises(ValueError):
            translation_matrix(cb, tb, 4, np.array([1.0]), method="gumerov")
    with pytest.raises(ValueError):
        translation_matrix(
            c, t, 4, np.array([1.0]), method="gumerov", n_end_add=3
        )


@pytest.mark.parametrize("kind", ["SR", "RR"])
@pytest.mark.parametrize("n_end", [6, 16])
def test_gumerov_coaxial_matches_quadrature(kind, n_end):
    # The G-D recurrence ladders (translation/_gumerov.py) against the
    # quadrature + band-masked coaxial factor, along-axis translation.
    from biem_helmholtz_sphere_tpu.translation import coaxial_sr, gd_coaxial

    c = create_from_branching_types("ba")
    r = jnp.asarray(np.array([1.7, 6.0]))
    k = jnp.asarray(1.1)
    a = tonp(gd_coaxial(c, r, n_end, k, kind=kind))
    b_ = tonp(coaxial_sr(c, r, n_end, k, kind=kind))
    np.testing.assert_allclose(a, b_, atol=np.abs(b_).max() * 1e-11)


def test_gumerov_full_matches_rotation(rng):
    from biem_helmholtz_sphere_tpu.translation import sr_gumerov, sr_rotation

    c = create_from_branching_types("ba")
    n_end = 8
    t = rng.normal(size=(3, 3))
    t *= 4.0 / np.linalg.norm(t, axis=0, keepdims=True)
    tj = jnp.asarray(t)
    k = jnp.asarray(1.3)
    sph = from_cartesian(c, tj)
    a = tonp(sr_gumerov(c, sph, n_end, k, t_cart=tj))
    b_ = tonp(sr_rotation(c, sph, n_end, k, t_cart=tj))
    np.testing.assert_allclose(a, b_, atol=np.abs(b_).max() * 1e-11)


def test_rectangular_n_end_add():
    c = create_from_branching_types("ba")
    t = jnp.asarray(np.array([[0.0], [0.0], [3.0]]))
    m = translation_matrix(c, t, 5, np.array([1.0]), n_end_add=3)
    assert m.shape == (1, 25, 9)

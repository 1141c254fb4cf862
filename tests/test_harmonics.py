"""Harmonics-layer tests: counts, orthonormality, addition theorem,
plane-wave identity, expansion round-trip."""

import jax.numpy as jnp
import numpy as np

from biem_helmholtz_sphere_tpu.ops.cplx import to_numpy as tonp
import pytest
from scipy.special import gamma

from biem_helmholtz_sphere_tpu.coords import (
    create_from_branching_types,
    from_cartesian,
)
from biem_helmholtz_sphere_tpu.harmonics import (
    assume_n_end_from_num,
    basis,
    expand,
    harm_n_ndim,
    harm_n_ndim_le,
    harmonics,
    regular_singular_component,
    sphere_quadrature,
)
from biem_helmholtz_sphere_tpu.special import spherical_jh_all

BTYPES = ["a", "ba", "bpa", "bba", "bpbpa", "caa", "bcaa", "cbaba"]


def test_harm_counts():
    # classical dimensions: d=2 -> 2, d=3 -> 2n+1, d=4 -> (n+1)^2
    assert [harm_n_ndim(n, 2) for n in range(4)] == [1, 2, 2, 2]
    assert [harm_n_ndim(n, 3) for n in range(4)] == [1, 3, 5, 7]
    assert [harm_n_ndim(n, 4) for n in range(4)] == [1, 4, 9, 16]
    assert harm_n_ndim_le(6, 3) == 36
    assert assume_n_end_from_num(create_from_branching_types("ba"), 36) == 6


@pytest.mark.parametrize("btype", BTYPES)
def test_orthonormality(btype):
    c = create_from_branching_types(btype)
    n_end = 5
    b = basis(c, n_end)
    sph, w = sphere_quadrature(c, 2 * (n_end - 1))
    y = tonp(harmonics(c, {k: jnp.asarray(v) for k, v in sph.items()}, n_end))
    gram = (np.conj(y) * w[:, None]).T @ y
    np.testing.assert_allclose(gram, np.eye(b.num), atol=1e-12)
    # quadrature integrates the measure: total weight = |S^{d-1}|
    np.testing.assert_allclose(
        w.sum(), 2 * np.pi ** (c.c_ndim / 2) / gamma(c.c_ndim / 2), rtol=1e-13
    )


@pytest.mark.parametrize("btype", ["a", "ba", "caa", "bpbpa"])
def test_conjugation_and_parity(btype, rng):
    c = create_from_branching_types(btype)
    n_end = 6
    b = basis(c, n_end)
    x = rng.normal(size=(c.c_ndim, 7))
    x /= np.linalg.norm(x, axis=0)
    y = tonp(harmonics(c, from_cartesian(c, x), n_end))
    # conj(Y_h) = Y_{h*}
    np.testing.assert_allclose(np.conj(y), y[:, b.conj_index], atol=1e-13)
    # parity: Y_h(-x) = (-1)^n Y_h(x)
    ym = tonp(harmonics(c, from_cartesian(c, -x), n_end))
    np.testing.assert_allclose(ym, y * (-1.0) ** b.n_root, atol=1e-13)


@pytest.mark.parametrize("btype", ["a", "ba", "bba", "caa"])
def test_addition_theorem(btype, rng):
    # sum_p Y_{n,p}(x) conj(Y_{n,p}(y)) depends only on x.y (zonal kernel);
    # at x == y it equals N(d, n)/|S^{d-1}|.
    c = create_from_branching_types(btype)
    d = c.c_ndim
    n_end = 5
    b = basis(c, n_end)
    x = rng.normal(size=(d, 1))
    x /= np.linalg.norm(x)
    y = tonp(harmonics(c, from_cartesian(c, x), n_end))[0]
    area = 2 * np.pi ** (d / 2) / gamma(d / 2)
    for n in range(n_end):
        sel = b.n_root == n
        val = np.sum(y[sel] * np.conj(y[sel]))
        np.testing.assert_allclose(val, harm_n_ndim(n, d) / area, rtol=1e-12)


@pytest.mark.parametrize("btype", ["a", "ba", "caa", "bcaa"])
def test_plane_wave_identity(btype, rng):
    # e^{ik x.y^} = A_d sum_h i^n j_n(k|x|) Y_h(x^) conj(Y_h(y^)),
    # A_d = 2^{(d+1)/2} pi^{(d-1)/2} — couples harmonics, Bessel and the
    # degree indexing in one identity.
    c = create_from_branching_types(btype)
    d = c.c_ndim
    n_end = 34
    b = basis(c, n_end)
    xv = rng.normal(size=(d, 1))
    xv *= 1.5 / np.linalg.norm(xv)
    yv = rng.normal(size=(d, 1))
    yv /= np.linalg.norm(yv)
    k = 2.0
    yx = tonp(harmonics(c, from_cartesian(c, xv), n_end))[0]
    yy = tonp(harmonics(c, from_cartesian(c, yv), n_end))[0]
    j = tonp(spherical_jh_all(d, n_end, np.array(k * 1.5))[0])
    a_d = 2 ** ((d + 1) / 2) * np.pi ** ((d - 1) / 2)
    val = a_d * np.sum(1j**b.n_root * j[b.n_root] * yx * np.conj(yy))
    ref = np.exp(1j * k * float(xv.T @ yv))
    np.testing.assert_allclose(val, ref, atol=1e-12)


@pytest.mark.parametrize("btype", ["ba", "caa"])
def test_expand_round_trip(btype, rng):
    # expanding a band-limited function recovers its coefficients exactly
    c = create_from_branching_types(btype)
    n_end = 4
    b = basis(c, n_end)
    coef = rng.normal(size=b.num) + 1j * rng.normal(size=b.num)

    def f(sph):
        y = harmonics(c, {k: jnp.asarray(v) for k, v in sph.items()}, n_end)
        return y @ jnp.asarray(coef)

    got = tonp(expand(c, f, n_end))
    np.testing.assert_allclose(got, coef, atol=1e-12)


def test_expand_extra_axes():
    c = create_from_branching_types("ba")

    def f(sph):
        th = jnp.asarray(sph[c.root.nid])
        return jnp.stack([jnp.cos(th), jnp.sin(th) * 0 + 1.0], axis=-1)

    out = expand(c, f, 3)
    assert out.shape == (2, 9)


def test_regular_singular_component():
    c = create_from_branching_types("ba")
    n_end = 5
    b = basis(c, n_end)
    k, r = 1.3, 2.0
    reg = tonp(regular_singular_component(c, r, n_end, k))
    j = tonp(spherical_jh_all(3, n_end, np.array(k * r))[0])
    np.testing.assert_allclose(reg, j[b.n_root], rtol=1e-12)
    sing_d = tonp(
        regular_singular_component(c, r, n_end, k, type="singular", derivative=True)
    )
    hp = tonp(spherical_jh_all(3, n_end, np.array(k * r))[3])
    np.testing.assert_allclose(sing_d, hp[b.n_root], rtol=1e-12)

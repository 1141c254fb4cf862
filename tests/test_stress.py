"""Stress and physics tests at reference-sweep scales."""

import numpy as np
import pytest

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu import biem, plane_wave, point_source
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.ops.cplx import to_numpy as tonp


def _bc_residual(calc, centers, radii, npts=40, seed=0):
    d = centers.shape[1]
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(d, npts))
    y /= np.linalg.norm(y, axis=0)
    res = 0.0
    for b in range(len(centers)):
        xs = jnp.asarray(y * radii[b] + centers[b][:, None])  # exact surface: r == rho is not masked
        us = tonp(calc.uscat(xs))
        ui = tonp(calc.uin(xs))
        res = max(res, float(np.nanmax(np.abs(us + ui))))
    return res


def test_2d_high_k_regime():
    # the reference's accuracy_k_a sweep reaches k = 4096, n_end = 3444;
    # exercise the same scaling behavior at k = 64 with n_end comfortably
    # above the kR + margin rule.
    c = create_from_branching_types("a")
    k = np.asarray(64.0)
    centers = np.array([[0.0, 2.0], [0.0, -2.0]])
    uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0]))
    calc = biem(
        c, centers=jnp.asarray(centers), radii=jnp.ones(2), k=k, n_end=96, uin=uin
    )
    res = _bc_residual(calc, centers, np.ones(2), npts=60)
    assert res < 1e-4, res  # truncation-limited at n_end ~ kR + 32


def test_2d_very_large_n_end_runs():
    # basis construction + Graf translation at n_end = 512 (H = 1023)
    c = create_from_branching_types("a")
    k = np.asarray(256.0)
    centers = np.array([[0.0, 2.0], [0.0, -2.0]])
    uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0]))
    calc = biem(
        c,
        centers=jnp.asarray(centers),
        radii=jnp.ones(2),
        k=k,
        n_end=400,
        uin=uin,
    )
    u0 = complex(tonp(calc.uscat(jnp.asarray([[0.0], [0.0]]))).reshape(-1)[0])
    assert np.isfinite(u0.real) and np.isfinite(u0.imag)
    res = _bc_residual(calc, centers, np.ones(2), npts=30)
    assert res < 1e-4, res


def test_point_source_bc_residual():
    c = create_from_branching_types("ba")
    k = np.asarray(1.5)
    centers = np.array([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]])
    uin, uin_grad = point_source(
        k=k, source=jnp.asarray(np.array([4.0, 1.0, 0.5])), n=0
    )
    calc = biem(
        c,
        centers=jnp.asarray(centers),
        radii=jnp.ones(2),
        k=k,
        n_end=14,
        uin=uin,
    )
    res = _bc_residual(calc, centers, np.ones(2))
    assert res < 1e-6, res


def test_inner_problem_masking_and_solve():
    # interior scattering: solve with kind="inner" — assembly identical
    # (reference semantics: kind only controls evaluation masking,
    # _biem.py:971-976)
    c = create_from_branching_types("ba")
    k = np.asarray(1.0)
    uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0, 0.0]))
    calc = biem(
        c,
        centers=jnp.zeros((1, 3)),
        radii=jnp.ones(1) * 2.0,
        k=k,
        n_end=6,
        uin=uin,
        kind="inner",
    )
    u = tonp(calc.uscat(jnp.asarray([[0.5, 3.0], [0.0, 0.0], [0.0, 0.0]])))
    assert np.isfinite(u[0]) and np.isnan(u[1].real)


def test_eta_variations():
    # eta enters the combined field; different eta must give the same
    # physical field (basis-independent solution)
    c = create_from_branching_types("ba")
    k = np.asarray(1.0)
    centers = np.array([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]])
    vals = []
    for eta in (0.5, 1.0, 2.0):
        uin, _ = plane_wave(k=k, direction=jnp.asarray([1.0, 0.0, 0.0]))
        calc = biem(
            c,
            centers=jnp.asarray(centers),
            radii=jnp.ones(2),
            k=k,
            n_end=10,
            uin=uin,
            eta=np.asarray(eta),
        )
        vals.append(complex(tonp(calc.uscat(jnp.zeros((3, 1)))).reshape(-1)[0]))
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-7)
    np.testing.assert_allclose(vals[2], vals[1], rtol=1e-7)


def test_complex_k_runs():
    # absorbing medium: Im k > 0 (reference supports complex k)
    from biem_helmholtz_sphere_tpu.ops.cplx import C

    c = create_from_branching_types("ba")
    k = C.of(1.0 + 0.1j)
    centers = np.array([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]])
    uin, _ = plane_wave(k=k, direction=jnp.asarray(np.array([1.0, 0.0, 0.0])))
    calc = biem(
        c, centers=jnp.asarray(centers), radii=jnp.ones(2), k=k, n_end=8, uin=uin
    )
    res = _bc_residual(calc, centers, np.ones(2), npts=20)
    assert res < 1e-5, res

"""Coordinate-tree tests: grammar, dimensions, round-trips."""

import numpy as np
import pytest

from biem_helmholtz_sphere_tpu.coords import (
    create_from_branching_types,
    create_hopf,
    create_random,
    create_standard,
    create_standard_prime,
    from_cartesian,
    to_cartesian,
)

BTYPES = {
    "a": 2,
    "ba": 3,
    "bpa": 3,
    "bba": 4,
    "bpbpa": 4,
    "caa": 4,
    "bcaa": 5,
    "ccaaa": 6,
    "cbaba": 6,
}


@pytest.mark.parametrize("btype,d", BTYPES.items())
def test_dimensions(btype, d):
    c = create_from_branching_types(btype)
    assert c.c_ndim == d
    assert c.s_ndim == d - 1
    # every cartesian axis covered exactly once
    assert sorted(c.root.axes) == list(range(d))


def test_constructors():
    assert create_standard(5).branching_types_expression_str == "bbba"
    assert create_standard_prime(4).branching_types_expression_str == "bpbpa"
    assert create_hopf(8).branching_types_expression_str == "ccaacaa"
    with pytest.raises(ValueError):
        create_hopf(6)
    with pytest.raises(ValueError):
        create_from_branching_types("x")
    with pytest.raises(ValueError):
        create_from_branching_types("baa")  # trailing characters
    for seed in range(5):
        c = create_random(7, seed)
        assert c.c_ndim == 7


@pytest.mark.parametrize("btype", list(BTYPES))
def test_round_trip(btype, rng):
    c = create_from_branching_types(btype)
    x = rng.normal(size=(c.c_ndim, 40))
    sph = from_cartesian(c, x)
    assert set(sph.keys()) == {n.nid for n in c.nodes} | {"r"}
    x2 = np.asarray(to_cartesian(c, sph, as_array=True))
    np.testing.assert_allclose(x2, x, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sph["r"]), np.linalg.norm(x, axis=0), atol=1e-12
    )


@pytest.mark.parametrize("btype", ["ba", "caa"])
def test_angle_ranges(btype, rng):
    c = create_from_branching_types(btype)
    x = rng.normal(size=(c.c_ndim, 200))
    sph = from_cartesian(c, x)
    for node in c.nodes:
        a = np.asarray(sph[node.nid])
        if node.kind == "a":
            assert (a >= -np.pi - 1e-12).all() and (a <= np.pi + 1e-12).all()
        elif node.kind in ("b", "bp"):
            assert (a >= 0).all() and (a <= np.pi).all()
        else:
            assert (a >= 0).all() and (a <= np.pi / 2 + 1e-12).all()


def test_unit_sphere_when_no_radius():
    c = create_standard(4)
    sph = {n.nid: np.array(0.3) for n in c.nodes}
    x = np.asarray(to_cartesian(c, sph))
    np.testing.assert_allclose(np.linalg.norm(x, axis=0), 1.0, atol=1e-12)


def test_jit_static_tree():
    import jax

    c = create_standard(3)

    @jax.jit
    def f(x):
        sph = from_cartesian(c, x)
        return to_cartesian(c, sph)

    x = np.array([[1.0], [2.0], [2.0]])
    np.testing.assert_allclose(np.asarray(f(x)), x, atol=1e-12)

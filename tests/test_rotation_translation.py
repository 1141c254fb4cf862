"""Rotation + coaxial translation path vs the band scan oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import (
    create_from_branching_types,
    from_cartesian,
)
from biem_helmholtz_sphere_tpu.harmonics import basis
from biem_helmholtz_sphere_tpu.translation import translation_matrix
from biem_helmholtz_sphere_tpu.translation._rotation import (
    coaxial_sr,
    rotation_matrix,
)


@pytest.mark.parametrize("btype,n_end", [("ba", 10), ("bba", 6), ("bcaa", 4)])
def test_rotation_matches_band_scan(btype, n_end, rng):
    c = create_from_branching_types(btype)
    d = c.c_ndim
    t = rng.normal(size=(d, 3))
    t = t / np.linalg.norm(t, axis=0) * 4.0
    k = np.full(3, 1.3)
    rot = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", method="rotation"
    ).to_numpy()
    ref = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", method="triplet"
    ).to_numpy()
    den = np.abs(ref).max(axis=-1, keepdims=True) + 1e-30
    assert np.max(np.abs(rot - ref) / den) < 1e-9


def test_rotation_float32_scale_discipline(rng):
    # Regression: D's off-degree-block quadrature residue (~eps) used to
    # couple huge coax blocks |h_{n+n'}(kr)| into low-degree entries,
    # giving 0.23 rel error in float32.  The static degree-block mask in
    # rotation_matrix must keep f32 at band-scan accuracy.
    c = create_from_branching_types("ba")
    n_end = 12
    t = rng.normal(size=(3, 4)).astype(np.float32)
    t = t / np.linalg.norm(t, axis=0) * 4.0
    k = np.full(4, 1.3, np.float32)
    ref64 = translation_matrix(
        c,
        jnp.asarray(t.astype(np.float64)),
        n_end,
        jnp.asarray(k.astype(np.float64)),
        kind="SR",
        method="triplet",
    ).to_numpy()
    rot32 = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", method="rotation"
    ).to_numpy()
    den = np.abs(ref64).max(axis=-1, keepdims=True) + 1e-30
    assert np.max(np.abs(rot32 - ref64) / den) < 1e-4


def test_rotation_axis_edge_cases(rng):
    # t exactly along +axis and -axis (degenerate Rodrigues)
    c = create_from_branching_types("ba")
    n_end = 6
    for sign in (+1.0, -1.0):
        t = np.zeros((3, 1))
        t[2, 0] = sign * 3.0  # root axis of "ba" is cartesian axis 2
        k = np.array([1.1])
        rot = translation_matrix(
            c, jnp.asarray(t), n_end, jnp.asarray(k), method="rotation"
        ).to_numpy()
        ref = translation_matrix(
            c, jnp.asarray(t), n_end, jnp.asarray(k), method="triplet"
        ).to_numpy()
        den = np.abs(ref).max() + 1e-30
        assert np.max(np.abs(rot - ref)) / den < 1e-10


def test_rotation_unitary_blockdiag(rng):
    c = create_from_branching_types("ba")
    n_end = 8
    b = basis(c, n_end)
    th = rng.normal(size=(1, 3))
    th /= np.linalg.norm(th)
    d_mat = rotation_matrix(c, jnp.asarray(th), n_end).to_numpy()[0]
    np.testing.assert_allclose(
        d_mat @ d_mat.conj().T, np.eye(b.num), atol=1e-12
    )
    off = np.abs(d_mat)[b.n_root[:, None] != b.n_root[None, :]].max()
    assert off < 1e-12


def test_coaxial_block_structure():
    c = create_from_branching_types("ba")
    n_end = 7
    cx = coaxial_sr(c, jnp.asarray([3.0]), n_end, jnp.asarray([1.0])).to_numpy()[0]
    b = basis(c, n_end)
    # m-diagonality for "ba": azimuthal order preserved
    root_jobs = b.node_jobs[c.root.nid]
    # child state = the a-node m; entries with different m must vanish
    a_nid = c.root.children[0].nid
    m_of = np.array(
        [b.node_jobs[a_nid][j][0] for j in b.node_job_index[a_nid]]
    )
    cross = np.abs(cx)[m_of[:, None] != m_of[None, :]]
    assert cross.max() < 1e-20 * np.abs(cx).max() + 1e-25


def test_c_rooted_tree_falls_back():
    # 'c'-rooted trees have no distinguished axis; method="rotation" must
    # raise, and auto must silently use the band scan.
    c = create_from_branching_types("caa")
    t = jnp.asarray(np.array([[0.0], [3.0], [0.0], [0.0]]))
    with pytest.raises(ValueError, match="rooted"):
        translation_matrix(c, t, 4, np.array([1.0]), method="rotation")
    out = translation_matrix(c, t, 4, np.array([1.0]))  # auto -> band scan
    assert out.shape[-1] == out.shape[-2]

"""Independent cross-solver validation: BIEM vs the MFS oracle.

The reference closed this loop with bempp-cl (bempp_cl_sphere.py:15-98
there); here the oracle is the Method of Fundamental Solutions
(biem_helmholtz_sphere_tpu/validation) — a *different numerical method*
sharing no code with the BIEM pipeline (numpy + scipy.special only).
Every configuration below is NOVEL: random-ish centers/radii/direction
that no stored golden covers, so agreement is genuine two-method
evidence, not regression against a previously pinned value.

Each test also asserts the oracle's own boundary-condition residual
(its accuracy certificate) before using it as truth.
"""

import numpy as np
import pytest

from biem_helmholtz_sphere_tpu import biem, plane_wave
from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.validation import mfs_uscat


def _biem_uscat(tree, centers, radii, k, direction, pts, n_end, beta=0.0):
    c = create_from_branching_types(tree)
    uin, uin_grad = plane_wave(
        k=np.asarray(float(k)), direction=np.asarray(direction, dtype=np.float64)
    )
    calc = biem(
        c,
        centers=np.asarray(centers, dtype=np.float64),
        radii=np.asarray(radii, dtype=np.float64),
        k=np.asarray(float(k)),
        n_end=n_end,
        alpha=1.0,
        beta=beta,
        uin=uin,
        uin_grad=uin_grad if beta else None,
    )
    return calc.uscat(np.asarray(pts, dtype=np.float64).T).to_numpy()


def _exterior_points(centers, radii, n, seed):
    """n points outside every ball, at moderate distance (near field)."""
    rng = np.random.default_rng(seed)
    d = centers.shape[1]
    out = []
    lim = np.max(np.abs(centers)) + np.max(radii)
    while len(out) < n:
        p = rng.uniform(-lim - 1.5, lim + 1.5, size=d)
        if np.all(np.linalg.norm(p - centers, axis=1) > radii + 0.35):
            out.append(p)
    return np.stack(out)


def _compare(tree, centers, radii, k, direction, n_end, mfs_kw, tol, beta=0.0):
    centers = np.asarray(centers, dtype=np.float64)
    radii = np.asarray(radii, dtype=np.float64)
    pts = _exterior_points(centers, radii, 12, seed=5)
    oracle = mfs_uscat(
        centers=centers, radii=radii, k=k, direction=direction, beta=beta, **mfs_kw
    )
    assert oracle.bc_residual < tol / 3, "oracle itself did not converge"
    u_mfs = oracle.uscat(pts)
    u_b = _biem_uscat(tree, centers, radii, k, direction, pts, n_end, beta=beta)
    scale = np.max(np.abs(u_mfs))
    err = np.max(np.abs(u_b.ravel() - u_mfs)) / scale
    assert err < tol, f"BIEM vs MFS mismatch: rel {err:.2e} (tol {tol:.0e})"


def test_mfs_vs_biem_3d_soft():
    """Novel asymmetric two-ball 3D sound-soft configuration."""
    _compare(
        "ba",
        centers=[[0.3, 1.8, -0.2], [-0.4, -1.7, 0.5]],
        radii=[1.0, 0.75],
        k=1.3,
        direction=[0.2, 0.9, -0.1],
        n_end=14,
        mfs_kw=dict(n_src=200, src_depth=0.45),
        tol=3e-5,
    )


@pytest.mark.slow
def test_mfs_vs_biem_3d_robin_three_balls():
    """3D Robin (impedance) BC, three unequal balls, deep oracle."""
    _compare(
        "ba",
        centers=[[0.0, 2.1, 0.0], [0.2, -1.9, 0.4], [2.3, 0.1, -1.2]],
        radii=[1.0, 0.8, 0.6],
        k=1.6,
        direction=[0.5, 0.6, -0.4],
        n_end=16,
        mfs_kw=dict(n_src=400, src_depth=0.35),
        tol=1e-6,
        beta=0.4,
    )


@pytest.mark.slow
def test_mfs_vs_biem_2d():
    """2D three-disk configuration; the 2D oracle is machine precision."""
    _compare(
        "a",
        centers=[[0.1, 2.2], [-0.3, -1.8], [2.6, 0.3]],
        radii=[1.0, 0.7, 0.9],
        k=1.9,
        direction=[0.8, 0.4],
        n_end=18,
        mfs_kw=dict(n_src=160, src_depth=0.4),
        tol=1e-8,
    )


@pytest.mark.slow
def test_mfs_vs_biem_4d():
    """4D pair; random S^3 point sets converge slowly, coarse tolerance
    still catches any convention/normalization error (O(1) effect)."""
    _compare(
        "bba",
        centers=[[0.0, 0.1, -0.2, 2.0], [0.2, -0.1, 0.0, -2.1]],
        radii=[1.0, 0.85],
        k=1.2,
        direction=[0.3, 0.1, 0.2, 0.9],
        n_end=10,
        mfs_kw=dict(n_src=400, src_depth=0.35),
        tol=5e-3,
    )

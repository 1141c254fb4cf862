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
def test_mfs_vs_biem_randomized_sweep():
    """Randomized-geometry oracle sweep (the reference's test_match
    spirit, tests/test_main.py:64-132 there: rejection-sampled 1-or-3
    spheres, random k, random BC from {(1,0),(0,1),(1,1)}, 100 random
    exterior points) — at spectral accuracy instead of the mesh
    oracle's 2e-1 rtol."""
    from biem_helmholtz_sphere_tpu import biem, plane_wave

    c = create_from_branching_types("ba")
    for draw in range(4):
        rng = np.random.default_rng(987 + draw)
        B = 1 if draw % 2 == 0 else 3
        radii = rng.uniform(0.6, 1.1, size=B)
        centers = np.zeros((B, 3))
        placed = 1
        while placed < B:  # rejection-sample non-overlapping centers
            p = rng.uniform(-3.0, 3.0, size=3)
            if np.all(
                np.linalg.norm(p - centers[:placed], axis=1)
                > radii[:placed] + radii[placed] + 0.3
            ):
                centers[placed] = p
                placed += 1
        k = rng.uniform(0.5, 2.0)
        alpha, beta = [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0)][draw % 3]
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        pts = _exterior_points(centers, radii, 100, seed=draw)

        oracle = mfs_uscat(
            centers=centers, radii=radii, k=k, direction=direction,
            alpha=alpha, beta=beta, n_src=260, src_depth=0.4,
        )
        assert oracle.bc_residual < 3e-5, (draw, oracle.bc_residual)
        u_mfs = oracle.uscat(pts)

        uin, uin_grad = plane_wave(k=np.asarray(k), direction=direction)
        calc = biem(
            c, centers=centers, radii=radii, k=np.asarray(k), n_end=14,
            alpha=alpha, beta=beta, uin=uin,
            uin_grad=uin_grad if beta else None,
        )
        u_b = calc.uscat(pts.T).to_numpy().ravel()
        err = np.max(np.abs(u_b - u_mfs)) / np.max(np.abs(u_mfs))
        assert err < 2e-4, f"draw {draw} (B={B}, k={k:.3f}, BC=({alpha},{beta})): rel {err:.2e}"


@pytest.mark.slow
def test_mfs_vs_biem_point_source():
    """Point-source incidence cross-validated against the oracle — the
    reference's bempp oracle only ever saw plane waves
    (bempp_cl_sphere.py:74-78 there)."""
    from biem_helmholtz_sphere_tpu import biem, point_source

    c = create_from_branching_types("ba")
    centers = np.array([[0.2, 1.9, -0.1], [-0.3, -1.8, 0.4]])
    radii = np.array([1.0, 0.8])
    k, src = 1.4, np.array([3.5, 0.5, 1.0])
    pts = _exterior_points(centers, radii, 12, seed=11)
    pts = pts[np.linalg.norm(pts - src, axis=1) > 0.5]

    oracle = mfs_uscat(
        centers=centers, radii=radii, k=k, source=src, n_src=260, src_depth=0.4
    )
    assert oracle.bc_residual < 1e-5
    u_mfs = oracle.uscat(pts)

    uin, _ = point_source(k=np.asarray(k), source=src)
    calc = biem(
        c, centers=centers, radii=radii, k=np.asarray(k), n_end=16,
        alpha=1.0, beta=0.0, uin=uin,
    )
    u_b = calc.uscat(pts.T).to_numpy().ravel()
    err = np.max(np.abs(u_b - u_mfs)) / np.max(np.abs(u_mfs))
    assert err < 1e-4, f"BIEM vs MFS (point source): rel {err:.2e}"


@pytest.mark.slow
def test_mfs_vs_biem_inner():
    """Interior-evaluation (kind='inner') cross-validation, single ball.

    The reference's kind='inner' is NOT the classical regular interior
    problem: assembly is identical to the exterior one and evaluation
    keeps the singular h_n(kr) radial factors — `kind` only flips the
    NaN mask (reference _biem.py:971-976).  The matching oracle is
    therefore the standard sources-INSIDE MFS ansatz evaluated in the
    annulus between the fictitious sources and the surface, where (by
    the addition theorem for |x| > |s|) it spans exactly the h_n(kr) Y
    space the BIEM inner ansatz uses.  The regular-interior oracle
    (mfs kind='inner', sources outside) solves a DIFFERENT BVP and must
    disagree — asserted below to pin the convention."""
    from biem_helmholtz_sphere_tpu import biem, plane_wave

    c = create_from_branching_types("ba")
    centers, radii = np.array([[0.3, -0.2, 0.1]]), np.array([1.2])
    k, direction = 1.7, np.array([0.6, -0.3, 0.74])
    rng = np.random.default_rng(3)
    v = rng.normal(size=(40, 3))
    v /= np.linalg.norm(v, axis=1)[:, None]
    # annulus points: outside the src_depth=0.4 source sphere, inside
    # the surface
    pts = centers[0] + v * (radii[0] * rng.uniform(0.62, 0.92, size=(40, 1)))

    oracle = mfs_uscat(
        centers=centers, radii=radii, k=k, direction=direction,
        n_src=400, src_depth=0.3,
    )
    assert oracle.bc_residual < 1e-10
    u_mfs = oracle.uscat(pts)

    uin, _ = plane_wave(k=np.asarray(k), direction=direction)
    calc = biem(
        c, centers=centers, radii=radii, k=np.asarray(k), n_end=16,
        alpha=1.0, beta=0.0, uin=uin, kind="inner",
    )
    u_b = calc.uscat(pts.T).to_numpy().ravel()
    err = np.max(np.abs(u_b - u_mfs)) / np.max(np.abs(u_mfs))
    assert err < 1e-7, f"BIEM-inner vs annulus MFS: rel {err:.2e}"

    # the REGULAR interior solution (sources outside) is a different
    # field: same BC, no singular component at the center
    reg = mfs_uscat(
        centers=centers, radii=radii, k=k, direction=direction,
        kind="inner", n_src=400, src_depth=0.3,
    )
    assert reg.bc_residual < 1e-10
    u_reg = reg.uscat(pts)
    diff = np.max(np.abs(u_reg - u_mfs)) / np.max(np.abs(u_mfs))
    assert diff > 1e-2, "regular-interior and singular ansatz coincide?!"


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

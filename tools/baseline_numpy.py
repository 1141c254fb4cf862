"""NumPy/SciPy baseline solver for benchmarking (BASELINE.md north star).

The reference itself cannot run in this image (its ultrasphere/numba
dependency stack is not installed), so the baseline is the same
algorithm — banded stable (S|R) translation + dense LU — implemented in
plain vectorized NumPy with SciPy linear algebra, which is what the
reference's array-API NumPy backend would execute modulo its numba
recurrence kernels.  Used by bench.py to report vs_baseline.

Run directly to measure:  python tools/baseline_numpy.py [n_end] [B]
"""

import time

import numpy as np
import scipy.linalg
import scipy.special as sp


def sph_jh(n_end, z):
    n = np.arange(n_end)
    zc = np.asarray(z)[..., None]
    j = sp.spherical_jn(n, zc.real)
    y = sp.spherical_yn(n, zc.real)
    jp = sp.spherical_jn(n, zc.real, derivative=True)
    yp = sp.spherical_yn(n, zc.real, derivative=True)
    return j, jp, j + 1j * y, jp + 1j * yp


def real_sph_harm_table(n_end, theta, phi):
    """Y[(n,m)] orthonormal complex spherical harmonics at (theta, phi).

    Same basis as the JAX implementation: e^{im phi}/sqrt(2pi) times
    orthonormal associated-Legendre part.
    """
    from scipy.special import sph_harm_y

    out = []
    for n in range(n_end):
        for m in range(-n, n + 1):
            out.append(sph_harm_y(n, abs(m), theta, phi) * (1 if m >= 0 else (-1.0) ** m) * np.exp(1j * (m - abs(m)) * phi))
    return np.stack(out, axis=-1)


def gauss_sphere(nth, nph):
    t, wt = np.polynomial.legendre.leggauss(nth)
    theta = np.arccos(t)
    phi = 2 * np.pi * np.arange(nph) / nph
    wph = 2 * np.pi / nph
    th, ph = np.meshgrid(theta, phi, indexing="ij")
    w = np.repeat(wt * wph, nph)
    return th.ravel(), ph.ravel(), w


def translation_sr_banded(n_end, k, t_vecs):
    """(S|R) for 3D via the banded-stable quadrature (NumPy port of
    translation/_ops.py::_sr_banded)."""
    nq_t = 2 * n_end
    nq_p = 4 * n_end
    th, ph, w = gauss_sphere(nq_t, nq_p)
    y = real_sph_harm_table(n_end, th, ph)  # [Q, H]
    s_hat = np.stack(
        [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)]
    )  # [3, Q]
    degrees = np.concatenate([[n] * (2 * n + 1) for n in range(n_end)])
    nsum = degrees[:, None] + degrees[None, :]
    n_bands = 2 * n_end - 1
    a_d = 4 * np.pi
    out = np.zeros((t_vecs.shape[0], y.shape[1], y.shape[1]), dtype=complex)
    for p, t in enumerate(t_vecs):
        rt = np.linalg.norm(t)
        that = t / rt
        x = that @ s_hat  # [Q]
        _, _, h, _ = sph_jh(n_bands, np.array(k * rt))  # [n_bands]
        c_prev = np.zeros_like(x)
        c_cur = np.ones_like(x)
        m = np.zeros((y.shape[1], y.shape[1]), dtype=complex)
        for n2 in range(n_bands):
            zonal = (2 * n2 + 1) / (4 * np.pi) * c_cur
            band = a_d * (1j**n2) * h[n2] * zonal * w
            t_mat = (np.conj(y) * band[:, None]).T @ y
            m += np.where(nsum >= n2, t_mat, 0.0)
            c_next = ((2 * n2 + 1) * x * c_cur - n2 * c_prev) / (n2 + 1)
            c_prev, c_cur = c_cur, c_next
        phase = 1j ** (degrees[:, None].astype(np.int64) - degrees[None, :])
        out[p] = m * phase
    return out


def assemble_and_solve(n_end, k, centers, radii, timers):
    b = centers.shape[0]
    h_num = n_end * n_end
    degrees = np.concatenate([[n] * (2 * n + 1) for n in range(n_end)])

    t0 = time.perf_counter()
    bu, bv = np.triu_indices(b, k=1)
    t_vecs = centers[bu] - centers[bv]
    sr_up = translation_sr_banded(n_end, k, t_vecs)
    timers["translation"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    j, jp, h, hp = sph_jh(n_end, k * radii)
    jH = j[:, degrees]
    hH = h[:, degrees]
    jpH = jp[:, degrees]
    slc = 1j * k ** (3 - 2) * radii[:, None] ** 2 * jH
    dlc = 1j * k ** (3 - 1) * radii[:, None] ** 2 * jpH
    blc = dlc - 1j * slc
    a = np.zeros((b, h_num, b, h_num), dtype=complex)
    par = (-1.0) ** (degrees[:, None] + degrees[None, :])
    for i in range(b):
        a[i, :, i, :] = np.diag(hH[i] * blc[i])
    for p in range(len(bu)):
        i, jdx = bu[p], bv[p]
        a[i, :, jdx, :] = jH[i][:, None] * sr_up[p] * blc[jdx][None, :]
        a[jdx, :, i, :] = jH[jdx][:, None] * (par * sr_up[p]) * blc[i][None, :]
    timers["assembly"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    rhs = np.random.default_rng(0).normal(size=(b * h_num,)) + 0j
    lu, piv = scipy.linalg.lu_factor(a.reshape(b * h_num, b * h_num))
    x = scipy.linalg.lu_solve((lu, piv), rhs)
    timers["solve"] = time.perf_counter() - t0
    return x


def lattice_centers(n_side, spacing=4.0):
    g = (np.arange(n_side) - (n_side - 1) / 2) * spacing
    xx, yy = np.meshgrid(g, g)
    centers = np.zeros((n_side * n_side, 3))
    centers[:, 0] = xx.ravel()
    centers[:, 1] = yy.ravel()
    return centers


def main():
    import sys

    n_end = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_side = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    centers = lattice_centers(n_side)
    radii = np.ones(len(centers))
    timers = {}
    t0 = time.perf_counter()
    assemble_and_solve(n_end, 8.0, centers, radii, timers)
    total = time.perf_counter() - t0
    print(
        f"n_end={n_end} B={len(centers)}: total {total:.2f}s "
        f"(translation {timers['translation']:.2f}s, assembly "
        f"{timers['assembly']:.2f}s, solve {timers['solve']:.2f}s)"
    )


if __name__ == "__main__":
    main()

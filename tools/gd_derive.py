"""Pin the Gumerov-Duraiswami coaxial-recurrence conventions numerically.

Ground truth: coaxial_sr (quadrature + band masking, validated to 1e-12
against the band scan).  We derive the (S|R) coaxial coefficients
E^m_{n',n}(kt) in OUR orthonormal basis via:

  init      E^0_{n',0} = (-1)^{n'} sqrt(2n'+1) h_{n'}(kt)
  n-advance a^m_n E^m_{n',n+1} = a^m_{n-1} E^m_{n',n-1}
                                 - a^m_{n'} E^m_{n'+1,n} + a^m_{n'-1} E^m_{n'-1,n}
  sectorial b1(m,m) E^{m+1}_{n',m+1} = b1(n'-1,m) E^m_{n'-1,m}
                                       + b2(n'+1,m) E^m_{n'+1,m}

with a^m_n = sqrt(((n+1+m)(n+1-m))/((2n+1)(2n+3))) (0 for n<m) and
candidate b1/b2 sign conventions to be fitted here.
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.harmonics._index import basis
from biem_helmholtz_sphere_tpu.translation._rotation import coaxial_sr
from scipy.special import spherical_jn, spherical_yn

N_END = 8
KT = 3.7


def h1(n, z):
    return spherical_jn(n, z) + 1j * spherical_yn(n, z)


def a_coef(m, n):
    n = np.asarray(n, dtype=float)
    out = np.sqrt((n + 1 + m) * (n + 1 - m) / ((2 * n + 1) * (2 * n + 3)))
    return np.where(n >= m, out, 0.0)


def truth_blocks():
    """E^m[l', l] from coaxial_sr, per |m|."""
    c = create_from_branching_types("ba")
    b = basis(c, N_END)
    coax = coaxial_sr(c, jnp.asarray(KT), N_END, jnp.asarray(1.0), kind="SR")
    m = np.asarray(coax.re) + 1j * np.asarray(coax.im)
    # our flat index: node jobs at root are (nc=|m|, l); child m signed
    root_jobs = b.node_jobs[c.root.nid]
    ji = b.node_job_index[c.root.nid]
    ell = np.array([root_jobs[j][1] for j in ji])
    # signed m from the 'a' child
    anid = c.root.children[0].nid
    a_jobs = b.node_jobs[anid]
    mm = np.array([a_jobs[j][0] for j in b.node_job_index[anid]])
    blocks = {}
    for mv in range(N_END):
        sel = np.nonzero(mm == mv)[0]
        order = sel[np.argsort(ell[sel])]
        blocks[mv] = (m[np.ix_(order, order)], ell[order])
    return blocks


def gd_all(sgn_a=+1, b1sgn=+1, b2sgn=-1):
    """Compute E^m_{n',n} for n',n < N_END, m = 0..N_END-1."""
    NP = 2 * N_END + N_END  # generous n' head-room
    ns = np.arange(NP + 2)
    E0 = (-1.0) ** ns * np.sqrt(2 * ns + 1) * h1(ns, KT)  # E^0_{n',0}

    def b1(n, m):  # multiplies F_{n+1}^{m+1}: b^{-m-1}_{n+1}
        n = float(n)
        v = np.sqrt((n + m + 1) * (n + m + 2) / ((2 * n + 1) * (2 * n + 3)))
        return b1sgn * v

    def b2(n, m):  # multiplies F_{n-1}^{m+1}
        n = float(n)
        if n - m - 1 < 0:
            return 0.0
        v = np.sqrt((n - m - 1) * (n - m) / ((2 * n - 1) * (2 * n + 1)))
        return b2sgn * v

    # sectorial slices sect[m][n'] = E^m_{n',m}
    sect = {0: E0}
    for m in range(N_END - 1):
        prev = sect[m]
        nxt = np.zeros_like(prev)
        for npp in range(m + 1, NP):
            nxt[npp] = (
                b1(npp - 1, m) * prev[npp - 1] + b2(npp + 1, m) * prev[npp + 1]
            ) / b1(m, m)
        sect[m + 1] = nxt

    # n-advance per m
    out = {}
    for m in range(N_END):
        E = np.zeros((NP, N_END), complex)
        E[:, m] = sect[m][:NP]
        if m > 0:
            # degrees below m are zero columns; start propagation at n=m
            pass
        for n in range(m, N_END - 1):
            an = a_coef(m, n)
            for npp in range(m, NP - 1):
                prev = E[npp, n - 1] if n - 1 >= m else 0.0
                E[npp, n + 1] = (
                    a_coef(m, n - 1) * prev
                    + sgn_a * (-a_coef(m, npp) * E[npp + 1, n]
                               + a_coef(m, npp - 1) * (E[npp - 1, n] if npp - 1 >= m else 0.0))
                ) / an
        out[m] = E[:N_END, :]
    return out


def main():
    blocks = truth_blocks()
    for sgn_a in (+1, -1):
        for b1sgn in (+1, -1):
            for b2sgn in (+1, -1):
                E = gd_all(sgn_a, b1sgn, b2sgn)
                errs = []
                for mv in range(N_END):
                    tr, ells = blocks[mv]
                    sub = E[mv][np.ix_(ells, ells)]
                    den = np.abs(tr).max()
                    errs.append(np.abs(sub - tr).max() / den)
                print(
                    f"sgn_a={sgn_a:+d} b1={b1sgn:+d} b2={b2sgn:+d}: "
                    + " ".join(f"{e:.1e}" for e in errs)
                )


if __name__ == "__main__":
    main()

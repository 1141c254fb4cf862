r"""Addition-theorem translation operators (S|R) and (R|R).

Rebuild of `ultrasphere_harmonics.harmonics_translation_coef` (reference:
_biem.py:697-706; methods documented at _biem.py:569-574) and of the
`gumerov-expansion-coefficients` numba kernels (SURVEY.md section 2.3).

Math.  With R_h(x) = j_{n_h}(k|x|) Y_h(x^) and S_h(x) = h^{(1)}_{n_h}(k|x|)
Y_h(x^), the operators are defined by

    R_h(y + t) = sum_{h'} (R|R)[h', h](t) R_{h'}(y)          (all y)
    S_h(y + t) = sum_{h'} (S|R)[h', h](t) R_{h'}(y)          (|y| < |t|)

From the d-dimensional plane-wave expansion
e^{i k x.s^} = A_d sum_h i^{n_h} j_{n_h}(k|x|) Y_h(x^) conj(Y_h(s^)),
A_d = 2^{(d+1)/2} pi^{(d-1)/2}:

    (R|R)[h',h](t) = i^{n'-n} sum_q w_q e^{i k t.s_q} conj(Y_{h'}(s_q)) Y_h(s_q)

which is exact (the integrand is a product of harmonics of total degree
<= n + n' + deg(e^{ikt.s} truncation); with the plane wave the kernel is
bounded, |F| = 1, so the sum is also numerically benign).  The singular
analogue replaces the plane wave with the band sum

    F_t(s) = sum_{n''} A_d i^{n''} h^{(1)}_{n''}(k|t|) Z_{n''}(t^.s)

(Z_n the zonal kernel of degree n).  Crucially the bands must NOT be
summed before quadrature: |h_{n''}(kt)| grows super-exponentially in n'',
and the entry (h', h) only has Gaunt support for n'' <= n + n', so low
modes would be destroyed by roundoff ~ eps * |h_{n+n'<max}| (and the
kernel overflows float32 outright).  Stable evaluation used here:

  *  d = 2: Graf's addition theorem in closed form,
         (S|R)[m',m](t) = H^{(1)}_{m-m'}(k|t|) e^{i(m-m') theta_t}
     (exact, O(H^2), no quadrature at all).
  *  d >= 3: masked band accumulation — scan over n'', each step one
     batched [H,Q]x[Q,H] contraction with the single-band kernel
     A_d i^{n''} h_{n''}(kt) Z_{n''}(t^.s) (zonal values by a Gegenbauer
     three-term recurrence carried through the scan), accumulated only
     into entries with n + n' >= n''.  Each entry then only ever meets
     bands at or below its own magnitude scale: relative error ~ eps.

Method names keep API parity with the reference: "triplet", "gumerov",
"plane_wave", None (reference constraint preserved: "plane_wave" only
for same-type (R|R)).  All methods here produce exact coefficients;
they differ only in algorithm.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..coords import from_cartesian, to_cartesian
from ..harmonics._eval import harmonics
from ..harmonics._index import basis
from ..harmonics._quad import sphere_quadrature
from ..special._family import spherical_jh_all


def _a_const(d):
    return 2.0 ** ((d + 1) / 2.0) * np.pi ** ((d - 1) / 2.0)


def _surface_area(d):
    from scipy.special import gamma

    return float(2.0 * np.pi ** (d / 2.0) / gamma(d / 2.0))


def _quad_tables(c, n_out, n_in):
    """Static quadrature tables (dtype follows the active x64 mode)."""
    import jax

    return _quad_tables_impl(c, n_out, n_in, jax.config.jax_enable_x64)


@lru_cache(maxsize=32)
def _quad_tables_impl(c, n_out, n_in, _x64):
    """Static quadrature tables for the (n_out, n_in) operator.

    Returns (w [Q], Yo_conj [Q, Ho], Yi [Q, Hi], s_cart [d, Q],
    phase [Ho, Hi], n_o [Ho], n_i [Hi]).
    """
    import jax

    deg = 2 * ((n_out - 1) + (n_in - 1))
    with jax.ensure_compile_time_eval():
        sph, w = sphere_quadrature(c, deg)
        sph_j = {key: jnp.asarray(v) for key, v in sph.items()}
        yo = harmonics(c, sph_j, n_out)
        yi = yo if n_in == n_out else harmonics(c, sph_j, n_in)
        s_cart = to_cartesian(c, sph_j, include_r=False)
        bo = basis(c, n_out)
        bi = basis(c, n_in)
        phase = 1j ** (
            bo.n_root[:, None].astype(np.int64) - bi.n_root[None, :].astype(np.int64)
        )
        out = (
            jnp.asarray(w),
            jnp.conj(yo),
            yi,
            s_cart,
            jnp.asarray(phase),
            bo.n_root,
            bi.n_root,
        )
    return out


@lru_cache(maxsize=32)
def _a_node_m(c, n_end):
    """2D helper: signed azimuthal order m per flat harmonic."""
    b = basis(c, n_end)
    nid = c.root.nid
    jobs = b.node_jobs[nid]
    ms = np.array([p[0] for p in jobs], dtype=np.int64)
    return ms[b.node_job_index[nid]]


def _graf_2d(c, t_sph, n_out, n_in, k, kind):
    """Closed-form 2D translation via Graf's addition theorem.

    In our basis (Y_m = e^{i m phi}/sqrt(2 pi), degree |m|) the triplet
    formula collapses (Gaunt = delta_{m'' = m - m'} / sqrt(2 pi)) to

        M[m', m] = i^{|m'| - |m| + |m - m'|} C_{|m-m'|}(k|t|) e^{i(m-m') theta_t}

    with C = H^{(1)} for (S|R), J for (R|R).
    """
    mo = _a_node_m(c, n_out)
    mi = _a_node_m(c, n_in)
    mu = mi[None, :] - mo[:, None]  # [Ho, Hi], in - out
    mu_max = int(np.abs(mu).max())
    r_t = t_sph["r"]
    theta = t_sph[c.root.nid]
    z = jnp.asarray(k) * r_t
    jf, _, hf, _ = spherical_jh_all(2, mu_max + 1, z)
    tab = hf if kind == "SR" else jf  # [..., mu_max+1], = sqrt(pi/2) * (H or J)
    tab = tab * np.sqrt(2.0 / np.pi)  # back to standard cylinder functions
    ipow = jnp.asarray(
        1j ** ((np.abs(mo)[:, None] - np.abs(mi)[None, :] + np.abs(mu)) % 4),
        dtype=tab.dtype,
    )
    gathered = jnp.take(tab, jnp.asarray(np.abs(mu)), axis=-1)  # [..., Ho, Hi]
    mu_f = jnp.asarray(mu, dtype=z.real.dtype)
    phase = jnp.exp(1j * theta[..., None, None].astype(z.real.dtype) * mu_f)
    return gathered * ipow * phase.astype(tab.dtype)


def _sr_banded(c, t_sph, n_out, n_in, k, kind):
    """Masked band-accumulation (S|R) (or (R|R)) for d >= 3."""
    d = c.c_ndim
    w, yoc, yi, s_cart, phase, n_o, n_i = _quad_tables(c, n_out, n_in)
    k = jnp.asarray(k)
    r_t = t_sph["r"]
    cdt = jnp.result_type(k.dtype, r_t.dtype, jnp.complex64)
    rdt = jnp.finfo(cdt).dtype
    w = w.astype(rdt)
    yoc = yoc.astype(cdt)
    yi = yi.astype(cdt)
    phase = phase.astype(cdt)
    s_cart = s_cart.astype(rdt)
    t_hat = to_cartesian(c, {**t_sph, "r": jnp.ones_like(r_t)})
    # cos(gamma) between t^ and each quadrature direction: [..., Q]
    x = jnp.tensordot(jnp.moveaxis(t_hat, 0, -1).astype(rdt), s_cart, axes=(-1, 0))

    n_bands = (n_out - 1) + (n_in - 1) + 1
    z = k * r_t
    jf, _, hf, _ = spherical_jh_all(d, n_bands, z)
    rad = hf if kind == "SR" else jf  # [..., n_bands]

    nu = 0.5 * (d - 2.0)
    a_d = _a_const(d)
    omega = _surface_area(d)
    nsum = jnp.asarray(n_o[:, None] + n_i[None, :])  # [Ho, Hi]

    ho, hi = yoc.shape[-1], yi.shape[-1]
    batch = jnp.broadcast_shapes(x.shape[:-1], rad.shape[:-1])
    m0 = jnp.zeros(batch + (ho, hi), dtype=yi.dtype)

    def step(carry, n2):
        c_prev, c_cur, m = carry
        # zonal kernel Z_{n''} = (2n''+d-2)/(d-2) * C^{nu}_{n''}(x) / omega
        zonal = (2.0 * n2 + d - 2.0) / (d - 2.0) / omega * c_cur
        rad_n2 = jnp.take(rad, n2.astype(jnp.int32), axis=-1)  # [...]
        band = (
            a_d
            * jnp.exp(1j * (np.pi / 2.0) * n2).astype(rad_n2.dtype)
            * rad_n2[..., None]
            * zonal
            * w
        )
        t_mat = jnp.einsum("...q,qa,qb->...ab", band, yoc, yi)
        m = m + jnp.where(nsum >= n2, t_mat, 0.0)
        # Gegenbauer recurrence: (n+1) C_{n+1} = 2(n+nu) x C_n - (n+2nu-1) C_{n-1}
        c_next = (2.0 * (n2 + nu) * x * c_cur - (n2 + 2.0 * nu - 1.0) * c_prev) / (
            n2 + 1.0
        )
        return (c_cur, c_next, m), None

    c0 = jnp.ones_like(x)
    cm1 = jnp.zeros_like(x)
    ns = jnp.arange(n_bands, dtype=x.dtype)
    (_, _, m), _ = jax.lax.scan(step, (cm1, c0, m0), ns)
    return m * phase


def translation_matrix(c, t, n_end, k, kind="SR", n_end_add=None, method=None):
    """Translation operator matrix [..., H_out, H_in] for offsets t.

    Parameters
    ----------
    c : SphericalCoordinates
    t : cartesian offsets [d, ...] or a spherical mapping (from_cartesian)
    n_end : output (re-expansion) degree cutoff -> H_out harmonics
    k : wavenumber, broadcastable to t's batch shape [...]
    kind : "SR" (singular-around-regular; the inter-sphere coupling of the
        BIEM) or "RR" (regular-regular)
    n_end_add : input degree cutoff (default n_end) -> H_in harmonics
    method : None | "triplet" | "plane_wave" | "gumerov".  API parity with
        the reference (_biem.py:569-574); "plane_wave" is rejected for
        kind="SR" exactly as in the reference.  All methods are exact here,
        so the names select the same stable algorithm.

    Convention: S_h(y + t) = sum_{h'} M[..., h', h] R_{h'}(y).
    """
    n_in = n_end if n_end_add is None else n_end_add
    if method not in (None, "triplet", "plane_wave", "gumerov"):
        raise ValueError(f"unknown translation method {method!r}")
    if kind == "SR" and method == "plane_wave":
        raise ValueError(
            'method="plane_wave" is only available for same-type (R|R) '
            "translation (reference: _biem.py:573-574)"
        )
    if kind not in ("SR", "RR"):
        raise ValueError(f"kind must be 'SR' or 'RR', got {kind!r}")

    if isinstance(t, dict):
        t_sph = t
        t_cart = None
    else:
        t_cart = jnp.asarray(t)
        t_sph = from_cartesian(c, t_cart)
    k = jnp.asarray(k)

    if c.c_ndim == 2:
        return _graf_2d(c, t_sph, n_end, n_in, k, kind)

    if kind == "RR":
        # bounded plane-wave kernel: single dense contraction, exact
        w, yoc, yi, s_cart, phase, _, _ = _quad_tables(c, n_end, n_in)
        if t_cart is None:
            t_cart = to_cartesian(c, t_sph)
        cdt = jnp.result_type(k.dtype, t_cart.dtype, jnp.complex64)
        rdt = jnp.finfo(cdt).dtype
        ts = jnp.tensordot(
            jnp.moveaxis(t_cart, 0, -1).astype(rdt), s_cart.astype(rdt), axes=(-1, 0)
        )
        f = jnp.exp(1j * k[..., None].astype(rdt) * ts) * w.astype(rdt)
        return jnp.einsum(
            "...q,qa,qb->...ab", f, yoc.astype(cdt), yi.astype(cdt)
        ) * phase.astype(cdt)

    return _sr_banded(c, t_sph, n_end, n_in, k, kind)

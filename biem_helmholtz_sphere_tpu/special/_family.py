"""d-dimensional spherical Bessel/Hankel functions for all orders 0..n_end-1.

Convention (fixed by requiring the d-dim outgoing Green's function expansion
G(x,y) = i k^{d-2} sum_{n,p} j_n(k|y|) h^{(1)}_n(k|x|) Y_{n,p}(x^)conj(Y_{n,p}(y^))
to hold, which is the convention the reference's layer-potential coefficients
slc_n = i k^{d-2} rho^{d-1} j_n(k rho) assume; reference: _biem.py:516-518):

    j_n^{(d)}(z) = sqrt(pi/2) z^{-(d-2)/2} J_{n+(d-2)/2}(z)
    h_n^{(d)}(z) = sqrt(pi/2) z^{-(d-2)/2} H^{(1)}_{n+(d-2)/2}(z)

For d = 3 this is the classical spherical Bessel function; for d = 2 it is
sqrt(pi/2) J_n.  Every dimension reduces to the base-2 (cylinder) or base-3
(trigonometric) family: with d = base + 2m,

    j_n^{(d)}(z) = z^{-m} j_{n+m}^{(base)}(z).

Order recurrence: f_{n-1} + f_{n+1} = c_n f_n with c_n = (2n + base - 2)/z.
j_n is computed by upward recurrence from exact seeds in the oscillatory
regime n <= |z| and by a normalized downward (Miller) recurrence with
log-scale overflow protection in the evanescent regime n > |z|; h_n by
upward recurrence (always stable).  This replaces the reference's
scipy.special C/Fortran kernels (SURVEY.md section 2.4 item 2) with a pure
JAX implementation that jits and vmaps on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gamma as _sp_gamma

from ._cyl import cyl_jh01

_MILLER_BUFFER = 36
_SQRT_PI_2 = float(np.sqrt(np.pi / 2.0))


def _rescale_for(dtype):
    """Log-scaling threshold: must be representable in the real dtype."""
    return 1e150 if jnp.finfo(dtype).bits >= 128 else 1e30


def _as_complex(z):
    """Promote to complex, keeping width (f32->c64, f64->c128, int->default)."""
    z = jnp.asarray(z)
    if jnp.issubdtype(z.dtype, jnp.complexfloating):
        return z
    return z * (1.0 + 0.0j)  # weak-typed promotion respects x64 setting


def _seeds(base, z):
    """(j0, j1, h0, h1) of the base family at complex z."""
    if base == 2:
        j0, j1, h0, h1 = cyl_jh01(z)
        return (_SQRT_PI_2 * j0, _SQRT_PI_2 * j1, _SQRT_PI_2 * h0, _SQRT_PI_2 * h1)
    # base == 3: closed trigonometric forms
    sin, cos, eiz = jnp.sin(z), jnp.cos(z), jnp.exp(1j * z)
    small = jnp.abs(z) < 1e-4
    zs = jnp.where(small, jnp.ones_like(z), z)
    z2 = zs * zs
    j0 = jnp.where(small, 1.0 - z2 / 6.0 * (1.0 - z2 / 20.0), sin / zs)
    j1 = jnp.where(
        small, z / 3.0 * (1.0 - z2 / 10.0 * (1.0 - z2 / 28.0)), sin / z2 - cos / zs
    )
    h0 = -1j * eiz / zs
    h1 = -eiz * (zs + 1j) / z2
    return j0, j1, h0, h1


def _upward(base, n_top, f0, f1, z):
    """Upward recurrence f_{n+1} = c_n f_n - f_{n-1}; returns [..., n_top+1]."""
    inv = 1.0 / z

    def step(carry, n):
        fm, fn = carry
        fp = (2.0 * n + base - 2.0) * inv * fn - fm
        return (fn, fp), fp

    ns = jnp.arange(1, n_top, dtype=z.real.dtype)
    if n_top <= 1:
        return jnp.stack([f0, f1][: n_top + 1], axis=-1)
    (_, _), rest = jax.lax.scan(step, (f0, f1), ns)
    # rest: [n_top-1, ...] -> [..., n_top-1]
    rest = jnp.moveaxis(rest, 0, -1)
    return jnp.concatenate([f0[..., None], f1[..., None], rest], axis=-1)


def _miller_down(base, n_max, z):
    """Downward (Miller) recurrence, unnormalized, with log-scaling.

    Returns (a, sig): unnormalized f_n = a[..., n] * exp(sig[..., n]),
    n = 0..n_max, where sig is the cumulative log rescale (sig_n >= sig_m
    for n <= m).
    """
    n_start = n_max + _MILLER_BUFFER
    inv = 1.0 / z
    rescale = _rescale_for(z.dtype)
    log_rescale = float(np.log(rescale))

    def step(carry, n):
        fn1, fn, sig = carry  # f_{n+1}, f_n at scale exp(sig)
        fm = (2.0 * n + base - 2.0) * inv * fn - fn1  # f_{n-1}
        too_big = jnp.abs(fm) > rescale
        scale = jnp.where(too_big, 1.0 / rescale, 1.0)
        fm2 = fm * scale
        fn2 = fn * scale
        sig2 = sig + jnp.where(too_big, log_rescale, 0.0)
        return (fn2, fm2, sig2), (fm2, sig2)

    zero = jnp.zeros_like(z)
    one = jnp.ones_like(z)
    sig0 = jnp.zeros_like(z.real)
    ns = jnp.arange(n_start, 0, -1, dtype=z.real.dtype)
    (_, _, _), (fs, sigs) = jax.lax.scan(step, (zero, one, sig0), ns)
    # fs[i] corresponds to f_{n_start - 1 - i}; keep n = 0..n_max
    fs = jnp.moveaxis(fs, 0, -1)[..., ::-1]  # [..., n_start] for n = 0..n_start-1
    sigs = jnp.moveaxis(sigs, 0, -1)[..., ::-1]
    return fs[..., : n_max + 1], sigs[..., : n_max + 1]


@partial(jax.jit, static_argnums=(0, 1))
def family_jh(base, n_max, z):
    """j_n, h_n of the base family for n = 0..n_max at complex z [...].

    Returns (j, h) with shape [..., n_max + 1].
    """
    z = _as_complex(z)
    j0, j1, h0, h1 = _seeds(base, z)
    h = _upward(base, n_max, h0, h1, z)
    j_up = _upward(base, n_max, j0, j1, z)

    a, sig = _miller_down(base, n_max, z)
    # Normalize via the Wronskian j_1 h_0 - j_0 h_1 = i / z^{base-1}.
    w_target = 1j * z ** (1.0 - base)
    e10 = jnp.exp(sig[..., 1] - sig[..., 0])
    denom = a[..., 1] * e10 * h0 - a[..., 0] * h1
    s = w_target / denom
    j_down = s[..., None] * a * jnp.exp(sig - sig[..., :1])

    n_arr = jnp.arange(n_max + 1, dtype=z.real.dtype)
    use_up = n_arr <= jnp.abs(z)[..., None]
    j = jnp.where(use_up, j_up, j_down)
    return j, h


def _shift_deriv(base, m, f, z, inv_zm):
    """Derivative of z^{-m} f_{n+m} given base-family f table [..., n_top+1].

    f'_n(base) = f_{n-1} - ((n + base - 2)/z) f_n,  f'_0 = -f_1.
    d/dz [z^{-m} f_{n+m}] = z^{-m} (f'_{n+m} - (m/z) f_{n+m}).
    """
    n_top = f.shape[-1] - 1
    n_arr = jnp.arange(n_top + 1, dtype=z.real.dtype)
    fm1 = jnp.concatenate([f[..., 1:2], f[..., :-1]], axis=-1)  # placeholder at n=0
    fp = fm1 - (n_arr + base - 2.0) / z[..., None] * f
    # n = 0: f'_0 = -f_1 exactly, for both base families (J_0' = -J_1; j_0' = -j_1)
    fp = jnp.concatenate([-f[..., 1:2], fp[..., 1:]], axis=-1)
    if m == 0:
        return (inv_zm[..., None] * fp)[..., : n_top + 1]
    g = inv_zm[..., None] * (fp - (m / z)[..., None] * f)
    return g


@partial(jax.jit, static_argnums=(0, 1))
def spherical_jh_all(d, n_end, z):
    """j_n^{(d)}, j_n', h_n^{(d)}, h_n' for n = 0..n_end-1 at z [...].

    Returns (j, jp, h, hp), each of shape [..., n_end].  This is the engine
    behind the reference's `ultrasphere.shn1` and `potential_coef` radial
    factors (reference: _biem.py:440-447, 654-685).
    """
    if d < 2:
        raise ValueError(f"dimension must be >= 2, got {d}")
    base = 2 if d % 2 == 0 else 3
    m = (d - base) // 2
    z = _as_complex(z)
    at_zero = z == 0
    zs = jnp.where(at_zero, jnp.ones_like(z), z)
    n_top = n_end - 1 + m
    jf, hf = family_jh(base, n_top, zs)
    inv_zm = zs ** (-float(m)) if m > 0 else jnp.ones_like(zs)
    jp_full = _shift_deriv(base, m, jf, zs, inv_zm)
    hp_full = _shift_deriv(base, m, hf, zs, inv_zm)
    j = inv_zm[..., None] * jf[..., m : m + n_end]
    h = inv_zm[..., None] * hf[..., m : m + n_end]
    jp = jp_full[..., m : m + n_end]
    hp = hp_full[..., m : m + n_end]
    # z = 0 limits: j_n(0) = c_d delta_{n0}, j_n'(0) = (c_d/d) delta_{n1},
    # with c_d = sqrt(pi/2) 2^{-nu} / Gamma(nu+1); h diverges -> inf.
    nu = 0.5 * (d - 2.0)
    c_d = float(np.sqrt(np.pi / 2.0) * 2.0 ** (-nu) / _sp_gamma(nu + 1.0))
    n_arr = jnp.arange(n_end)
    z0 = at_zero[..., None]
    j = jnp.where(z0, jnp.where(n_arr == 0, c_d, 0.0), j)
    jp = jnp.where(z0, jnp.where(n_arr == 1, c_d / d, 0.0), jp)
    h = jnp.where(z0, jnp.inf, h)
    hp = jnp.where(z0, jnp.inf, hp)
    return j, jp, h, hp

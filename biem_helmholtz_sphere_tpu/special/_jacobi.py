"""Orthonormal Jacobi polynomial recurrences.

These are the angular building blocks of hyperspherical harmonics in any
dimension (reference capability: the `jacobi-poly` package, numba JIT;
SURVEY.md section 2.3).  We work directly with the *orthonormal* family
p~_n(x) for weight w(x) = (1-x)^alpha (1+x)^beta on [-1, 1]:

    x p~_n = b_{n+1} p~_{n+1} + a_n p~_n + b_n p~_{n-1}

so values stay O(1) even at large degree/parameter, avoiding the float64
overflow of the classical C_n^lambda normalization (the 2D accuracy sweep
reaches degree 3444; reference: accuracy/accuracy_k_a.csv).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln


def jacobi_mu0(alpha, beta):
    """mu_0 = integral of (1-x)^alpha (1+x)^beta over [-1, 1]."""
    return np.exp(
        (alpha + beta + 1.0) * np.log(2.0)
        + gammaln(alpha + 1.0)
        + gammaln(beta + 1.0)
        - gammaln(alpha + beta + 2.0)
    )


def jacobi_recurrence(n_max, alpha, beta):
    """Jacobi-matrix coefficients (a_n, b_n) for n = 0..n_max (numpy, host).

    a_n is the diagonal, b_n (n >= 1) the off-diagonal of the Jacobi matrix
    of the orthonormal family; b_0 = sqrt(mu_0).
    """
    n = np.arange(n_max + 1, dtype=np.float64)
    s = alpha + beta
    with np.errstate(invalid="ignore", divide="ignore"):
        a = (beta**2 - alpha**2) / ((2 * n + s) * (2 * n + s + 2))
    a[0] = (beta - alpha) / (s + 2.0)  # the n=0 formula is 0/0 when s=0
    b2 = np.empty(n_max + 1)
    b2[0] = jacobi_mu0(alpha, beta)
    nn = n[1:]
    b2[1:] = (
        4.0
        * nn
        * (nn + alpha)
        * (nn + beta)
        * (nn + s)
        / ((2 * nn + s) ** 2 * (2 * nn + s + 1) * (2 * nn + s - 1))
    )
    return a, np.sqrt(b2)


@partial(jax.jit, static_argnums=(1,))
def _eval_scan(x, n_max, a, b):
    """Evaluate p~_0..p~_{n_max} at x given recurrence coeff arrays.

    a: [F, n_max+1], b: [F, n_max+1] for F independent families; x: [...].
    Returns [..., F, n_max+1].
    """
    x_ = x[..., None]
    p0 = jnp.ones_like(x_) / b[:, 0]
    out0 = p0
    if n_max == 0:
        return out0[..., None]

    def step(carry, coeffs):
        pm, pn = carry
        a_n, b_n, b_n1 = coeffs
        pp = ((x_ - a_n) * pn - b_n * pm) / b_n1
        return (pn, pp), pp

    coeffs = (a[:, :n_max].T, b[:, :n_max].T, b[:, 1 : n_max + 1].T)
    (_, _), rest = jax.lax.scan(step, (jnp.zeros_like(p0), p0), coeffs)
    rest = jnp.moveaxis(rest, 0, -1)  # [..., F, n_max]
    return jnp.concatenate([out0[..., None], rest], axis=-1)


def orthonormal_jacobi_table(x, n_max, alphas, betas):
    """Table of orthonormal Jacobi values for several (alpha, beta) families.

    x: [...] points; alphas/betas: length-F arrays (host floats).
    Returns [..., F, n_max+1] with entry [..., f, n] = p~_n^{(af, bf)}(x).
    """
    F = len(alphas)
    a = np.zeros((F, n_max + 1))
    b = np.zeros((F, n_max + 1))
    for f in range(F):
        a[f], b[f] = jacobi_recurrence(n_max, float(alphas[f]), float(betas[f]))
    x = jnp.asarray(x)
    rdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float64
    return _eval_scan(x, n_max, jnp.asarray(a, dtype=rdt), jnp.asarray(b, dtype=rdt))


def orthonormal_jacobi_all(x, n_max, alpha, beta):
    """Single-family convenience wrapper; returns [..., n_max+1]."""
    t = orthonormal_jacobi_table(x, n_max, [alpha], [beta])
    return t[..., 0, :]

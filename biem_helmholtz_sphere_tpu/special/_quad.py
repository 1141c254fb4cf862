"""Gauss-Jacobi quadrature nodes/weights (host-side, static constants).

Computed once per (tree, n_end) at trace time with the Golub-Welsch
eigenvalue method in float64 numpy; the nodes/weights are baked into the
jitted computation as constants, so nothing here runs on device.
Replaces the quadrature machinery inside the reference's
`ultrasphere-harmonics.expand` (SURVEY.md section 2.3).
"""

import numpy as np

from ._jacobi import jacobi_mu0, jacobi_recurrence


def gauss_jacobi(q, alpha, beta):
    """q-point Gauss-Jacobi rule for weight (1-x)^alpha (1+x)^beta on [-1,1].

    Exact for polynomials of degree <= 2q - 1.  Returns (x, w) float64.
    """
    if q < 1:
        raise ValueError("q must be >= 1")
    a, b = jacobi_recurrence(q, alpha, beta)
    # Symmetric tridiagonal Jacobi matrix: diag a[0..q-1], offdiag b[1..q-1]
    t = np.diag(a[:q]) + np.diag(b[1:q], 1) + np.diag(b[1:q], -1)
    x, v = np.linalg.eigh(t)
    w = jacobi_mu0(alpha, beta) * v[0, :] ** 2
    return x, w


def uniform_circle(q):
    """q-point uniform rule on [0, 2pi): exact for e^{i m phi}, |m| < q."""
    phi = 2.0 * np.pi * np.arange(q) / q
    w = np.full(q, 2.0 * np.pi / q)
    return phi, w

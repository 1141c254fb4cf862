"""Incident-wave factories: plane wave and point source.

API parity with the reference (`plane_wave` at _biem.py:329-388,
`point_source` at _biem.py:391-450): each returns a pair of closures
(u_in, grad u_in) with the reference's broadcast convention — input x of
shape (c_ndim, ...(any), ...batch) where the trailing axes align with
the factory's own k/direction batch shape.
"""

import jax.numpy as jnp

from ..ops import cplx
from ..ops.cplx import C
from ..special._shn1 import shn1


def _broadcast_shapes_or_raise(name_a, a_shape, name_b, b_shape):
    try:
        jnp.broadcast_shapes(a_shape, b_shape)
    except Exception as e:
        raise ValueError(
            f"Shapes of {name_a} and {name_b} are not broadcastable: "
            f"{tuple(a_shape)} vs {tuple(b_shape)}"
        ) from e


def plane_wave(*, k, direction):
    r"""Plane wave u(x) = e^{i k d.x} with d = direction/|direction|.

    k: [...] (real array or C); direction: [c_ndim, ...].
    Returns (u_in, grad_u_in); both produce real-pair complex C values.

    >>> import numpy as np
    >>> uin, grad = plane_wave(k=np.asarray(2.0),
    ...                        direction=np.asarray([1.0, 0.0]))
    >>> complex(uin(np.zeros((2, 1))).to_numpy().ravel()[0])  # e^0
    (1+0j)
    >>> z = complex(uin(np.array([[np.pi / 4], [0.0]])).to_numpy()[0])
    >>> print(f"{z:.6f}")  # e^{i k pi/4} = i at k=2
    0.000000+1.000000j
    """
    if not isinstance(k, C):
        k = jnp.asarray(k)
    direction = jnp.asarray(direction)
    _broadcast_shapes_or_raise("k", k.shape, "direction[1:]", direction.shape[1:])
    if direction.ndim != k.ndim + 1:
        raise ValueError(f"direction.ndim={direction.ndim} is not k.ndim+1={k.ndim + 1}")
    direction = direction / jnp.linalg.norm(direction, axis=0, keepdims=True)

    def _dir(x):
        return direction[(slice(None),) + (None,) * (x.ndim - direction.ndim) + (...,)]

    k_c = isinstance(k, C)

    def _phase(ip):
        if k_c:
            return cplx.exp(k * ip * 1j)
        return cplx.expi(k * ip)

    def uin(x, /):
        x = jnp.asarray(x)
        ip = jnp.sum(_dir(x) * x, axis=0)
        return _phase(ip)

    def uin_grad(x, /):
        x = jnp.asarray(x)
        dd = _dir(x)
        ip = jnp.sum(dd * x, axis=0)
        # (i k) stays in real-pair form: C * real * 1j
        return _phase(ip)[None, ...] * dd * k * 1j

    # Shared tag consumed by biem()'s analytic RHS fast path: the
    # harmonic expansion of a plane wave over each sphere has a closed
    # form (the d-dim plane-wave expansion, translation/_ops.py), so the
    # boundary-data quadrature can be skipped entirely.  `biem` only
    # trusts the tag when uin/uin_grad carry the SAME tuple (i.e. both
    # came from one plane_wave(...) call).
    tag = ("plane_wave", k, direction)
    uin._analytic = tag
    uin_grad._analytic = tag
    return uin, uin_grad


def point_source(*, k, source, n=0):
    r"""Point source u(x) = h^{(1)}_n(k |x - source|) in d dimensions.

    k: [...]; source: [c_ndim, ...].  Returns (u_in, grad_u_in) -> C.

    >>> import numpy as np
    >>> uin, grad = point_source(k=np.asarray(1.0),
    ...                          source=np.asarray([0.0, 0.0, 3.0]))
    >>> u = uin(np.zeros((3, 1))).to_numpy().ravel()[0]  # h_0^(1)(3)
    >>> print(f"{complex(u):.6f}")  # sin(3)/3 - i cos(3)/3
    0.047040+0.329997j
    """
    if not isinstance(k, C):
        k = jnp.asarray(k)
    source = jnp.asarray(source)
    _broadcast_shapes_or_raise("k", k.shape, "source[1:]", source.shape[1:])
    if source.ndim != k.ndim + 1:
        raise ValueError(f"source.ndim={source.ndim} is not k.ndim+1={k.ndim + 1}")

    def _rel(x):
        x = jnp.asarray(x)
        return x - source[(slice(None),) + (None,) * (x.ndim - source.ndim) + (...,)]

    def uin(x, /):
        xr = _rel(x)
        d = int(xr.shape[0])
        r = jnp.linalg.norm(xr, axis=0)
        return shn1(n, d, k * r)

    def uin_grad(x, /):
        xr = _rel(x)
        d = int(xr.shape[0])
        r = jnp.linalg.norm(xr, axis=0)
        coeff = shn1(n, d, k * r, derivative=True) * k / r
        return coeff[None, ...] * xr

    return uin, uin_grad

"""Small compatibility utilities mirroring reference micro-dependencies.

* `btensorsolve` — the `batch-tensorsolve` package (reference:
  _biem.py:10,797): reshape a [..., B, H, B', H'] block tensor and a
  [..., B, H] right-hand side to a square system and solve, batched over
  the leading `num_batch_axes` axes.
* `shift_nth_row_n_steps` — the `shift-nth-row-n-steps` package
  (SURVEY.md section 2.3): roll row n of a matrix by n steps, the index
  gymnastics behind the reference's triplet method; here a one-liner
  gather.
"""

import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from ..ops.cplx import C


def btensorsolve(matrix, rhs, num_batch_axes=0):
    """Batched tensorsolve: collapse non-batch axes into a square system.

    matrix: [batch..., I1..Ik, J1..Jk] with prod(I) == prod(J);
    rhs: [batch..., I1..Ik].  Returns [batch..., J1..Jk].
    """
    m = C.of(matrix)
    b = C.of(rhs)
    batch = m.shape[:num_batch_axes]
    rhs_shape = b.shape[num_batch_axes:]
    n = int(np.prod(rhs_shape, dtype=np.int64)) if rhs_shape else 1
    sol_shape = m.shape[num_batch_axes + len(rhs_shape):]
    m2 = m.reshape(batch + (n, n))
    b2 = b.reshape(batch + (n,))
    x = cplx.solve(m2, b2)
    return x.reshape(batch + sol_shape)


def shift_nth_row_n_steps(a, axis_row=-2, axis_shift=-1):
    """Shift row n by n steps along axis_shift (cyclic)."""
    a_is_c = isinstance(a, C)
    arr = a if a_is_c else jnp.asarray(a)
    nrows = arr.shape[axis_row]
    ncols = arr.shape[axis_shift]
    rows = np.arange(nrows)[:, None]
    cols = (np.arange(ncols)[None, :] - rows) % ncols
    idx = jnp.asarray(cols)

    def gather(x):
        x = jnp.moveaxis(x, (axis_row % x.ndim, axis_shift % x.ndim), (-2, -1))
        out = jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape), axis=-1)
        return jnp.moveaxis(out, (-2, -1), (axis_row % x.ndim, axis_shift % x.ndim))

    if a_is_c:
        return C(gather(arr.re), gather(arr.im))
    return gather(arr)

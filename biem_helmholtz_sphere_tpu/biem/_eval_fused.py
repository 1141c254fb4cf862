r"""Fused harmonic contraction for field evaluation on the 3D "ba" tree.

The general evaluation path materializes Y_h at every point — a
[points, B, H] complex tensor plus same-sized recurrence-table
temporaries — before the density contraction sum_h w_h Y_h collapses it
(reference analogue: _biem.py:922-966).  On TPU that makes `uscat`
HBM-traffic-bound.  For the hot 3D case Y factorizes as

    Y_{l,m}(th, ph) = e^{i m ph}/sqrt(2 pi) (sin th)^{|m|}
                      p~_{l-|m|}^{(|m|,|m|)}(cos th)

so the contraction regroups per signed order m and Jacobi degree j:

    sum_h w_h rad_{l_h} Y_h =
      sum_m  A_m(ph, th) sum_j p~_j^{(|m|)}(cos th) rad_{j+|m|} w[m, j]

and the inner j-sum rides INSIDE the Jacobi three-term-recurrence scan:
the carry is (p_{j-1}, p_j, acc[..., B, M]) and nothing of size
[points, B, H] is ever written.  Working set drops from O(points*B*H)
to O(points*B*M), ~n_end-fold less HBM traffic.

`rad` carries the per-point radial factor h^{(1)}_l(kr) for the near
field (folded in by degree l = j + |m| via a per-step static gather);
None for the far field where the radial factor is constant and folded
into w by the caller.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..harmonics._eval import _int_powers
from ..harmonics._index import basis
from ..ops import cplx
from ..ops.cplx import C
from ..special._jacobi import jacobi_recurrence

# Probe hook (tools/eval_unroll_probe.py): nonzero forces the scan
# unroll factor. jit caches key on the value read at trace time.
_UNROLL_OVERRIDE = 0


def is_ba_tree(c):
    """True for the 3D "ba" tree (root 'b'/'bp' with a single 'a' child)."""
    return (
        c.c_ndim == 3
        and c.root.kind in ("b", "bp")
        and len(c.root.children) == 1
        and c.root.children[0].kind == "a"
    )


@lru_cache(maxsize=32)
def _fused_tables(c, n_end):
    """Static tables: recurrence coefficients and index maps (numpy)."""
    b_ = basis(c, n_end)
    ell = np.array(
        [b_.node_jobs[c.root.nid][j][1] for j in b_.node_job_index[c.root.nid]],
        dtype=np.int64,
    )
    anid = c.root.children[0].nid
    mm = np.array(
        [b_.node_jobs[anid][j][0] for j in b_.node_job_index[anid]],
        dtype=np.int64,
    )
    n = n_end
    m_axis = np.arange(-(n - 1), n)  # signed m per M-slot
    m_abs = np.abs(m_axis)
    n_m = len(m_axis)  # M = 2n - 1
    # h index per (m-slot, j); -1 where j >= n - |m|
    hmap = -np.ones((n_m, n), dtype=np.int64)
    hmap[mm + (n - 1), ell - np.abs(mm)] = np.arange(b_.num)
    valid = hmap >= 0
    # orthonormal Jacobi recurrence coefficients per |m| family
    a_tab = np.zeros((n, n + 1))
    b_tab = np.zeros((n, n + 1))
    for f in range(n):
        a_tab[f], b_tab[f] = jacobi_recurrence(n, float(f), float(f))
    # per-step radial gather order j + |m| (clipped; invalid masked by w2)
    rad_idx = np.minimum(np.arange(n)[:, None] + m_abs[None, :], n - 1)
    return m_axis, m_abs, hmap, valid, a_tab, b_tab, rad_idx


def fused_ba_dot(c, n_end, w, theta, phi, rad=None):
    """sum_h w[..., B, H] rad[..., B, :]_(l_h) Y_h(theta, phi) -> C [..., B].

    w: C, broadcastable [..., B, H] (point axes may be size-1);
    theta/phi: [..., B] angles of the evaluation directions;
    rad: C [..., B, L>=n_end] per-point radial table indexed by degree,
    or None (factor 1).
    """
    m_axis, m_abs, hmap, valid, a_tab, b_tab, rad_idx = _fused_tables(c, n_end)
    n = n_end
    rdt = jnp.result_type(theta.dtype, jnp.float32)
    w = C.of(w).astype(rdt)
    if rad is not None:
        rad = rad.astype(rdt)
    # regroup w -> [..., B, M, D] (small: no point axes), invalid -> 0
    w2 = cplx.take(w, jnp.asarray(np.maximum(hmap, 0)), axis=-1)
    w2 = w2 * jnp.asarray(valid, dtype=rdt)
    ct = jnp.cos(theta)
    fam = jnp.asarray(m_abs)  # [M]

    a_j = jnp.asarray(a_tab[:, :n].T.copy(), rdt)  # [D, F]
    b_j = jnp.asarray(b_tab[:, :n].T.copy(), rdt)
    b_j1 = jnp.asarray(b_tab[:, 1 : n + 1].T.copy(), rdt)
    w2_steps = cplx.moveaxis(w2, -1, 0)  # [D, ..., B, M]
    rad_steps = jnp.asarray(rad_idx)  # [D, M]

    x_ = ct[..., None].astype(rdt)  # [..., B, 1(F)]
    p0 = jnp.ones_like(x_) / jnp.asarray(b_tab[:, 0], rdt)  # [..., B, F]
    pm0 = jnp.zeros_like(p0)

    batch = jnp.broadcast_shapes(
        w2.re.shape[:-2],
        theta.shape,
        () if rad is None else rad.re.shape[:-1],
    )
    acc0 = C.zeros(batch + (len(m_axis),), dtype=rdt)

    def step(carry, xs):
        pm, pn, acc = carry
        a_f, b_f, b1_f, w2_j, ridx = xs
        pj_m = jnp.take(pn, fam, axis=-1)  # [..., B, M]
        contrib = w2_j * pj_m
        if rad is not None:
            contrib = contrib * cplx.take(rad, ridx, axis=-1)
        acc = acc + contrib
        pp = ((x_ - a_f) * pn - b_f * pm) / b1_f
        return (pn, pp, acc), None

    # MEASURED (tools/eval_unroll_probe.py, v5e, B=16 n_end=32): scan
    # unrolling only hurts here — 9.7e5 pts/s at unroll=1 vs 5.7e5 at 8
    # and 4.3e5 at 32.  The unrolled body bloats the fused loop past
    # what the VPU scheduler handles well; the carry round-trip theory
    # did not survive contact with the hardware.  Keep unroll=1.
    unroll = _UNROLL_OVERRIDE or 1
    (_, _, acc), _ = jax.lax.scan(
        step, (pm0, p0, acc0), (a_j, b_j, b_j1, w2_steps, rad_steps),
        unroll=unroll,
    )

    st = jnp.sin(theta).astype(rdt)
    stpow = jnp.take(_int_powers(st, n - 1), fam, axis=-1)  # [..., B, M]
    az = cplx.expi(phi[..., None].astype(rdt) * jnp.asarray(m_axis, rdt))
    out = (acc * az * stpow).sum(axis=-1)
    return out * (1.0 / np.sqrt(2.0 * np.pi))

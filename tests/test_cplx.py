"""Real-pair complex layer vs numpy complex oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biem_helmholtz_sphere_tpu.ops import cplx
from biem_helmholtz_sphere_tpu.ops.cplx import C


@pytest.fixture
def zw(rng):
    z = rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5))
    w = rng.normal(size=(4, 5)) + 1j * rng.normal(size=(4, 5))
    return z, w


def test_arithmetic(zw):
    z, w = zw
    a, b = C.of(z), C.of(w)
    np.testing.assert_allclose((a + b).to_numpy(), z + w, rtol=1e-12)
    np.testing.assert_allclose((a - b).to_numpy(), z - w, rtol=1e-12)
    np.testing.assert_allclose((a * b).to_numpy(), z * w, rtol=1e-12)
    np.testing.assert_allclose((a / b).to_numpy(), z / w, rtol=1e-12)
    np.testing.assert_allclose((a * 2.0).to_numpy(), z * 2, rtol=1e-12)
    np.testing.assert_allclose((2.0 * a).to_numpy(), 2 * z, rtol=1e-12)
    np.testing.assert_allclose((a * 1j).to_numpy(), z * 1j, rtol=1e-12)
    np.testing.assert_allclose((1.0 / a).to_numpy(), 1 / z, rtol=1e-12)
    np.testing.assert_allclose((a - 1.0).to_numpy(), z - 1, rtol=1e-12)
    np.testing.assert_allclose((1.0 - a).to_numpy(), 1 - z, rtol=1e-12)
    np.testing.assert_allclose((a**3).to_numpy(), z**3, rtol=1e-11)
    np.testing.assert_allclose((a ** (-2)).to_numpy(), z ** (-2.0), rtol=1e-11)
    np.testing.assert_allclose(a.conj().to_numpy(), np.conj(z), rtol=1e-12)
    np.testing.assert_allclose(abs(a), np.abs(z), rtol=1e-12)
    np.testing.assert_allclose((a * np.complex128(2 + 3j)).to_numpy(), z * (2 + 3j))
    np.testing.assert_allclose((a * np.asarray(w)).to_numpy(), z * w, rtol=1e-12)


def test_transcendental(zw):
    z, _ = zw
    a = C.of(z)
    np.testing.assert_allclose(cplx.exp(a).to_numpy(), np.exp(z), rtol=1e-12)
    np.testing.assert_allclose(
        cplx.expi(z.real).to_numpy(), np.exp(1j * z.real), rtol=1e-12
    )
    np.testing.assert_allclose(cplx.sqrt(a).to_numpy(), np.sqrt(z), rtol=1e-12)
    np.testing.assert_allclose(cplx.log(a).to_numpy(), np.log(z), rtol=1e-12)
    np.testing.assert_allclose(
        cplx.cpow(a, 0.5).to_numpy(), z**0.5, rtol=1e-12
    )
    np.testing.assert_allclose(
        cplx.ipow(np.arange(9)).to_numpy(), 1j ** np.arange(9), atol=1e-15
    )


def test_contractions(rng):
    a = rng.normal(size=(6, 7)) + 1j * rng.normal(size=(6, 7))
    b = rng.normal(size=(7, 5)) + 1j * rng.normal(size=(7, 5))
    np.testing.assert_allclose(
        cplx.matmul(C.of(a), C.of(b)).to_numpy(), a @ b, rtol=1e-12
    )
    np.testing.assert_allclose(
        cplx.einsum("ij,jk->ik", C.of(a), C.of(b)).to_numpy(), a @ b, rtol=1e-12
    )
    w = rng.normal(size=7)
    np.testing.assert_allclose(
        cplx.einsum("ij,j->i", C.of(a), w).to_numpy(), a @ w, rtol=1e-12
    )
    np.testing.assert_allclose(
        cplx.einsum("j,jk->k", w, C.of(b)).to_numpy(), w @ b, rtol=1e-12
    )


def test_solve(rng):
    n = 12
    a = rng.normal(size=(3, n, n)) + 1j * rng.normal(size=(3, n, n))
    a = a + 5 * np.eye(n)
    b = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    x = cplx.solve(C.of(a), C.of(b)).to_numpy()
    np.testing.assert_allclose(np.einsum("bij,bj->bi", a, x), b, rtol=1e-9, atol=1e-10)


def test_indexing_and_shapes(zw):
    z, _ = zw
    a = C.of(z)
    np.testing.assert_allclose(a[1:3, ::2].to_numpy(), z[1:3, ::2])
    np.testing.assert_allclose(
        cplx.take(a, np.array([2, 0]), axis=0).to_numpy(), z[[2, 0]]
    )
    np.testing.assert_allclose(a.sum(axis=1).to_numpy(), z.sum(axis=1), rtol=1e-12)
    np.testing.assert_allclose(
        cplx.where(z.real > 0, a, C.of(0j)).to_numpy(), np.where(z.real > 0, z, 0)
    )
    np.testing.assert_allclose(
        cplx.moveaxis(a, 0, 1).to_numpy(), np.moveaxis(z, 0, 1)
    )
    np.testing.assert_allclose(
        cplx.stack([a, a], axis=1).to_numpy(), np.stack([z, z], axis=1)
    )
    # at_set
    out = a.at_set((0, slice(None)), C.of(1 + 2j))
    zz = z.copy()
    zz[0, :] = 1 + 2j
    np.testing.assert_allclose(out.to_numpy(), zz)


def test_pytree_jit_scan(zw):
    z, w = zw
    a = C.of(z)

    @jax.jit
    def f(x: C):
        def body(carry, _):
            return carry * x[0, 0], None

        out, _ = jax.lax.scan(body, C.of(1 + 0j), None, length=3)
        return out

    got = f(a).to_numpy()
    np.testing.assert_allclose(got, z[0, 0] ** 3, rtol=1e-10)


def test_broadcast_mixed_shapes():
    a = C(jnp.ones((3, 1)), jnp.zeros(()))  # lazily-broadcast im
    b = a + 1.0
    assert b.re.shape == (3, 1) and b.im.shape == (3, 1)
    assert a.shape == (3, 1)


def test_gmres_dense_matches_direct(rng):
    # hand-rolled CGS2+Givens GMRES (gmres_solve) against the LU solve,
    # well-conditioned (diagonally dominant) complex system
    n = 60
    a = (
        rng.normal(size=(n, n))
        + 1j * rng.normal(size=(n, n))
        + np.eye(n) * (2.5 * np.sqrt(n) + 2j)
    )
    b = rng.normal(size=(n,)) + 1j * rng.normal(size=(n,))
    ac = C(jnp.asarray(a.real), jnp.asarray(a.imag))
    bc = C(jnp.asarray(b.real), jnp.asarray(b.imag))
    xe = np.linalg.solve(a, b)
    x = cplx.gmres_solve(ac, bc)
    np.testing.assert_allclose(x.to_numpy(), xe, atol=np.abs(xe).max() * 1e-9)


def test_gmres_batched_restarted_jit(rng):
    # leading batch axes are independent systems; a tiny basis forces
    # multiple restart cycles; everything under jit
    a = (
        rng.normal(size=(3, 30, 30))
        + 1j * rng.normal(size=(3, 30, 30))
        + np.eye(30) * (15 + 1j)
    )
    b = rng.normal(size=(3, 30)) + 1j * rng.normal(size=(3, 30))
    ac = C(jnp.asarray(a.real), jnp.asarray(a.imag))
    bc = C(jnp.asarray(b.real), jnp.asarray(b.imag))
    xe = np.linalg.solve(a, b[..., None])[..., 0]
    x = jax.jit(lambda A, B: cplx.gmres_solve(A, B, restart=8, maxiter=60))(
        ac, bc
    )
    np.testing.assert_allclose(x.to_numpy(), xe, atol=np.abs(xe).max() * 1e-9)
    # zero rhs -> exactly zero solution, no NaN from 0/0 guards
    x0 = cplx.gmres_solve(ac, C.zeros((3, 30), jnp.float64))
    assert float(np.abs(x0.to_numpy()).max()) == 0.0

"""Pallas banded-SR kernel vs the XLA band scan (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from biem_helmholtz_sphere_tpu.coords import create_from_branching_types
from biem_helmholtz_sphere_tpu.translation import translation_matrix


def test_pallas_sr_matches_band_scan(rng):
    c = create_from_branching_types("ba")
    n_end = 10
    t = rng.normal(size=(3, 4)).astype(np.float32)
    t = t / np.linalg.norm(t, axis=0) * 4.0
    k = np.full(4, 1.3, np.float32)
    # method="triplet" pins the reference to the band scan (method=None
    # now auto-selects the rotation+coaxial fast path)
    ref = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", method="triplet"
    ).to_numpy()
    pal = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", use_pallas=True
    ).to_numpy()
    err = np.abs(pal - ref) / (np.abs(ref).max(axis=-1, keepdims=True) + 1e-30)
    assert err.max() < 1e-4, err.max()


def test_pallas_padding_path(rng):
    # H = 25 (not a tile multiple), Q padded too
    c = create_from_branching_types("ba")
    n_end = 5
    t = rng.normal(size=(3, 2)).astype(np.float32)
    t = t / np.linalg.norm(t, axis=0) * 3.0
    k = np.full(2, 0.9, np.float32)
    ref = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", method="triplet"
    ).to_numpy()
    pal = translation_matrix(
        c, jnp.asarray(t), n_end, jnp.asarray(k), kind="SR", use_pallas=True
    ).to_numpy()
    assert pal.shape == ref.shape
    err = np.abs(pal - ref) / (np.abs(ref).max() + 1e-30)
    assert err.max() < 1e-5, err.max()

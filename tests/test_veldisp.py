"""DM velocity dispersion walk tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.physics.veldisp import dm_velocity_dispersion

BOX = 20000.0


def test_veldisp_recovers_sigma():
    """DM with an isotropic Maxwellian velocity field: the measured
    1-D dispersion matches the input sigma."""
    rng = np.random.RandomState(0)
    ndm = 6000
    sigma_in = 50.0    # per-component, internal units
    atime = 0.5
    pos = rng.uniform(0, BOX, (ndm, 3))
    vel = rng.normal(0, sigma_in, (ndm, 3)).astype(np.float32)
    mass = np.ones(ndm, np.float32)

    ngas = 64
    gas_pos = rng.uniform(0.2 * BOX, 0.8 * BOX, (ngas, 3))
    sep = BOX / ndm ** (1 / 3)
    sigma, radius, rho = dm_velocity_dispersion(
        jnp.asarray(float_to_ipos(pos, BOX)), jnp.asarray(vel),
        jnp.asarray(mass), jnp.ones(ndm, bool),
        jnp.asarray(float_to_ipos(gas_pos, BOX)),
        np.full(ngas, 2 * sep, np.float32), BOX, atime)
    sigma = np.asarray(sigma)
    # physical dispersion = sigma_in / atime; sampled with ~40 ngbs
    expected = sigma_in / atime
    assert np.median(sigma) == pytest.approx(expected, rel=0.15)
    assert sigma.std() / sigma.mean() < 0.35
    # radii adapted to enclose ~40 neighbors
    r = np.asarray(radius)
    nin = 4 / 3 * np.pi * r ** 3 * ndm / BOX ** 3
    assert 15 < np.median(nin) < 100
    # returned density matches mean density within sampling noise
    mean_rho = ndm * 1.0 / BOX ** 3
    assert np.median(np.asarray(rho)) == pytest.approx(mean_rho,
                                                       rel=0.5)


def test_veldisp_cold_flow():
    """A coherent bulk flow has zero dispersion."""
    rng = np.random.RandomState(1)
    ndm = 3000
    pos = rng.uniform(0, BOX, (ndm, 3))
    vel = np.tile(np.array([100., -50., 25.], np.float32), (ndm, 1))
    gas_pos = rng.uniform(0.3 * BOX, 0.7 * BOX, (16, 3))
    sep = BOX / ndm ** (1 / 3)
    sigma, _, _ = dm_velocity_dispersion(
        jnp.asarray(float_to_ipos(pos, BOX)), jnp.asarray(vel),
        jnp.ones(ndm, jnp.float32), jnp.ones(ndm, bool),
        jnp.asarray(float_to_ipos(gas_pos, BOX)),
        np.full(16, 2 * sep, np.float32), BOX, atime=1.0)
    assert np.abs(np.asarray(sigma)).max() < 1.0

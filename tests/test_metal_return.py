"""Metal return tests (mirrors test_metal_return scope)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.physics.metal_return import (
    chabrier_imf, imf_mass_integral, lifetime_myr, mass_dying_at,
    find_mass_bin_limits, sn1a_number, MetalReturn, metal_return_step,
    SN1A_TOTAL_METALS)
from shenqi_tpu.physics.blackhole import bh_gas_environment
from shenqi_tpu.core.particles import float_to_ipos

YIELD_DIR = "/root/repo/data_yields"


def test_imf_properties():
    # continuous at m=1
    assert chabrier_imf(0.9999999) == pytest.approx(
        float(chabrier_imf(1.0000001)), rel=1e-3)
    # high-mass slope -2.3
    r = chabrier_imf(20.0) / chabrier_imf(10.0)
    assert r == pytest.approx(2 ** -2.3, rel=1e-10)
    # most of the IMF mass is in low-mass stars
    m_tot = imf_mass_integral(0.1, 40)
    m_high = imf_mass_integral(8, 40)
    assert 0.1 < m_high / m_tot < 0.35


def test_lifetimes():
    # the Sun lives ~10 Gyr
    t_sun = lifetime_myr(1.0, 0.02)
    assert 7e3 < t_sun < 1.5e4
    # massive stars die fast
    assert lifetime_myr(40, 0.02) < 10
    # lifetimes decrease with mass
    ms = np.array([1, 2, 5, 10, 20, 40])
    ts = lifetime_myr(ms, 0.004)
    assert np.all(np.diff(ts) < 0)
    # inverse consistency
    m = mass_dying_at(lifetime_myr(3.0, 0.02), 0.02)
    assert m == pytest.approx(3.0, rel=1e-5)


def test_mass_bin_limits():
    lo, hi = find_mass_bin_limits(5.0, 50.0, 0.02)
    # stars dying between 5 and 50 Myr are ~8-40ish Msun
    assert 6 < lo < 12
    assert hi > 30


def test_sn1a_dtd():
    # nothing before 40 Myr
    assert sn1a_number(0, 39, 0.7) == 0
    # total over a hubble time equals N0
    total = sn1a_number(40, 1 / (0.7 * 3.2407789e-18 * 3.155e13), 0.7)
    assert total == pytest.approx(1.3e-3, rel=1e-2)
    # rate declines with age
    early = sn1a_number(40, 140, 0.7)
    late = sn1a_number(940, 1040, 0.7)
    assert early > 5 * late


def test_star_return_fractions():
    mr = MetalReturn.load(YIELD_DIR)
    # full Chabrier SSP at solar Z over a Hubble time returns ~30-55%
    # of its mass, ~2-6% in metals
    mret, zret, nsn = mr.star_return(0.02, 0.0, 13000.0, 0.7)
    assert 0.25 < mret < 0.6
    assert 0.01 < zret < 0.08
    assert nsn == pytest.approx(1.3e-3, rel=0.05)
    # young window (only massive stars): SNII dominated, high Z yield
    mret2, zret2, nsn2 = mr.star_return(0.02, 0.0, 30.0, 0.7)
    assert nsn2 == 0
    assert mret2 > 0 and zret2 > 0
    assert zret2 / mret2 > 0.05    # SNII ejecta are metal-rich
    # old window: AGB dominated, metal-poor ejecta
    mret3, zret3, nsn3 = mr.star_return(0.02, 5000.0, 6000.0, 0.7)
    assert mret3 > 0
    assert zret3 / mret3 < zret2 / mret2


def test_metal_scatter_conserves():
    rng = np.random.RandomState(3)
    box = 10000.0
    ng = 400
    gas_pos = box / 2 + rng.uniform(-200, 200, (ng, 3))
    star_pos = np.array([[box / 2] * 3, [box / 2 + 50] * 3])
    gas_ipos = jnp.asarray(float_to_ipos(gas_pos % box, box))
    star_ipos = jnp.asarray(float_to_ipos(star_pos % box, box))
    hsml = jnp.asarray([150.0, 120.0])
    gmass = jnp.full(ng, 2.0, jnp.float32)
    alive = jnp.ones(ng, bool)
    env = bh_gas_environment(star_ipos, hsml, gas_ipos, gmass,
                             jnp.zeros(ng), jnp.zeros((ng, 3)),
                             alive, box)
    mret = jnp.asarray([1e-3, 2e-3])
    zret = jnp.asarray([1e-4, 3e-4])
    dm, dz = metal_return_step(star_ipos, hsml, mret, zret,
                               env.feedback_weight, gas_ipos, gmass,
                               alive, box)
    assert float(dm.sum()) == pytest.approx(3e-3, rel=1e-3)
    assert float(dz.sum()) == pytest.approx(4e-4, rel=1e-3)
    assert (np.asarray(dm) >= 0).all()

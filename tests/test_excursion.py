"""Excursion-set reionization tests (uvbg.cpp find_HII_bubbles
analog)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.physics.excursion import (ExcursionSetParams,
                                          calculate_uvbg,
                                          escape_fractions,
                                          radius_ladder, _filter_k)
from shenqi_tpu.physics.uv_fluctuations import J21Coeffs, uvbg_from_j21
from shenqi_tpu.physics.cooling_rates import UVBG

BOX = 20000.0
J21_FILE = "/root/reference/examples/J21_to_rates_test.txt"


def _cosmo():
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=0.1, units=default_units())
    return cp


def test_radius_ladder_and_filters():
    par = ExcursionSetParams(ReionRBubbleMax=5000.0,
                             ReionRBubbleMin=500.0,
                             ReionDeltaRFactor=1.5)
    radii = radius_ladder(par, BOX)
    assert radii[0] == 5000.0 and radii[-1] == 500.0
    assert all(radii[i] > radii[i + 1] for i in range(len(radii) - 1))
    # filters: unity at k=0, decay at high k
    k = jnp.asarray([0.0, 0.1, 1.0])
    for ftype in (0, 1, 2):
        w = np.asarray(_filter_k(k, 10.0, ftype))
        assert w[0] == pytest.approx(1.0, abs=1e-4)
        assert abs(w[2]) < 0.5


def test_escape_fraction_power_law():
    par = ExcursionSetParams(EscapeFractionNorm=0.2,
                             EscapeFractionScaling=-0.5)
    units = default_units()
    # halo at exactly 1e10 Msun/h -> fesc = norm
    m10 = 1e10 * 0.7 / (units.UnitMass_in_g / 1.989e33) * 1.0
    # mass in internal units such that conv*m = 1
    m_int = 1.0 / (units.UnitMass_in_g / 1.989e33 / 1e10 / 0.7)
    f = np.asarray(escape_fractions(
        jnp.asarray([m_int, 4 * m_int, 0.0]), par,
        units.UnitMass_in_g, 0.7))
    assert f[0] == pytest.approx(0.2, rel=1e-5)
    assert f[1] == pytest.approx(0.1, rel=1e-5)   # 4^-0.5 = 1/2
    assert f[2] == 0.0


def test_bubbles_form_around_stars():
    """A star cluster ionizes its neighbourhood; a starless region
    stays neutral; J21 > 0 only in ionized cells."""
    cp = _cosmo()
    units = default_units()
    rng = np.random.RandomState(0)
    n_dm = 6000
    pos_dm = rng.uniform(0, BOX, (n_dm, 3))
    m_dm = cp.Omega0 * cp.RhoCrit * BOX ** 3 / n_dm
    # dense star cluster in one corner octant
    n_star = 600
    pos_star = rng.uniform(0.1 * BOX, 0.3 * BOX, (n_star, 3))
    m_star = m_dm * 0.05

    pos = np.vstack([pos_dm, pos_star])
    mass = np.concatenate([np.full(n_dm, m_dm),
                           np.full(n_star, m_star)]).astype(np.float32)
    ptype = np.concatenate([np.ones(n_dm, np.int8),
                            np.full(n_star, 4, np.int8)])
    sfr = np.zeros(len(pos), np.float32)
    fesc = np.concatenate([np.zeros(n_dm), np.full(n_star, 1.0)])

    par = ExcursionSetParams(UVBGdim=32, ReionRBubbleMax=4000.0,
                             ReionRBubbleMin=700.0,
                             ReionDeltaRFactor=1.4,
                             ReionNionPhotPerBary=4000.0)
    res = calculate_uvbg(jnp.asarray(float_to_ipos(pos, BOX)),
                         jnp.asarray(mass), jnp.asarray(ptype),
                         jnp.asarray(sfr), jnp.asarray(fesc),
                         atime=1 / 8.0, CP=cp, units=units,
                         boxsize=BOX, par=par)
    xhi = np.asarray(res.xhi_grid)
    j21 = np.asarray(res.j21_grid)
    n = par.UVBGdim
    # cluster octant ionized; opposite corner neutral
    lo = slice(0, n // 2)
    hi = slice(n // 2, n)
    assert xhi[lo, lo, lo].mean() < 0.7
    assert xhi[hi, hi, hi].mean() > 0.95
    assert 0.0 <= float(res.vol_weighted_xhi) <= 1.0
    assert float(res.vol_weighted_xhi) < 1.0
    # J21 positive only where ionization happened
    assert (j21[xhi > 0.999] == 0).all()
    assert j21.max() > 0
    # gas readout: only gas rows get J21 (none here -> all zero)
    assert float(jnp.max(res.j21_particles)) == 0.0

    # now with some gas near the cluster
    n_gas = 200
    pos_gas = rng.uniform(0.1 * BOX, 0.3 * BOX, (n_gas, 3))
    pos2 = np.vstack([pos_gas, pos_dm, pos_star])
    mass2 = np.concatenate([np.full(n_gas, m_star), mass])
    ptype2 = np.concatenate([np.zeros(n_gas, np.int8), ptype])
    sfr2 = np.zeros(len(pos2), np.float32)
    fesc2 = np.concatenate([np.zeros(n_gas), fesc])
    res2 = calculate_uvbg(jnp.asarray(float_to_ipos(pos2, BOX)),
                          jnp.asarray(mass2), jnp.asarray(ptype2),
                          jnp.asarray(sfr2), jnp.asarray(fesc2),
                          atime=1 / 8.0, CP=cp, units=units,
                          boxsize=BOX, par=par)
    j21p = np.asarray(res2.j21_particles[:n_gas])
    assert (j21p > 0).mean() > 0.5   # most cluster gas sees UV


def test_uvbg_from_j21():
    co = J21Coeffs.load(J21_FILE)
    g = UVBG()
    uv = uvbg_from_j21(g, jnp.asarray([0.0, 1.0, 2.0]),
                       jnp.asarray([-1.0, 7.0, 7.0]), 7.0,
                       alpha_uv=1.0, coeffs=co)
    gj = np.asarray(uv.gJH0)
    assert gj[0] == 0.0
    assert gj[2] == pytest.approx(2 * gj[1], rel=1e-5)
    # HeII rates zeroed (handled by QSO lightup)
    assert float(jnp.max(uv.gJHep)) == 0.0
    assert float(jnp.max(uv.epsHep)) == 0.0
    # heating in erg/s: small positive numbers
    eps = np.asarray(uv.epsH0)
    assert eps[1] > 0 and eps[1] < 1e-18
    # self-shield density finite where ionized, huge where J21=0
    ss = np.asarray(uv.self_shield_dens)
    assert ss[0] > 1e9
    assert 1e-5 < ss[1] < 1.0

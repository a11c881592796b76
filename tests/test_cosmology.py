"""Cosmology background tests (mirrors reference test_cosmology coverage)."""

import numpy as np
import pytest

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.neutrinos import OmegaNu
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.utils.constants import HUBBLE


def make_cosmo(**kw):
    defaults = dict(Omega0=0.2814, OmegaLambda=0.7186, OmegaBaryon=0.0464,
                    HubbleParam=0.697, CMBTemperature=2.7255, RadiationOn=1)
    defaults.update(kw)
    cp = Cosmology(**defaults)
    cp.init(TimeBegin=0.01, units=default_units())
    return cp


def test_hubble_internal_units():
    cp = make_cosmo()
    units = default_units()
    # H0 in internal units = 3.2407789e-18 * (kpc/km s) ~ 0.1 for kpc/h units
    assert cp.Hubble == pytest.approx(HUBBLE * units.UnitTime_in_s)
    assert cp.Hubble == pytest.approx(0.1, rel=1e-3)
    # E(a=1) ~ 1 (tiny radiation correction)
    assert cp.efunc(1.0) == pytest.approx(1.0, abs=2e-4)


def test_hubble_matter_domination():
    cp = make_cosmo(RadiationOn=0)
    # At high z, E(a) ~ sqrt(Omega0/a^3)
    a = 0.01
    # with RadiationOn=0 the massless-nu density at a=1 is still included
    expected = np.sqrt(cp.Omega0 / a ** 3 + cp.OmegaK / a**2
                       + cp.OmegaLambda + cp.ONu.get_omega_nu(1.0))
    assert cp.efunc(a) == pytest.approx(expected, rel=1e-10)


def test_growth_factor_eds():
    """In EdS (Omega_m=1, no radiation) D(a) = a exactly."""
    cp = Cosmology(Omega0=1.0, OmegaLambda=0.0, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0)
    cp.init(TimeBegin=0.01, units=default_units())
    # GrowthFactor(astart, aend) = D(astart)/D(aend)
    gf = cp.growth_factor(0.1, 1.0)
    assert gf == pytest.approx(0.1, rel=1e-4)
    # F_Omega = dlnD/dlna = 1 in EdS
    assert cp.F_Omega(0.5) == pytest.approx(1.0, rel=1e-4)


def test_growth_factor_lcdm():
    """LCDM growth is suppressed at late times: D(1) < a-scaling."""
    cp = make_cosmo(RadiationOn=0)
    # growth between a=0.1 (matter dom) and a=1 should be < 10x
    gf = cp.growth_factor(1.0, 0.1)
    assert gf > 1.0
    assert gf < 10.0
    # LCDM: EdS would give exactly 10; Lambda suppresses to ~7.7
    assert 7.0 < gf < 8.5
    # f = dlnD/dlna ~ Omega_m(a)^0.55 at a=1
    om_a = cp.Omega0 / (cp.Omega0 + cp.OmegaLambda)
    assert cp.F_Omega(1.0) == pytest.approx(om_a ** 0.55, rel=0.02)


def test_omega_nu_massless():
    onu = OmegaNu((0.0, 0.0, 0.0), 0.01, 0.7, 2.7255)
    # massless neutrinos: Omega_nu = 7/8 (4/11)^(4/3)*Neff-ish * OmegaG
    og = onu.get_omegag(1.0) * 0.7 ** 2  # undo 1/h^2... get_omegag has no h
    onu_val = onu.get_omega_nu(1.0)
    # ratio to photons: 3 * 7/8 * TNUCMB^4
    from shenqi_tpu.utils.constants import TNUCMB
    expected_ratio = 3 * 7.0 / 8.0 * TNUCMB ** 4
    ratio = onu_val / onu.get_omegag(1.0)
    assert ratio == pytest.approx(expected_ratio, rel=1e-3)


def test_omega_nu_massive_z0():
    """Omega_nu ~ sum(m_nu)/(93.14 h^2) for non-relativistic neutrinos."""
    h = 0.7
    onu = OmegaNu((0.1, 0.1, 0.1), 0.01, h, 2.7255)
    expected = 0.3 / (93.14 * h ** 2)
    assert onu.get_omega_nu(1.0) == pytest.approx(expected, rel=5e-3)


def test_omega_nu_high_z_relativistic():
    """At very high z massive neutrinos approach the massless limit.

    At a=1e-4 a 0.05 eV species still carries a ~6% mass correction
    (a m / kT_nu ~ 0.03 but the energy integral weights low q), so the
    3-species total sits ~2% above massless; by a=1e-6 it converges.
    """
    h = 0.7
    m = OmegaNu((0.05, 0.0, 0.0), 1e-6, h, 2.7255)
    m0 = OmegaNu((0.0, 0.0, 0.0), 1e-6, h, 2.7255)
    assert (m.get_omega_nu(1e-4)
            == pytest.approx(m0.get_omega_nu(1e-4), rel=3e-2))
    assert (m.get_omega_nu(1e-6)
            == pytest.approx(m0.get_omega_nu(1e-6), rel=2e-3))
    # and the massive one is always >= massless
    assert m.get_omega_nu(1e-4) > m0.get_omega_nu(1e-4)


def test_drift_kick_factors_eds():
    """EdS closed forms: drift = int da/(H a^3), kick = int da/(H a^2).

    For H = H0 a^-1.5: drift = (2/3/H0)(a0^-1.5 - a1^-1.5)... verify
    against direct numerical integration with an independent integrator.
    """
    # CMBTemperature=0 kills photons AND massless neutrinos -> pure EdS
    cp = Cosmology(Omega0=1.0, OmegaLambda=0.0, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=0.01, units=default_units())
    h0 = cp.Hubble
    a0, a1 = 0.5, 0.6
    # H(a) = H0 a^-1.5; drift integrand a^-3/H = a^-1.5/H0
    # int a^-1.5 da = -2 a^-0.5
    exact_drift = 2.0 / h0 * (a0 ** -0.5 - a1 ** -0.5)
    assert cp.exact_drift_factor(a0, a1) == pytest.approx(exact_drift,
                                                          rel=1e-10)
    # kick integrand a^-2/H = a^-0.5/H0; int = 2 sqrt(a)
    exact_kick = 2.0 / h0 * (a1 ** 0.5 - a0 ** 0.5)
    assert cp.exact_gravkick_factor(a0, a1) == pytest.approx(exact_kick,
                                                             rel=1e-10)
    # hydrokick with gamma=5/3: integrand 1/(H a^3) == drift
    assert cp.exact_hydrokick_factor(a0, a1) == pytest.approx(exact_drift,
                                                              rel=1e-10)

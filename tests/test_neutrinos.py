"""Neutrino linear response tests (mirrors test_neutrinos_lra scope)."""

import numpy as np
import pytest

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.physics.neutrinos_lra import (specialJ, fslength,
                                              DeltaTotTable)


def make_cosmo(mnu=0.1):
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472,
                   HubbleParam=0.7, RadiationOn=1,
                   MNu=(mnu, 0.0, 0.0), MassiveNuLinRespOn=1)
    cp.init(TimeBegin=0.02, units=units)
    return cp, units


def test_specialJ_limits():
    assert specialJ(0.0) == 1.0
    assert specialJ(-1.0) == 1.0
    # decreasing, -> 0 for large arguments
    xs = np.array([0.1, 0.5, 1.0, 5.0, 50.0])
    js = specialJ(xs)
    assert np.all(np.diff(js) < 0)
    assert js[-1] < 1e-3
    # published check value: J(1) ~ 0.2406 (AB13 fit)
    assert 0.2 < specialJ(1.0) < 0.3


def test_fslength_properties():
    cp, units = make_cosmo()
    light = 2.99792458e10 / units.UnitVelocity_in_cm_per_s
    f1 = fslength(cp, np.log(0.02), np.log(0.1), light)
    f2 = fslength(cp, np.log(0.02), np.log(0.5), light)
    assert f1 > 0
    assert f2 > f1                      # longer interval, longer length
    assert fslength(cp, np.log(0.1), np.log(0.1), light) == 0


def test_delta_nu_scale_dependence():
    """Large scales: neutrinos track the CDM (J~1, delta_nu ~ delta_cdm
    at IC + growth); small scales: free-streaming suppression."""
    cp, units = make_cosmo(mnu=0.1)
    # k from very large scale to small scale (internal kpc^-1 units)
    k = np.logspace(-6, -1, 24)
    tab = DeltaTotTable.create(cp, k, time_transfer=0.02,
                               unit_time_in_s=units.UnitTime_in_s,
                               unit_velocity=units.UnitVelocity_in_cm_per_s)
    # initial delta_cdm ~ constant amplitude (shape doesn't matter here)
    d0 = np.ones_like(k)
    tab.update(0.02, d0)
    # evolve: delta_cdm grows roughly linearly in a
    for a in [0.05, 0.1, 0.2, 0.333]:
        growth = cp.growth_factor(a, 0.02)
        dnu = tab.update(a, d0 * growth)
    ratio = dnu / (d0 * growth)
    # monotone suppression toward small scales
    assert ratio[0] > 0.9            # clustered like CDM on huge scales
    assert ratio[-1] < 0.1 * ratio[0]  # heavily suppressed at high k
    assert np.all(np.diff(ratio) < 1e-6 * ratio[:-1] + 1e-12)

    # potential factor: > 1 on large scales, -> 1 at small scales
    fac = tab.potential_factor(0.333, d0 * growth)
    a = 0.333
    onu_frac = (cp.ONu.get_omega_nu_nopart(a) * a ** 3
                / (cp.Omega0 - cp.ONu.get_omega_nu(1.0)))
    assert fac[0] == pytest.approx(1 + onu_frac * ratio[0], rel=1e-6)
    assert fac[0] > fac[-1] >= 1.0


def test_delta_tot_save_load_roundtrip(tmp_path):
    """delta_nu checkpoint blocks (petaio_save_neutrinos analog,
    neutrinos_lra.cpp:267): the history must survive a snapshot
    round-trip so resume doesn't restart the response integral."""
    import os
    from shenqi_tpu.io.bigfile import BigFile

    cp, units = make_cosmo()
    k = np.logspace(-6, -2, 16)
    tab = DeltaTotTable.create(cp, k, time_transfer=0.02,
                               unit_time_in_s=units.UnitTime_in_s,
                               unit_velocity=units.UnitVelocity_in_cm_per_s)
    d0 = 1e-2 * (k / k[0]) ** -0.5
    tab.update(0.02, d0)
    for a in (0.05, 0.1, 0.2):
        tab.update(a, d0 * a / 0.02)

    snap = str(tmp_path / "SNAP")
    BigFile(snap, create=True)
    tab.save(snap)

    tab2 = DeltaTotTable.create(cp, k * 0 + 1, time_transfer=1.0,
                                unit_time_in_s=units.UnitTime_in_s,
                                unit_velocity=units.UnitVelocity_in_cm_per_s)
    assert tab2.load(snap)
    np.testing.assert_allclose(tab2.wavenum, tab.wavenum)
    np.testing.assert_allclose(tab2.delta_tot, tab.delta_tot)
    np.testing.assert_allclose(tab2.scalefact, tab.scalefact)
    assert tab2.time_transfer == pytest.approx(0.02)
    # the restored table continues evolving identically
    d_next_a = tab.update(0.25, d0 * 0.25 / 0.02)
    d_next_b = tab2.update(0.25, d0 * 0.25 / 0.02)
    np.testing.assert_allclose(d_next_a, d_next_b, rtol=1e-10)

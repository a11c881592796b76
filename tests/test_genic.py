"""IC generator tests: generated field must have the input P(k)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import InputPower
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.cic import cic_deposit
from shenqi_tpu.gravity.pm import (PMConfig, measure_power, finalize_power)
from shenqi_tpu.genic.ic import (setup_grid, gaussian_field,
                                 generate_dm_ics)

CLASS_PK = "/root/reference/examples/dm-small/class_pk_9.dat"
BOX = 64000.0  # kpc/h
NGRID = 32


def make_cosmo():
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472,
                   HubbleParam=0.7, RadiationOn=1)
    cp.init(TimeBegin=0.1, units=default_units())
    return cp


def test_setup_grid():
    pos, ids = setup_grid(4, BOX)
    assert pos.shape == (64, 3)
    assert len(np.unique(ids)) == 64
    assert ids.min() == 1
    assert pos.min() == 0
    assert pos.max() == pytest.approx(BOX * 3 / 4)


def test_gaussian_field_statistics():
    # 'fast' scheme statistics; the default 'gadget' scheme is covered
    # mode-exactly in test_gadget_field.py
    g = gaussian_field(seed=7, nmesh=32, scheme="fast")
    g = np.asarray(g)
    # mean |g|^2 = 1 over all modes
    assert np.mean(np.abs(g) ** 2) == pytest.approx(1.0, rel=0.05)
    # hermitian: DC mode is real
    assert g[0, 0, 0].imag == 0
    # unitary: all amplitudes 1 (except structurally-real modes can be +-1)
    gu = np.asarray(gaussian_field(seed=7, nmesh=32, unitary=True, scheme="fast"))
    amps = np.abs(gu)
    np.testing.assert_allclose(amps[amps > 0], 1.0, rtol=1e-5)
    # invert phase flips sign
    gi = np.asarray(gaussian_field(seed=7, nmesh=32, invert_phase=True, scheme="fast"))
    np.testing.assert_allclose(gi, -g, rtol=1e-6)


def test_ic_power_spectrum_matches_input():
    """Unitary-amplitude IC P(k) must match the input table to ~5%
    (the reference travis check asserts 1-2% on IC power at higher
    resolution; sampling/CIC effects dominate at 32^3)."""
    cp = make_cosmo()
    units = default_units()
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)
    time_ic = 0.1  # the table is already at z=9

    pos, vel, ids, mass = generate_dm_ics(
        NGRID, BOX, seed=181170, power=power, CP=cp, time_ic=time_ic,
        unitary=True)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()

    # --- exact per-mode check on the DISPLACEMENT field ---
    # (the density of displaced particles carries ~20% per-mode Zel'dovich
    # mode coupling at z=9; the displacement itself is linear and exact)
    nmesh = NGRID
    lattice, _ = setup_grid(NGRID, BOX)
    disp = (pos - lattice + BOX / 2) % BOX - BOX / 2
    g_k = np.asarray(gaussian_field(181170, nmesh, unitary=True))
    kx = np.fft.fftfreq(nmesh, 1.0 / nmesh)[:, None, None]
    ky = np.fft.fftfreq(nmesh, 1.0 / nmesh)[None, :, None]
    kz = np.arange(nmesh // 2 + 1)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    kint_mag = np.sqrt(k2)
    k_internal = kint_mag * (2 * np.pi / BOX)
    delta = power.delta_spec(k_internal)
    sel = (kint_mag >= 2) & (kint_mag <= nmesh / 4)
    for axis, kaxis in enumerate((kx, ky, kz)):
        psi = disp[:, axis].reshape(nmesh, nmesh, nmesh)
        psi_k = np.fft.rfftn(psi) / nmesh ** 3
        # expected mode coefficient of psi(x) = sum X_k e^{ikx}:
        # X_k = i (kint/k2int)/(2 pi sqrt(L)) * Delta * g  (zeldovich fac)
        expected = (1j * kaxis / np.where(k2 > 0, k2, 1)
                    / (2 * np.pi) / np.sqrt(BOX) * delta * g_k)
        num = psi_k[sel]
        den = expected[sel]
        ratio = num / np.where(np.abs(den) > 0, den, 1)
        np.testing.assert_allclose(ratio[np.abs(den) > 1e-12], 1.0,
                                   atol=0.01)

    # --- binned density P(k): unbiased at the few-percent level ---
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mesh = cic_deposit(ipos, jnp.full(len(pos), np.float32(mass)), nmesh)
    rho_k = jnp.fft.rfftn(mesh)
    cfg = PMConfig(nmesh=nmesh, boxsize=BOX, G=cp.GravInternal)
    ps = measure_power(rho_k, cfg)
    boxsize_mpc = BOX / power.mpc_scale / (BOX / power.mpc_scale) * BOX \
        * units.UnitLength_in_cm / 3.085678e24
    kk, pk_meas, nmodes = finalize_power(ps, cfg, boxsize_mpc)
    k_int = kk / power.mpc_scale
    pk_input = power.delta_spec(k_int) ** 2 / power.mpc_scale ** 3
    knyq = np.pi * NGRID / boxsize_mpc
    bsel = (kk < 0.5 * knyq) & (nmodes >= 30) & (kk > 4 * np.pi
                                                 / boxsize_mpc)
    assert bsel.sum() >= 4
    np.testing.assert_allclose(pk_meas[bsel] / pk_input[bsel], 1.0,
                               atol=0.15)


def test_velocity_prefactor():
    """Scale-independent growth: vel = a H(a) F_Omega * disp."""
    cp = make_cosmo()
    units = default_units()
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)
    time_ic = 0.1
    pos, vel, ids, mass = generate_dm_ics(
        16, BOX, seed=3, power=power, CP=cp, time_ic=time_ic, unitary=True)
    lattice, _ = setup_grid(16, BOX)
    disp = pos - lattice
    disp = (disp + BOX / 2) % BOX - BOX / 2  # unwrap
    prefac = time_ic * cp.hubble_function(time_ic) * cp.F_Omega(time_ic)
    np.testing.assert_allclose(vel, disp * prefac, rtol=1e-4, atol=1e-7)

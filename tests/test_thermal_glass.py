"""Thermal velocity sampling + glass generation tests
(test_thermal analog)."""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.genic.thermal import (FermiDiracSampler, NU_V0, WDM_V0,
                                      add_thermal_speeds)
from shenqi_tpu.genic.glass import make_glass
from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.cic import cic_deposit


def test_fermi_dirac_moments():
    """Sampled speeds have the FD mean <x> = 3.15... x v_amp."""
    sampler = FermiDiracSampler(v_amp=100.0)
    rng = np.random.RandomState(0)
    speeds = sampler.sample_speeds(rng, 200000)
    # <x> for x^2/(e^x+1): 7 pi^4/180 / (3 zeta(3)/2) ~ 3.15137
    assert speeds.mean() == pytest.approx(100.0 * 3.15137, rel=0.01)
    assert speeds.min() >= 0
    # sampler mean agrees
    assert sampler.mean_speed() == pytest.approx(100.0 * 3.15137,
                                                 rel=0.005)


def test_nu_v0_scaling():
    # 1 eV neutrino: v0 ~ 150 (1+z) km/s x T correction ~ 0.0001168c
    v = NU_V0(9.0, 1.0, 1e5)
    kt = 8.61734e-5 * ((4 / 11) ** (1 / 3) * 1.00328) * 2.7255
    expected = kt * 2.99792458e10 / 1e5 * 10
    assert v == pytest.approx(expected, rel=1e-10)
    assert NU_V0(9.0, 0.0, 1e5) == 0
    # lighter neutrinos are faster
    assert NU_V0(9.0, 0.1, 1e5) == pytest.approx(10 * v, rel=1e-10)


def test_add_thermal_isotropic():
    rng = np.random.RandomState(1)
    vel = np.zeros((50000, 3))
    out = add_thermal_speeds(vel, rng, v_amp=10.0)
    # isotropy: mean velocity ~ 0, speed dispersion per component equal
    assert np.abs(out.mean(axis=0)).max() < 0.5
    stds = out.std(axis=0)
    assert np.abs(stds / stds.mean() - 1).max() < 0.02


def test_glass_suppresses_shot_noise():
    """Glass has sub-Poisson density fluctuations vs random points."""
    ng, box = 12, 10000.0
    glass = make_glass(ng, box, seed=2, nsteps=25)
    assert glass.shape == (ng ** 3, 3)
    assert (glass >= 0).all() and (glass < box).all()

    def cell_var(pos):
        ip = jnp.asarray(float_to_ipos(pos, box))
        mesh = np.asarray(cic_deposit(
            ip, jnp.ones(len(pos), jnp.float32), ng))
        return mesh.var()

    rng = np.random.RandomState(3)
    rand = rng.uniform(0, box, (ng ** 3, 3))
    v_glass = cell_var(glass)
    v_rand = cell_var(rand)
    assert v_glass < 0.5 * v_rand

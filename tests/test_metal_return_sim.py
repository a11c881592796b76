"""Metal return + veldisp wired into the simulation state
(metal_return.cpp / veldisp2.cpp driver-level analogs)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.core.particles import STAR
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.simulation_gas import GasPhysics
from shenqi_tpu.physics.metal_return import MetalReturn

YIELD_DIR = "/root/repo/data_yields"
BOX = 20000.0
N = 6


def _cosmo(a_ic):
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=a_ic, units=default_units())
    return cp


def test_age_myr_eds():
    """EdS: t(a) = (2/3) a^1.5 / H0; check the Myr conversion."""
    cp = Cosmology(Omega0=1.0, OmegaLambda=0.0, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=0.01, units=default_units())
    from shenqi_tpu.utils.constants import HUBBLE, SEC_PER_MEGAYEAR
    h0_cgs = cp.HubbleParam * HUBBLE  # 1/s
    t_expected = (2.0 / 3.0) / h0_cgs / SEC_PER_MEGAYEAR  # age at a=1
    got = cp.age_myr(1e-8, 1.0)
    assert got == pytest.approx(t_expected, rel=1e-3)
    # additivity
    assert (cp.age_myr(0.2, 0.5) + cp.age_myr(0.5, 0.9)
            == pytest.approx(cp.age_myr(0.2, 0.9), rel=1e-8))


def _make_sim(metals, a_ic=0.5):
    cp = _cosmo(a_ic)
    rng = np.random.RandomState(0)
    ng = N ** 3
    grid = (np.arange(N) + 0.5) * (BOX / N)
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    gpos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    gpos += rng.uniform(-0.1, 0.1, gpos.shape) * (BOX / N)
    dpos = (gpos + 0.5 * BOX / N) % BOX
    vel = np.zeros((ng, 3), np.float32)
    m_gas = cp.OmegaBaryon * cp.RhoCrit * BOX ** 3 / ng
    m_dm = (cp.Omega0 - cp.OmegaBaryon) * cp.RhoCrit * BOX ** 3 / ng
    timeline = Timeline.setup([0.6], a_ic, 0.6)
    gp = GasPhysics(cooling_on=False, sfr_on=False, winds_on=False,
                    metal_return_on=True, metals=metals)
    sim = Simulation.from_species(
        [(0, gpos, vel, m_gas, np.arange(1, ng + 1)),
         (1, dpos, vel, m_dm, np.arange(ng + 1, 2 * ng + 1))],
        cp, BOX, nmesh=2 * N, timeline=timeline, atime=a_ic,
        gas_u0=100.0, gas_physics=gp)
    return sim, gp


def test_metal_return_conserves_mass():
    metals = MetalReturn.load(YIELD_DIR)
    sim, gp = _make_sim(metals)
    gas = sim.gas
    ng = gas.ngas
    p = sim.particles

    # flip 3 gas rows to old stars (born long ago, never enriched)
    idx = np.array([5, 77, 140])
    ptype = np.array(p.ptype)
    ptype[idx] = STAR
    birth = np.array(gas.birth_a)
    birth[idx] = 0.2            # ~ several Gyr before a=0.5
    m0 = np.array(gas.mass0)
    mass = np.array(p.mass)
    m0[idx] = mass[idx]
    hsml = np.array(p.hsml)
    hsml[:ng] = 2.0 * BOX / N   # plenty of gas neighbours
    sim.particles = dataclasses.replace(
        p, ptype=jnp.asarray(ptype), hsml=jnp.asarray(hsml))
    gas = dataclasses.replace(
        gas, birth_a=jnp.asarray(birth), mass0=jnp.asarray(m0),
        density=jnp.full(ng, 1e-8, jnp.float32))
    sim.gas = gas

    total_before = float(np.asarray(sim.particles.mass).sum())
    z_before = float(np.asarray(gas.metallicity).sum())

    gas2 = gp.metal_return(sim, gas)

    total_after = float(np.asarray(sim.particles.mass).sum())
    # mass moved, not created: total conserved to float tolerance
    assert total_after == pytest.approx(total_before, rel=1e-5)
    # stars lost mass
    m_after = np.asarray(sim.particles.mass)
    assert (m_after[idx] < mass[idx]).all()
    # a multi-Gyr window returns a substantial fraction (25-60%)
    lost = (mass[idx] - m_after[idx]) / m0[idx]
    assert (lost > 0.2).all() and (lost < 0.6).all()
    # gas gained metals
    assert float(np.asarray(gas2.metallicity).sum()) > z_before
    assert np.isfinite(np.asarray(gas2.metallicity)).all()
    # enrichment bookkeeping advanced
    assert (np.asarray(gas2.last_enrich_myr)[idx] > 1000).all()
    assert (np.asarray(gas2.total_returned)[idx] > 0.2).all()

    # second call immediately after: window below threshold, no-op
    m_snap = np.asarray(sim.particles.mass).copy()
    gas3 = gp.metal_return(sim, gas2)
    assert np.array_equal(np.asarray(sim.particles.mass), m_snap)
    assert np.array_equal(np.asarray(gas3.metallicity),
                          np.asarray(gas2.metallicity))


def test_metal_return_no_stars_noop():
    metals = MetalReturn.load(YIELD_DIR)
    sim, gp = _make_sim(metals)
    gas2 = gp.metal_return(sim, sim.gas)
    assert gas2 is sim.gas

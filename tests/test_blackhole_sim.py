"""BH swallowing, mergers, dynamical friction + driver-stage wiring
(blackhole.cpp / bhdynfric.cpp analogs)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos, BH, GAS
from shenqi_tpu.physics.blackhole import (
    BHParams, bh_gas_environment, bh_swallow_gas, bh_mergers,
    dynamical_friction)

BOX = 10000.0


def _cluster(rng, n, center, r):
    return (center + rng.uniform(-r, r, (n, 3))) % BOX


def test_swallow_expected_mass():
    """Expected swallowed mass closes the subgrid-dynamic gap."""
    rng = np.random.RandomState(0)
    ng = 3000
    gas_pos = _cluster(rng, ng, np.full(3, BOX / 2), 300.0)
    gas_ipos = jnp.asarray(float_to_ipos(gas_pos, BOX))
    gmass = jnp.full(ng, 0.01, jnp.float32)
    alive = jnp.ones(ng, bool)
    bh_ipos = jnp.asarray(float_to_ipos(
        np.array([[BOX / 2] * 3]), BOX))
    hsml = jnp.asarray([250.0])
    env = bh_gas_environment(bh_ipos, hsml, gas_ipos, gmass,
                             jnp.ones(ng), jnp.zeros((ng, 3)),
                             alive, BOX)
    # deficit of 0.05 = 5 gas masses
    msub = jnp.asarray([float(env.density[0]) * 0 + 0.2])
    mdyn = jnp.asarray([0.15])
    totals = []
    for seed in range(30):
        sw, gain = bh_swallow_gas(jax.random.PRNGKey(seed), bh_ipos,
                                  hsml, msub, mdyn, env, gas_ipos,
                                  gmass, alive, BOX)
        totals.append(float(gain[0]))
        sw = np.asarray(sw)
        assert ((sw == -1) | (sw == 0)).all()
    # E[gain] ~ deficit = 0.05 (kernel-weighted Monte Carlo)
    assert np.mean(totals) == pytest.approx(0.05, rel=0.4)

    # zero deficit -> no swallowing
    sw, gain = bh_swallow_gas(jax.random.PRNGKey(1), bh_ipos, hsml,
                              jnp.asarray([0.1]), jnp.asarray([0.2]),
                              env, gas_ipos, gmass, alive, BOX)
    assert float(gain[0]) == 0.0 and (np.asarray(sw) == -1).all()


def test_mergers_smaller_id_survives():
    pos = np.array([[5000., 5000, 5000],
                    [5050., 5000, 5000],     # near BH 0, slow
                    [8000., 8000, 8000]])    # far away
    vel = np.zeros((3, 3), np.float32)
    hsml = np.array([100., 100, 100], np.float32)
    msub = np.array([1e-4, 2e-4, 3e-4], np.float32)
    mdyn = np.array([1e-3, 1e-3, 1e-3], np.float32)
    ids = np.array([7, 20, 3], np.uint64)
    cs = np.array([50., 50, 50], np.float32)
    eaten, msub2, mdyn2 = bh_mergers(pos, vel, hsml, msub, mdyn, ids,
                                     1.0, cs, BOX)
    # BH 1 (id 20) eaten by BH 0 (id 7); BH 2 untouched
    assert eaten[1] == 0 and eaten[0] == -1 and eaten[2] == -1
    assert msub2[0] == pytest.approx(3e-4)
    assert mdyn2[0] == pytest.approx(2e-3)
    assert msub2[1] == 0.0

    # fast flyby does not merge
    vel2 = np.array([[0., 0, 0], [500., 0, 0], [0., 0, 0]], np.float32)
    eaten_f, _, _ = bh_mergers(pos, vel2, hsml, msub, mdyn, ids, 1.0,
                               cs, BOX)
    assert (eaten_f == -1).all()


def test_merger_chain_flattens():
    pos = np.array([[5000., 5000, 5000],
                    [5050., 5000, 5000],
                    [5100., 5000, 5000]])
    vel = np.zeros((3, 3), np.float32)
    hsml = np.full(3, 80.0, np.float32)
    msub = np.array([1e-4, 1e-4, 1e-4], np.float32)
    mdyn = np.array([1e-3, 1e-3, 1e-3], np.float32)
    ids = np.array([1, 2, 3], np.uint64)
    cs = np.full(3, 100.0, np.float32)
    eaten, msub2, mdyn2 = bh_mergers(pos, vel, hsml, msub, mdyn, ids,
                                     1.0, cs, BOX)
    # everything lands on BH 0 (smallest id); chains flattened
    assert eaten[0] == -1
    assert (eaten[1:] == 0).all()
    assert msub2[0] == pytest.approx(3e-4)
    assert mdyn2[0] == pytest.approx(3e-3)


def test_dynamical_friction_decelerates():
    vel = jnp.asarray([[200.0, 0, 0], [0, -100.0, 0]])
    rho = jnp.asarray([1e-5, 1e-5])
    sigma = jnp.asarray([80.0, 80.0])
    mbh = jnp.asarray([1e-3, 1e-3])
    a = dynamical_friction(vel, rho, sigma, mbh, atime=0.5,
                           G=43007.1)
    a = np.asarray(a)
    # opposes the motion
    assert a[0, 0] < 0 and abs(a[0, 1]) < 1e-8
    assert a[1, 1] > 0
    # deep subsonic regime (x << 1): f(x) ~ x^3, so |a| grows ~ v
    v1 = dynamical_friction(jnp.asarray([[5.0, 0, 0]]), rho[:1],
                            sigma[:1], mbh[:1], 0.5, 43007.1)
    v2 = dynamical_friction(jnp.asarray([[10.0, 0, 0]]), rho[:1],
                            sigma[:1], mbh[:1], 0.5, 43007.1)
    assert abs(float(v2[0, 0])) > abs(float(v1[0, 0]))
    # hypersonic regime (x >> 1): f -> 1, so |a| falls ~ 1/v^2
    v3 = dynamical_friction(jnp.asarray([[1000.0, 0, 0]]), rho[:1],
                            sigma[:1], mbh[:1], 0.5, 43007.1)
    v4 = dynamical_friction(jnp.asarray([[2000.0, 0, 0]]), rho[:1],
                            sigma[:1], mbh[:1], 0.5, 43007.1)
    assert abs(float(v4[0, 0])) == pytest.approx(
        abs(float(v3[0, 0])) / 4, rel=0.05)


def test_blackhole_step_integration():
    """Driver stage: accretion grows the subgrid mass, feedback heats
    nearby gas, total (gas + BH dynamic) mass is conserved."""
    from shenqi_tpu.cosmology import Cosmology
    from shenqi_tpu.utils.units import default_units
    from shenqi_tpu.core.timeline import Timeline
    from shenqi_tpu.simulation import Simulation
    from shenqi_tpu.simulation_gas import GasPhysics

    a_ic = 0.5
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=a_ic, units=default_units())
    rng = np.random.RandomState(2)
    N = 6
    ng = N ** 3
    grid = (np.arange(N) + 0.5) * (BOX / N)
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    gpos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    gpos += rng.uniform(-0.1, 0.1, gpos.shape) * (BOX / N)
    m_gas = cp.OmegaBaryon * cp.RhoCrit * BOX ** 3 / ng
    timeline = Timeline.setup([0.6], a_ic, 0.6)
    bhpar = BHParams(SeedBlackHoleMass=0.5 * m_gas,
                     HubbleParam=0.7)
    gp = GasPhysics(bh_on=True, bhpar=bhpar)
    sim = Simulation.from_species(
        [(0, gpos, np.zeros((ng, 3), np.float32), m_gas,
          np.arange(1, ng + 1)),
         (1, (gpos + 0.5 * BOX / N) % BOX,
          np.zeros((ng, 3), np.float32),
          (cp.Omega0 - cp.OmegaBaryon) * cp.RhoCrit * BOX ** 3 / ng,
          np.arange(ng + 1, 2 * ng + 1))],
        cp, BOX, nmesh=2 * N, timeline=timeline, atime=a_ic,
        gas_u0=10.0, gas_physics=gp)

    gas = sim.gas
    # give gas a plausible density + entropy state without running
    mean_rho = m_gas * ng / BOX ** 3
    gas = dataclasses.replace(
        gas, density=jnp.full(ng, mean_rho, jnp.float32),
        entropy=jnp.full(ng, 50.0, jnp.float32))
    hsml = np.array(sim.particles.hsml)
    hsml[:ng] = 1.5 * BOX / N
    sim.particles = dataclasses.replace(sim.particles,
                                        hsml=jnp.asarray(hsml))
    # seed a BH at row 0
    gas = gp.seed_bh(sim, gas, [0])
    assert int(np.asarray(sim.particles.ptype)[0]) == BH
    assert float(np.asarray(gas.bh_mass)[0]) == pytest.approx(
        bhpar.SeedBlackHoleMass, rel=1e-6)

    total_before = float(np.asarray(sim.particles.mass)[
        np.asarray(sim.particles.mask)].sum())
    ent_before = np.asarray(gas.entropy).copy()

    gas2 = gp.blackhole_step(sim, gas, dtime=0.01)

    # accretion happened
    assert float(np.asarray(gas2.bh_mdot)[0]) > 0
    assert float(np.asarray(gas2.bh_mass)[0]) > bhpar.SeedBlackHoleMass
    # feedback heated some gas, never cooled any
    dent = np.asarray(gas2.entropy) - ent_before
    alive_gas = (np.asarray(sim.particles.mask)[:ng]
                 & (np.asarray(sim.particles.ptype)[:ng] == GAS))
    assert (dent[alive_gas] >= -1e-6).all()
    assert dent[alive_gas].max() > 0
    # dynamic mass conservation: swallowed gas mass moved to the BH
    total_after = float(np.asarray(sim.particles.mass)[
        np.asarray(sim.particles.mask)].sum())
    assert total_after == pytest.approx(total_before, rel=1e-5)

"""Slot GC: dead-row reuse + capacity growth + shrink compaction.

The reference sustains long SF+BH runs through slots_gc reclamation
and SlotsIncreaseFactor growth (slotsmanager.cpp:133,419; run.cpp:236).
The TPU analog: star splits reuse ANY dead row (including BH-swallowed
gas inside the prefix) before growing the fixed shapes, and slots_gc
shrinks the spare tail at snapshot cadence — so thousands of
spawn/swallow steps keep the dead-row fraction and the array length
bounded.
"""

import dataclasses
from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.simulation_gas import GasPhysics
from shenqi_tpu.cosmology.background import Cosmology
from shenqi_tpu.utils.units import get_unitsystem


def _mk_sim(ngas=256, headroom=64):
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, CMBTemperature=2.7255,
                   RadiationOn=1)
    cp.init(0.1, units)
    rng = np.random.RandomState(0)
    box = 1000.0
    pos = rng.uniform(0, box, (ngas, 3))
    vel = np.zeros((ngas, 3), np.float32)
    mass = np.full(ngas, 1.0, np.float32)
    ids = np.arange(1, ngas + 1, dtype=np.uint64)
    timeline = Timeline.setup([0.5], 0.1, 0.5, 0.0, False)
    sim = Simulation.from_species(
        [(0, pos, vel, mass, ids)], cp, box, 16, timeline, 0.1,
        gas_u0=100.0, gas_physics=GasPhysics(sfr_on=True),
        star_headroom=headroom)
    return sim


def _spawn(gp, sim, rows, frac=0.3):
    """Fabricate a split-spawn star-formation result on `rows`."""
    n = sim.gas.ngas
    form = np.zeros(n, bool)
    form[rows] = True
    mstar = np.zeros(n, np.float32)
    mstar[rows] = frac * np.asarray(sim.particles.mass[:n])[rows]
    res = SimpleNamespace(
        form_star=jnp.asarray(form),
        convert_whole=jnp.zeros(n, bool),
        mass_of_star=jnp.asarray(mstar))
    return gp._convert_stars(sim, sim.gas, res, 0.1)


def test_dead_row_reuse_and_bounded_growth():
    sim = _mk_sim()
    gp = sim.gas_physics
    rng = np.random.RandomState(1)
    ngas = sim.gas.ngas
    n0 = sim.particles.n

    total_spawned = 0
    total_killed = 0
    for cycle in range(40):
        # kill a few gas rows (BH swallowing analog)
        mask = np.array(sim.particles.mask)
        ptype = np.asarray(sim.particles.ptype)
        gas_alive = np.nonzero(mask[:ngas] & (ptype[:ngas] == 0))[0]
        kill = rng.choice(gas_alive, 4, replace=False)
        mask[kill] = False
        sim.particles = dataclasses.replace(
            sim.particles, mask=jnp.asarray(mask))
        total_killed += len(kill)
        # spawn stars from other gas rows
        mask_h = np.array(sim.particles.mask)
        cand = np.nonzero(mask_h[:ngas] & (ptype[:ngas] == 0))[0]
        rows = rng.choice(cand, 4, replace=False)
        total_spawned += _spawn(gp, sim, rows)

    p = sim.particles
    mask = np.asarray(p.mask)
    alive = int(mask.sum())
    assert alive == 256 - total_killed + total_spawned
    # dead-row reuse keeps the shape bounded by live + slack, far
    # below "every spawn appends a row"
    dead_frac = 1.0 - alive / p.n
    assert dead_frac < 0.35, f"dead fraction {dead_frac:.2f}"
    assert p.n <= n0 + 256, f"array grew to {p.n} from {n0}"
    # ids of live rows stay unique
    ids = np.asarray(p.ids64())[mask]
    assert len(np.unique(ids)) == len(ids)
    # spawned stars carry birth data; reused rows carry no stale SFR
    star = mask & (np.asarray(p.ptype) == 4)
    assert int(star.sum()) == total_spawned
    assert np.all(np.asarray(sim.gas.birth_a)[star] > 0)
    sfr = np.asarray(sim.gas.sfr)
    assert np.all(sfr[star[:ngas]] == 0.0)


def test_slots_gc_shrinks_spare_tail():
    sim = _mk_sim(ngas=256, headroom=64)
    gp = sim.gas_physics
    # force a growth burst: spawn many stars at once
    rng = np.random.RandomState(2)
    ngas = sim.gas.ngas
    for _ in range(3):
        mask_h = np.array(sim.particles.mask)
        ptype = np.asarray(sim.particles.ptype)
        cand = np.nonzero(mask_h[:ngas] & (ptype[:ngas] == 0))[0]
        _spawn(gp, sim, rng.choice(cand, 48, replace=False),
               frac=0.05)
    grown_n = sim.particles.n
    # kill the spawned stars' parents won't shrink; instead kill the
    # stars is unphysical — emulate a post-burst state by masking the
    # top spare rows dead and compacting
    mask = np.array(sim.particles.mask)
    nreal = sim.n_real
    star_rows = np.nonzero(mask[nreal:])[0] + nreal
    mask[star_rows[len(star_rows) // 4:]] = False
    sim.particles = dataclasses.replace(sim.particles,
                                        mask=jnp.asarray(mask))
    gp.slots_gc(sim, sim.gas)
    assert sim.particles.n <= grown_n
    # invariants hold after the cut
    assert sim.gas.birth_a.shape[0] == sim.particles.n
    alive = np.asarray(sim.particles.mask)
    assert int(alive.sum()) == int(mask.sum())

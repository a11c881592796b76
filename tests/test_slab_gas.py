"""Distributed gas (SPH) in the slab product loop vs single-device.

The reference's main loop runs density+hydro distributed through the
treewalk engine (run.cpp:482-505); SlabSimulation.from_species runs
them through the ghost-halo slab passes.  On identical ICs the
8-virtual-device run must track the single-device Simulation.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from shenqi_tpu.core.integrate import TimestepParams
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.simulation_gas import GasPhysics
from shenqi_tpu.parallel.slab_sim import SlabSimulation
from shenqi_tpu.parallel.sharded import make_mesh
from tests.test_slab_sim import _cosmo, BOX, NMESH


def _gas_dm_ics(ng=8, seed=3):
    rng = np.random.RandomState(seed)
    grid = (np.arange(ng) + 0.5) * BOX / ng
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    lat = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    n = len(lat)
    # gentle displacements: smooth adiabatic flow, no shocks
    pos_g = (lat + rng.normal(0, BOX / 60, lat.shape)) % BOX
    pos_d = ((lat + 0.5 * BOX / ng)
             + rng.normal(0, BOX / 60, lat.shape)) % BOX
    vel_g = rng.normal(0, 2.0, lat.shape).astype(np.float32)
    vel_d = rng.normal(0, 2.0, lat.shape).astype(np.float32)
    ids_g = np.arange(1, n + 1, dtype=np.uint64)
    ids_d = np.arange(n + 1, 2 * n + 1, dtype=np.uint64)
    return (pos_g, vel_g, ids_g), (pos_d, vel_d, ids_d), n


def test_slab_gas_matches_single_device():
    cp = _cosmo()
    a0, a1 = 0.1, 0.115
    (pg, vg, ig), (pd, vd, idd), n = _gas_dm_ics()
    m_g, m_d = 0.4, 1.6
    u0 = 100.0

    tl1 = Timeline.setup([a1], a0, a1)
    sim1 = Simulation.from_species(
        [(0, pg, vg, m_g, ig), (1, pd, vd, m_d, idd)],
        cp, BOX, NMESH, tl1, a0, gas_u0=u0,
        tsp=TimestepParams(),
        gravity_kw={"engine": "refined"},
        gas_physics=GasPhysics(cooling_on=False, sfr_on=False,
                               winds_on=False))
    sim1.run(max_steps=12)

    tl2 = Timeline.setup([a1], a0, a1)
    mesh = make_mesh(8)
    sim2 = SlabSimulation.from_species(
        mesh, [(0, pg, vg, m_g, ig), (1, pd, vd, m_d, idd)],
        cp, BOX, NMESH, tl2, a0, gas_u0=u0, tsp=TimestepParams())
    sim2.run(max_steps=12)

    assert sim2.times.ti_current == sim1.times.ti_current

    g = sim2.gather_alive()
    order2 = np.argsort(g["id"])
    ids1 = np.concatenate([ig, idd])
    order1 = np.argsort(ids1)
    np.testing.assert_array_equal(g["id"][order2], ids1[order1])

    gas_rows2 = g["ptyp"][order2] == 0
    assert gas_rows2.sum() == n

    # single-device gas state (gas rows are the array prefix)
    ngas = sim1.gas.ngas
    ent1 = np.asarray(sim1.gas.entropy)
    rho1 = np.asarray(sim1.gas.density)
    hs1 = np.asarray(sim1.particles.hsml)[:ngas]
    ids1_gas = np.asarray(sim1.particles.ids)[:ngas] \
        if hasattr(sim1.particles, "ids") else ig
    o1g = np.argsort(ids1_gas)

    ent2 = g["entropy"][order2][gas_rows2]
    rho2 = g["density"][order2][gas_rows2]
    hs2 = g["hsml"][order2][gas_rows2]
    # matched by id: order2 gas rows are sorted by id and gas ids are
    # the first block of the sorted id space
    e1 = ent1[o1g]
    r1 = rho1[o1g]
    h1 = hs1[o1g]

    # smooth adiabatic flow: engines differ (stencil vs slab blocked
    # walks) only in fp ordering; trajectories must track closely
    assert np.isfinite(ent2).all() and (ent2 > 0).all()
    # the entropy-init fixed points run different engines (stencil vs
    # slab blocked walk) — median agreement to a few tenths of a
    # percent is the expected envelope
    np.testing.assert_allclose(np.median(ent2), np.median(e1),
                               rtol=5e-3)
    ok_rho = np.isclose(rho2, r1, rtol=2e-2).mean()
    assert ok_rho > 0.95, ok_rho
    # converged hsml is non-unique inside the +-ngb_deviation band
    # (~2% in h at 33 neighbours); different engines land on
    # different h within it
    ok_h = np.isclose(hs2, h1, rtol=4e-2).mean()
    assert ok_h > 0.95, ok_h
    ok_e = np.isclose(ent2, e1, rtol=1e-2).mean()
    assert ok_e > 0.95, ok_e

    # velocities: compare full particle set
    v1 = np.asarray(sim1.particles.vel)[
        np.asarray(sim1.particles.mask)]
    ids1_all = ids1  # from_species concat order = gas then dm
    # rebuild single-device id order
    o1 = np.argsort(ids1_all)
    v2 = g["vel"][order2]
    vscale = np.abs(v1).max()
    dv = np.linalg.norm(v2 - v1[o1], axis=1)
    assert np.percentile(dv, 95) < 2e-2 * vscale + 1e-5, \
        np.percentile(dv, 95)

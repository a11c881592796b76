"""Distributed subgrid sources in the slab loop vs single-device.

Cooling and whole-conversion star formation are elementwise
per-particle work (sfr_eff.cpp:200-330), so the slab versions must
track the single-device GasPhysics source terms on identical ICs.
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
from shenqi_tpu.physics.cooling_rates import CoolingParams, TreeCool
from shenqi_tpu.physics.sfr import CoolingUnits
from shenqi_tpu.utils.units import get_unitsystem
from tests.test_slab_gas import _gas_dm_ics
from tests.test_slab_sim import _cosmo, BOX, NMESH

TREECOOL = "/root/reference/examples/TREECOOL_ep_2018p"


def test_slab_cooling_matches_single_device():
    cp = _cosmo()
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    a0, a1 = 0.1, 0.112
    (pg, vg, ig), (pd, vd, idd), n = _gas_dm_ics(ng=8, seed=5)
    m_g, m_d = 0.4, 1.6
    u0 = 4000.0          # warm gas: cooling must act

    coolpar = CoolingParams(fBar=cp.OmegaBaryon
                            / max(cp.Omega0 - cp.OmegaBaryon, 1e-10))
    treecool = TreeCool(TREECOOL)
    cu = CoolingUnits.create(units, cp.HubbleParam)

    gp = GasPhysics(cooling_on=True, sfr_on=False, winds_on=False,
                    coolpar=coolpar, treecool=treecool, coolunits=cu)
    tl1 = Timeline.setup([a1], a0, a1)
    sim1 = Simulation.from_species(
        [(0, pg, vg, m_g, ig), (1, pd, vd, m_d, idd)],
        cp, BOX, NMESH, tl1, a0, gas_u0=u0, tsp=TimestepParams(),
        gravity_kw={"engine": "refined"}, gas_physics=gp)
    sim1.run(max_steps=10)

    tl2 = Timeline.setup([a1], a0, a1)
    mesh = make_mesh(8)
    sim2 = SlabSimulation.from_species(
        mesh, [(0, pg, vg, m_g, ig), (1, pd, vd, m_d, idd)],
        cp, BOX, NMESH, tl2, a0, gas_u0=u0, tsp=TimestepParams())
    sim2.cooling_on = True
    sim2.coolpar = coolpar
    sim2.treecool = treecool
    sim2.coolunits = cu
    sim2.run(max_steps=10)

    assert sim2.times.ti_current == sim1.times.ti_current
    g = sim2.gather_alive()
    order2 = np.argsort(g["id"])
    gasr = g["ptyp"][order2] == 0
    ent2 = g["entropy"][order2][gasr]
    ne2 = g["ne"][order2][gasr]

    ent1 = np.asarray(sim1.gas.entropy)[np.argsort(ig)]
    ne1 = np.asarray(sim1.gas.ne)[np.argsort(ig)]

    assert np.isfinite(ent2).all() and (ent2 > 0).all()
    # cooling must actually have changed the state (not a no-op)
    assert not np.allclose(ent2, ent2[0] * np.ones_like(ent2))
    ok_e = np.isclose(ent2, ent1, rtol=2e-2).mean()
    assert ok_e > 0.95, ok_e
    ok_ne = np.isclose(ne2, ne1, rtol=2e-2, atol=1e-4).mean()
    assert ok_ne > 0.95, ok_ne

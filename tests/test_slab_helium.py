"""Distributed QSO helium reionization on the slab loop.

The bubble application is elementwise on the sharded rows with
host-sequential QSO picks seeded by the integer timeline
(cooling_qso_lightup.cpp turn_on_quasars; slab_sim.helium_step), so a
1-device and an 8-device run must ionize the SAME particles and add
the SAME entropy, aligned by 64-bit id.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from shenqi_tpu.core.integrate import TimestepParams
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.parallel.slab_sim import SlabSimulation
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.physics.helium_reion import (HeliumReion,
                                             QSOLightupParams)
from shenqi_tpu.physics.sfr import CoolingUnits
from shenqi_tpu.utils.units import get_unitsystem
from tests.test_slab_gas import _gas_dm_ics
from tests.test_slab_sim import _cosmo, BOX, NMESH

HEII_TABLE = "/root/reference/examples/HeIIReionizationTable"


def _mk_helium():
    return HeliumReion.load(HEII_TABLE, QSOLightupParams(
        qso_candidate_min_mass=1e-6, qso_candidate_max_mass=1e8,
        mean_bubble=0.3 * BOX, var_bubble=1.0,
        heIIIreion_finish_frac=0.95))


def test_slab_helium_device_count_invariant():
    cp = _cosmo()
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    # mid-reionization epoch (z ~ 3.2)
    a0 = 1.0 / (1.0 + 3.2)
    he_probe = _mk_helium()
    assert 0.05 < he_probe.desired_ion_frac(a0) < 0.95
    (pg, vg, ig), (pd, vd, idd), n = _gas_dm_ics(ng=8, seed=21)
    m_g, m_d = 1e-3, 4e-3
    cu = CoolingUnits.create(units, cp.HubbleParam)
    # two candidate halos, one off-center
    gm = np.array([50.0, 80.0])
    gcm = np.array([[0.25 * BOX] * 3, [0.7 * BOX] * 3])

    out = {}
    for ndev in (1, 8):
        tl = Timeline.setup([a0 * 1.04], a0, a0 * 1.04)
        sim = SlabSimulation.from_species(
            make_mesh(ndev), [(0, pg, vg, m_g, ig),
                              (1, pd, vd, m_d, idd)],
            cp, BOX, NMESH, tl, a0, gas_u0=100.0,
            tsp=TimestepParams())
        sim.helium = _mk_helium()
        sim.coolunits = cu
        f = sim.fields
        is_gas = (f["ptyp"] == 0) & (f["mass"] > 0)
        f["density"] = jnp.where(is_gas, 1e-8, 0.0)
        nion = sim.helium_step(gm, gcm)
        assert nion and nion > 0
        g = sim.gather_alive()
        o = np.argsort(g["id"])
        out[ndev] = {k: v[o] for k, v in g.items()}

    a, b = out[1], out[8]
    np.testing.assert_array_equal(a["id"], b["id"])
    np.testing.assert_array_equal(a["heiii"], b["heiii"])
    np.testing.assert_allclose(a["entropy"], b["entropy"],
                               rtol=1e-6, atol=1e-10)
    h = a["heiii"].astype(bool)
    assert h.any() and not h.all()
    # ionized gas got heated; everything else untouched
    assert (a["entropy"][h] > 100.0).all()
    gas_rows = a["ptyp"] == 0
    np.testing.assert_allclose(a["entropy"][gas_rows & ~h], 100.0,
                               rtol=1e-5)
    # only gas rows flagged
    assert not a["heiii"][~gas_rows].any()


def test_slab_helium_flash_finish():
    """Past the finish fraction every remaining gas row flash-ionizes
    (turn_on_quasars finish branch)."""
    cp = _cosmo()
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    he = _mk_helium()
    a_late = 1.0 / (1.0 + 2.85)
    assert he.desired_ion_frac(a_late) > 0.95
    (pg, vg, ig), (pd, vd, idd), n = _gas_dm_ics(ng=6, seed=22)
    tl = Timeline.setup([a_late * 1.04], a_late, a_late * 1.04)
    sim = SlabSimulation.from_species(
        make_mesh(4), [(0, pg, vg, 1e-3, ig),
                       (1, pd, vd, 4e-3, idd)],
        cp, BOX, NMESH, tl, a_late, gas_u0=100.0,
        tsp=TimestepParams())
    sim.helium = he
    sim.coolunits = CoolingUnits.create(units, cp.HubbleParam)
    f = sim.fields
    is_gas = (f["ptyp"] == 0) & (f["mass"] > 0)
    f["density"] = jnp.where(is_gas, 1e-8, 0.0)
    nion = sim.helium_step(np.zeros(0), np.zeros((0, 3)))
    g = sim.gather_alive()
    gas_rows = g["ptyp"] == 0
    assert nion == int(gas_rows.sum())
    assert g["heiii"][gas_rows].all()

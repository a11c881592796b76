"""Full TreePM simulation with individual timesteps: dm-small-like run.

The analog of the reference dm-small example check: evolve z=9 -> z=4
and verify P(k) growth on large scales + sensible small-scale behavior.
"""

import numpy as np
import pytest

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import InputPower
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.genic.ic import generate_dm_ics
from shenqi_tpu.simulation import Simulation

CLASS_PK = "/root/reference/examples/dm-small/class_pk_9.dat"
BOX = 64000.0
NGRID = 16


@pytest.mark.slow
def test_treepm_simulation_growth():
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472,
                   HubbleParam=0.7, RadiationOn=1)
    a_ic, a_end = 0.1, 0.15
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)

    pos, vel, ids, mass = generate_dm_ics(
        NGRID, BOX, seed=181170, power=power, CP=cp, time_ic=a_ic,
        unitary=True, use_peculiar=True)
    vel_int = vel * a_ic

    timeline = Timeline.setup([a_end], a_ic, a_end)
    sim = Simulation.from_arrays(pos, vel_int, mass, ids, cp, BOX,
                                 nmesh=2 * NGRID, timeline=timeline,
                                 atime=a_ic)
    sim.run(max_steps=400)
    assert sim.atime() == pytest.approx(a_end, rel=1e-3)
    assert len(sim.snapshots) == 1

    a0, k0, p0, n0 = sim.power_history[0]
    a1, k1, p1, n1 = sim.power_history[-1]
    assert a0 == pytest.approx(a_ic, rel=1e-3)
    assert a1 == pytest.approx(a_end, rel=0.05)

    growth = cp.growth_factor(a1, a0)
    mpc = 3.085678e24 / units.UnitLength_in_cm
    boxsize_mpc = BOX / mpc
    knyq = np.pi * NGRID / boxsize_mpc
    sel = (k0 > 1.4 * 2 * np.pi / boxsize_mpc) & (k0 < 0.4 * knyq)
    ratio = p1[sel] / p0[sel] / growth ** 2
    wmean = np.sum(ratio * n0[sel]) / np.sum(n0[sel])
    # TreePM with individual timesteps: linear growth on large scales
    assert wmean == pytest.approx(1.0, abs=0.05)
    # small scales stay near linear at these amplitudes; no runaway
    # suppression or growth (threshold allows the ~0.2% mean force
    # difference between the blocked and per-particle engines,
    # which shifts marginal high-k bins by ~1% over 40 steps)
    sel_nl = (k0 > 0.5 * knyq) & (k0 < 0.9 * knyq) & (n0 > 100)
    ratio_nl = (p1[sel_nl] / p0[sel_nl] / growth ** 2)
    assert 0.95 < np.mean(ratio_nl) < 1.3

    # individual timesteps actually used (not all particles in one bin)
    tb = np.asarray(sim.particles.timebin)[np.asarray(
        sim.particles.mask)]
    assert tb.min() >= 1
    assert sim.step_count > 3


def test_kick_times_stay_synchronized():
    """Ti_kick must advance dti/2 at BOTH half-kicks (run.cpp:578 +
    809): with only one advance per step it lags ti_current by half
    the elapsed time and the predictor intervals [Ti_kick, ti] grow
    without bound — EntVarPred/VelPred then explode on deep-timebin
    gas (the star-small a=0.111 entropy fireball, root-caused round
    4).  After any number of steps every occupied bin's kick time
    sits within half its bin period of the current time."""
    from shenqi_tpu.core.timeline import dti_from_timebin
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712,
                   OmegaBaryon=0.0472, HubbleParam=0.7, RadiationOn=1)
    a_ic = 0.1
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)
    pos, vel, ids, mass = generate_dm_ics(
        12, BOX, seed=181170, power=power, CP=cp, time_ic=a_ic,
        unitary=True, use_peculiar=True)
    timeline = Timeline.setup([0.14], a_ic, 0.14)
    sim = Simulation.from_arrays(pos, vel * a_ic, mass, ids, cp, BOX,
                                 nmesh=24, timeline=timeline,
                                 atime=a_ic)
    sim.run(max_steps=25)
    times = sim.times
    tb = np.asarray(sim.particles.timebin)[
        np.asarray(sim.particles.mask)]
    assert sim.step_count >= 10
    for b in np.unique(tb):
        lag = times.ti_current - times.ti_kick[int(b)]
        assert 0 <= lag <= dti_from_timebin(int(b)) // 2, (
            f"bin {b}: Ti_kick lags ti by {lag} "
            f"(> half period {dti_from_timebin(int(b)) // 2})")

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

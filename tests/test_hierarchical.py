"""Hierarchical (split) gravity timesteps: the Gadget-4
momentum-conserving active-source scheme (timestep.cpp:247-566)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import InputPower
from shenqi_tpu.utils.units import default_units
from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.genic.ic import generate_dm_ics
from shenqi_tpu.simulation import Simulation

CLASS_PK = "/root/reference/examples/dm-small/class_pk_9.dat"
BOX = 64000.0
NGRID = 12


def _run(hierarchical, a_ic=0.1, a_end=0.13):
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712,
                   OmegaBaryon=0.0472, HubbleParam=0.7, RadiationOn=1)
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(CLASS_PK, cp, units.UnitLength_in_cm)
    pos, vel, ids, mass = generate_dm_ics(
        NGRID, BOX, seed=181170, power=power, CP=cp, time_ic=a_ic,
        unitary=True, use_peculiar=True)
    timeline = Timeline.setup([a_end], a_ic, a_end)
    sim = Simulation.from_arrays(pos, vel * a_ic, mass, ids, cp, BOX,
                                 nmesh=2 * NGRID, timeline=timeline,
                                 atime=a_ic)
    sim.hierarchical = hierarchical
    sim.run(max_steps=200)
    return sim


def test_hierarchical_matches_standard():
    """Both schemes evolve the same ICs to the same time; positions
    agree closely (the schemes differ only in sub-bin force sources,
    a higher-order effect at these amplitudes)."""
    std = _run(False)
    hier = _run(True)
    assert hier.atime() == pytest.approx(std.atime(), rel=1e-6)

    from shenqi_tpu.core.particles import ipos_to_float
    p_std = np.asarray(ipos_to_float(std.particles.ipos, BOX))
    p_h = np.asarray(ipos_to_float(hier.particles.ipos, BOX))
    msk = np.asarray(std.particles.mask)
    d = p_std[msk] - p_h[msk]
    d -= BOX * np.round(d / BOX)
    disp = np.linalg.norm(d, axis=1)
    sep = BOX / NGRID
    # same trajectory to a small fraction of the mean separation
    assert np.median(disp) < 0.02 * sep
    assert disp.max() < 0.3 * sep

    v_std = np.asarray(std.particles.vel)[msk]
    v_h = np.asarray(hier.particles.vel)[msk]
    vs = np.linalg.norm(v_std, axis=1)
    assert np.isfinite(v_h).all()
    dv = np.linalg.norm(v_std - v_h, axis=1)
    assert np.median(dv) < 0.1 * np.median(vs) + 1e-3

    # hierarchical run used multiple bins at some point (the scheme
    # actually engaged) OR everything stayed synchronous (also fine);
    # either way the bookkeeping must be consistent
    tb = np.asarray(hier.particles.timebin)[msk]
    assert tb.min() >= 1
    assert hier.times.mintimebin <= hier.times.maxtimebin


def test_hierarchical_momentum_drift_bounded():
    """Total momentum drift over the run stays small (the
    active-source kicks are pairwise-consistent per level)."""
    hier = _run(True)
    msk = np.asarray(hier.particles.mask)
    m = np.asarray(hier.particles.mass)[msk]
    v = np.asarray(hier.particles.vel)[msk]
    ptot = (m[:, None] * v).sum(axis=0)
    # ICs have zero net momentum; tree approximation leaves a residual
    prms = np.abs(m[:, None] * v).sum(axis=0)
    assert np.all(np.abs(ptot) < 5e-3 * prms + 1e-8)

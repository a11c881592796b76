"""SlabSimulation: the multi-chip main loop vs single-device.

The distributed product path (parallel/slab_sim.py + cli --mesh) must
reproduce the single-device Simulation's trajectories: same KDK +
individual-timebin protocol, forces equal to f32 tolerance (the
reference's analogous oracle is runtests.cpp run_consistency_test —
new engine vs old engine on the same state).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.core.integrate import TimestepParams
from shenqi_tpu.simulation import Simulation
from shenqi_tpu.parallel.slab_sim import SlabSimulation
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.cosmology.background import Cosmology
from shenqi_tpu.utils.units import get_unitsystem


BOX = 1000.0
NMESH = 16


def _cosmo():
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, CMBTemperature=2.7255,
                   RadiationOn=1)
    cp.init(0.1, units)
    return cp


def _ics(n=4096, seed=0):
    rng = np.random.RandomState(seed)
    # mildly clustered: half uniform, half in gaussian clumps
    nu = n // 2
    pos_u = rng.uniform(0, BOX, (nu, 3))
    ncl = 8
    cc = rng.uniform(0, BOX, (ncl, 3))
    which = rng.randint(0, ncl, n - nu)
    pos_c = (cc[which] + rng.normal(0, BOX / 40, (n - nu, 3))) % BOX
    pos = np.concatenate([pos_u, pos_c])
    vel = rng.normal(0, 5.0, (n, 3)).astype(np.float32)
    mass = np.full(n, 1.0, np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    return pos, vel, mass, ids


def _mk_single(pos, vel, mass, ids, cp, timeline, atime):
    # default engine (stencil) on both sides so the trajectory parity
    # compares identical force schedules
    return Simulation.from_arrays(
        pos, vel, mass, ids, cp, BOX, NMESH, timeline, atime,
        tsp=TimestepParams())


def _mk_slab(pos, vel, mass, ids, cp, timeline, atime):
    mesh = make_mesh(8)
    return SlabSimulation.from_arrays(
        mesh, pos, vel, mass, ids, cp, BOX, NMESH, timeline, atime,
        tsp=TimestepParams())


@pytest.mark.slow
def test_slab_sim_matches_single_device():
    cp = _cosmo()
    atime = 0.1
    timeline = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    pos, vel, mass, ids = _ics()

    sim1 = _mk_single(pos, vel, mass, ids, cp, timeline, atime)
    sim1.run(max_steps=4)

    timeline2 = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    sim2 = _mk_slab(pos, vel, mass, ids, cp, timeline2, atime)
    sim2.run(max_steps=4)

    assert sim2.step_count == sim1.step_count
    assert sim2.times.ti_current == sim1.times.ti_current

    # gather the slab state and align by particle id
    g = sim2.gather_alive()
    assert len(g["id"]) == len(ids)
    o2 = np.argsort(g["id"])
    p1 = sim1.particles
    ids1 = np.asarray(p1.ids64())
    alive1 = np.asarray(p1.mask)
    o1 = np.argsort(ids1[alive1])

    ip1 = np.asarray(p1.ipos)[alive1][o1].astype(np.int64)
    ip2 = g["ipos"][o2].astype(np.int64)
    dpos = np.abs(ip1 - ip2)
    dpos = np.minimum(dpos, 2 ** 32 - dpos)  # periodic wrap
    # < 2e-5 of the box after 4 steps (f32 force-summation order)
    assert np.max(dpos) < 2e-5 * 2 ** 32, np.max(dpos)

    v1 = np.asarray(p1.vel)[alive1][o1]
    v2 = g["vel"][o2]
    vscale = np.median(np.abs(v1)) + 1e-6
    dv = np.max(np.abs(v1 - v2), axis=1)
    # knife-edge timebin flips (f32 accel noise at a bin boundary)
    # give individual particles a different kick factor for a step —
    # allow a rare tail, bound the bulk tightly
    outlier = dv > 2e-3 * vscale + 1e-4
    assert np.mean(outlier) < 5e-3, (
        f"{outlier.sum()} velocity outliers of {len(dv)}")
    assert np.percentile(dv, 99) < 2e-3 * vscale + 1e-4

    tb1 = np.asarray(p1.timebin)[alive1][o1].astype(np.int32)
    tb2 = g["tbin"][o2].astype(np.int32)
    # timebin knife-edge flips are possible but must be rare
    assert np.mean(tb1 != tb2) < 0.01


@pytest.mark.slow
def test_slab_sim_pm_power_matches():
    """The pencil P(k) recorded by the slab loop must equal the
    single-device PM measurement on the same state."""
    cp = _cosmo()
    atime = 0.1
    timeline = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    pos, vel, mass, ids = _ics(seed=3)

    sim1 = _mk_single(pos, vel, mass, ids, cp, timeline, atime)
    sim1.run(max_steps=1)
    timeline2 = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    sim2 = _mk_slab(pos, vel, mass, ids, cp, timeline2, atime)
    sim2.run(max_steps=1)

    a1, kk1, pk1, nm1 = sim1.power_history[0]
    a2, kk2, pk2, nm2 = sim2.power_history[0]
    assert np.allclose(kk1, kk2, rtol=1e-5)
    assert np.allclose(nm1, nm2)
    assert np.allclose(pk1, pk2, rtol=2e-4, atol=1e-12)


def test_slab_random_offset_roundtrip():
    """_apply_random_offset is exact in uint32: output_ipos inverts
    the internal shift losslessly, redraws subtract the old shift
    before adding the new, and draws are keyed by the integer
    timeline (device-count and single/slab invariant)."""
    import jax
    from shenqi_tpu.core.integrate import TimestepParams
    from shenqi_tpu.core.particles import float_to_ipos
    from shenqi_tpu.parallel.slab_sim import SlabSimulation
    from shenqi_tpu.parallel.sharded import make_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cp = _cosmo()
    rng = np.random.RandomState(3)
    n = 512
    pos = rng.uniform(0, BOX, (n, 3))
    vel = np.zeros((n, 3), np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    tl = Timeline.setup([0.52], 0.5, 0.52)
    sims = {}
    for ndev in (1, 8):
        sim = SlabSimulation.from_arrays(
            make_mesh(ndev), pos, vel, np.ones(n, np.float32), ids,
            cp, BOX, NMESH, tl, 0.5, tsp=TimestepParams())
        sim.random_offset_frac = 8.0 / NMESH
        before = {int(i): p for i, p in zip(
            np.asarray(sim.fields["id_lo"]),
            np.asarray(sim.fields["ipos"]))}
        sim._apply_random_offset()
        assert sim._offset_u32 is not None and (
            sim._offset_u32 != 0).any()
        sim._apply_random_offset()       # idempotent at fixed ti
        after = {int(i): p for i, p in zip(
            np.asarray(sim.fields["id_lo"]),
            np.asarray(sim.fields["output_ipos"]
                       if "output_ipos" in sim.fields
                       else sim.output_ipos()))}
        for i, p in before.items():
            if i == 0:
                continue
            np.testing.assert_array_equal(p, after[i])
        sims[ndev] = sim
    # draws keyed by ti: same offset on 1 and 8 devices
    np.testing.assert_array_equal(sims[1]._offset_u32,
                                  sims[8]._offset_u32)

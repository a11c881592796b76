"""Stencil gravity on the slab domain vs the single-device engine.

The round-3 production engine (gravity/stencil.py — exact P2P inside
rcut, no octree) must produce the same forces when distributed over
the 8-device slab mesh: sources = local + rcut ghosts, targets =
local alive rows, one fused device program with static caps
(parallel/sharded.py stencil_forces_slab).  Reference analog: every
physics module distributed for free through the treewalk engine
(libgadget/treewalk2.h:307-362); here the parity is engine-vs-engine
on identical state (runtests.cpp run_consistency_test strategy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from shenqi_tpu.core.timeline import Timeline
from shenqi_tpu.core.integrate import TimestepParams
from shenqi_tpu.parallel.slab_sim import SlabSimulation
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.cosmology.background import Cosmology
from shenqi_tpu.utils.units import get_unitsystem
from shenqi_tpu.gravity.stencil import stencilgrav

BOX = 1000.0
NMESH = 16


def _cosmo():
    units = get_unitsystem(3.085678e21, 1.989e43, 1e5)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, CMBTemperature=2.7255,
                   RadiationOn=1)
    cp.init(0.1, units)
    return cp


def _clustered(n=4096, seed=0):
    rng = np.random.RandomState(seed)
    nu = n // 2
    pos_u = rng.uniform(0, BOX, (nu, 3))
    cc = rng.uniform(0, BOX, (8, 3))
    which = rng.randint(0, 8, n - nu)
    pos_c = (cc[which] + rng.normal(0, BOX / 40, (n - nu, 3))) % BOX
    pos = np.concatenate([pos_u, pos_c])
    vel = rng.normal(0, 5.0, (n, 3)).astype(np.float32)
    mass = np.full(n, 1.0, np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    return pos, vel, mass, ids


def test_stencil_slab_forces_match_single_device():
    cp = _cosmo()
    atime = 0.1
    tl = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    pos, vel, mass, ids = _clustered()
    mesh = make_mesh(8)
    sim = SlabSimulation.from_arrays(mesh, pos, vel, mass, ids, cp,
                                     BOX, NMESH, tl, atime,
                                     tsp=TimestepParams())
    assert sim.gravity.engine == "stencil"
    info = sim._forces(with_pm=True, first=True)
    assert int(info["dropped"]) == 0
    assert int(info["halo_lost"]) == 0
    assert int(info["walk_overflow"]) == 0
    # coverage fallback impossible by construction (cell-anchored)
    assert int(np.asarray(info["st_diag"])[4]) == 0

    alive = np.asarray(sim._alive())
    o2 = np.argsort(sim.ids64()[alive])
    gt = np.asarray(sim.fields["gacc"])[alive][o2]
    ip = np.asarray(sim.fields["ipos"])[alive][o2]

    # single-device stencil on the exact same rows
    sp = sim.gravity.short(use_bh=1)
    acc1, _, _ = stencilgrav(
        jnp.asarray(ip), jnp.asarray(np.ones(len(ip), np.float32)),
        sp, sim.window_tables)
    a1 = np.asarray(acc1)
    scale = np.abs(a1).max()
    # equidistant from the f64 oracle (med 4.6e-4 both, measured);
    # the engine-vs-engine gap is pure f32 summation order
    np.testing.assert_allclose(gt, a1, atol=3e-4 * scale)


def test_stencil_slab_caps_regrow():
    """Deliberately tiny tier caps must regrow to a clean run (the
    shard_map program cannot host-sync: growth rides the pmax'd
    st_diag protocol)."""
    cp = _cosmo()
    atime = 0.1
    tl = Timeline.setup([0.5], atime, 0.5, 0.0, False)
    pos, vel, mass, ids = _clustered(n=2048, seed=7)
    mesh = make_mesh(8)
    sim = SlabSimulation.from_arrays(mesh, pos, vel, mass, ids, cp,
                                     BOX, NMESH, tl, atime,
                                     tsp=TimestepParams())
    sim.caps.st_pcaps = (16, 16, 16, 16)
    sim.caps.st_ncaps = (1, 1, 1, 1)
    info = sim._forces(with_pm=False, first=True)
    assert int(info["walk_overflow"]) == 0
    assert sim.caps.st_pcaps[3] > 16
    d = np.asarray(info["st_diag"])
    for i in range(4):
        assert int(d[i]) + 1 <= sim.caps.st_pcaps[i]
        assert int(d[7 + i]) + 1 <= sim.caps.st_ncaps[i]

"""Viscosity-limiter regression: per-bin dloga must bound the viscous
dissipation of a fast cold pair (hydratree2.hpp:334-343).

Without the limiter a cold close pair approaching supersonically takes
an unbounded viscous kick in one step; integrated over steps this
ratchets the internal energy (the star-small a=0.111 blow-up).  The
pair kernel implements the limiter but only engages it when dloga > 0,
so the production loops must feed real per-timebin dloga — these tests
pin both the kernel behavior and the loop plumbing.
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.sph.hydro import hydro_walk_dense
from tests.test_hydro import _prepare, _lattice, BOX


def _fast_pair_setup():
    """A cold jittered lattice with one supersonically approaching
    pair in the middle."""
    pos = _lattice(6, jitter=0.05, seed=3)
    n = len(pos)
    mass = np.full(n, 0.5, np.float32)
    vel = np.zeros((n, 3), np.float32)
    # find two nearby rows and slam them together
    d = np.linalg.norm(pos - pos[0], axis=1)
    j = int(np.argsort(d)[1])
    vel[0] = [500.0, 0.0, 0.0]
    vel[j] = -500.0 * (pos[j] - pos[0]) / max(d[j], 1e-6)
    entropy = np.full(n, 1e-4, np.float32)  # cold: cs << |dv|
    hsml0 = np.full(n, 2.5 * BOX / 6, np.float32)
    return pos, mass, vel, entropy, hsml0


def test_limiter_bounds_viscous_heating():
    pos, mass, vel, entropy, hsml0 = _fast_pair_setup()
    tree, payload, targets, par, out = _prepare(pos, mass, vel,
                                                entropy, hsml0)
    res_nolim = hydro_walk_dense(payload, targets, par)

    # same pair, limiter armed.  The cap is visc <= c*vdotr2/dloga
    # (dissipate at most the pair's kinetic energy over the step), so
    # it binds for LONG steps — use a large-bin dloga.
    n = len(pos)
    dl = jnp.full(n, 0.2, jnp.float32)
    payload2 = dict(payload)
    payload2["dloga"] = dl[tree.order]
    targets2 = dict(targets)
    targets2["dloga"] = dl
    res_lim = hydro_walk_dense(payload2, targets2, par)

    dts0 = np.asarray(res_nolim.dt_entropy)
    dts1 = np.asarray(res_lim.dt_entropy)
    assert np.isfinite(dts0).all() and np.isfinite(dts1).all()
    # the hot pair's dissipation must be strictly reduced by the
    # limiter (the unlimited kick over-dissipates)
    hot = np.argsort(dts0)[-2:]
    assert (dts1[hot] < 0.9 * dts0[hot]).all(), (dts1[hot], dts0[hot])
    # everyone else (subsonic) is untouched
    rest = np.setdiff1d(np.arange(len(dts0)), hot)
    np.testing.assert_allclose(dts1[rest], dts0[rest], rtol=1e-3,
                               atol=1e-9)


def test_production_loop_feeds_nonzero_dloga():
    """The single-device gas loop must gather per-bin dloga (not
    zeros) into the hydro walk once timebins are assigned."""
    from shenqi_tpu.core.timeline import Timeline, TIMEBINS

    tl = Timeline.setup([1.0], 0.1, 1.0)
    dl = np.zeros(TIMEBINS + 1, np.float32)
    for b in range(1, TIMEBINS + 1):
        dl[b] = tl.get_dloga_for_bin(b, 0)
    # bin 0 = limiter off; real bins give positive, increasing dloga
    assert dl[0] == 0.0
    assert (dl[1:] > 0).all()
    assert (np.diff(dl) > 0).all()
    # the plumbing in simulation_gas/_density_hydro_once and
    # slab_sim gathers exactly this table; pin the gather semantics
    bins = jnp.asarray([0, 3, 10], jnp.int32)
    got = jnp.asarray(dl)[jnp.clip(bins, 0, TIMEBINS)]
    np.testing.assert_allclose(np.asarray(got), dl[[0, 3, 10]])

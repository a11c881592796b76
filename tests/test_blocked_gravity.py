"""Blocked (TPU-native) tree walk vs per-particle walk vs direct f64.

The cross-engine consistency strategy of the reference (runtests.cpp
new-vs-legacy treewalk): the block engine must be at least as accurate
as the per-particle engine.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.gravity.shortrange import ShortRangeParams, treegrav
from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked
from tests.test_tree import _direct_short_range, random_particles, BOX


def _params(nmesh=32, **kw):
    cellsize = BOX / nmesh
    d = dict(boxsize=BOX, cellsize=cellsize, rcut=6.0 * cellsize,
             asmth=1.5, err_tol_force_acc=0.002, bh_opening_angle=0.175,
             use_bh=1, softening=BOX / 32 / 30 * 2.8, G=43007.1)
    d.update(kw)
    return ShortRangeParams(**d)


def test_blocked_matches_perparticle_and_direct():
    pos, mass = random_particles(700, seed=11, clustered=True)
    n = len(pos)
    params = _params()
    expected, _ = _direct_short_range(pos.astype(np.float64),
                                      mass.astype(np.float64), params)

    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=8)
    oldacc = jnp.zeros(n, jnp.float32)

    acc_pp, pot_pp, _ = treegrav(tree, ipos, oldacc, params)
    acc_bl, pot_bl, lists = treegrav_blocked(tree, oldacc, params,
                                             maxi=2048, maxl=1024,
                                             ncrit=8)
    acc_pp = np.asarray(acc_pp)
    acc_bl = np.asarray(acc_bl)

    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err_pp = np.linalg.norm(acc_pp - expected, axis=1) / scale
    err_bl = np.linalg.norm(acc_bl - expected, axis=1) / scale
    # blocked MAC is conservative: at least as accurate on average
    assert err_bl.mean() <= err_pp.mean() * 1.05
    assert np.percentile(err_bl, 90) < 0.01
    # potential agrees with the per-particle engine closely
    np.testing.assert_allclose(np.asarray(pot_bl), np.asarray(pot_pp),
                               rtol=5e-3, atol=1e-3 * np.abs(
                                   np.asarray(pot_pp)).max())


def test_blocked_with_acc_criterion():
    pos, mass = random_particles(500, seed=12, clustered=True)
    n = len(pos)
    params = _params(use_bh=0)
    expected, _ = _direct_short_range(pos.astype(np.float64),
                                      mass.astype(np.float64), params)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass), jnp.ones(n, bool), BOX,
                        nlevels=6, ncrit=8)
    oldacc = jnp.asarray(np.linalg.norm(expected, axis=1)
                         / params.G).astype(jnp.float32)
    acc_bl, _, _ = treegrav_blocked(tree, oldacc, params, maxi=4096,
                                    maxl=1024, ncrit=8)
    acc_bl = np.asarray(acc_bl)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc_bl - expected, axis=1) / scale
    assert np.percentile(err, 90) < 0.005


def test_device_blocking_matches_tree_blocking():
    """blocking='device' (on-device block assembly, single-sync) must
    reproduce the host-side 'tree' blocking, including with an active
    subset (the build_active_sublist analog)."""
    import numpy as np
    import jax.numpy as jnp
    from shenqi_tpu.core.particles import float_to_ipos
    from shenqi_tpu.ops.tree import build_octree
    from shenqi_tpu.gravity.shortrange import ShortRangeParams
    from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked

    BOX = 50000.0
    rng = np.random.RandomState(11)
    n = 3000
    # clustered: half uniform, half in 3 clumps
    pos = np.concatenate([
        rng.uniform(0, BOX, (n // 2, 3)),
        (rng.normal(0, 0.02 * BOX, (n // 2, 3))
         + rng.choice([0.2, 0.5, 0.8], (n // 2, 1)) * BOX) % BOX])
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    tree = build_octree(ipos, mass, mass > 0, BOX, nlevels=6,
                        ncrit=16)
    nmesh = 32
    sp = ShortRangeParams(boxsize=BOX, cellsize=BOX / nmesh,
                          rcut=6 * BOX / nmesh, asmth=1.5, use_bh=1,
                          softening=300.0, G=43007.1)
    oldacc = jnp.zeros(n, jnp.float32)
    kw = dict(block=128, maxi=1024, maxl=512, ncrit=16)
    acc_t, pot_t, _ = treegrav_blocked(tree, oldacc, sp, None,
                                       blocking="tree", **kw)
    cache = {}
    acc_d, pot_d, _ = treegrav_blocked(tree, oldacc, sp, None,
                                       blocking="device",
                                       tier_cache=cache, **kw)
    scale = float(jnp.abs(acc_t).max())
    np.testing.assert_allclose(np.asarray(acc_d), np.asarray(acc_t),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(pot_d), np.asarray(pot_t),
                               atol=1e-5 * float(jnp.abs(pot_t).max()))
    assert cache, "tier cache should be populated"

    # active subset: forces equal on the subset, zero elsewhere
    active = np.zeros(n, bool)
    active[rng.choice(n, 500, replace=False)] = True
    acc_a, _, _ = treegrav_blocked(tree, oldacc, sp, None,
                                   blocking="device", active=active,
                                   n_targets=500, tier_cache=cache,
                                   **kw)
    # compacted-active blocks have different bboxes -> different (but
    # equally valid) MAC decisions; agree to force-accuracy order
    np.testing.assert_allclose(np.asarray(acc_a)[active],
                               np.asarray(acc_t)[active],
                               atol=5e-4 * scale)
    assert np.all(np.asarray(acc_a)[~active] == 0.0)

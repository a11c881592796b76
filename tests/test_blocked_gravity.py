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

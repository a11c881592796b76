"""Refined (sub-block MAC + packed sources) engine vs blocked vs direct.

Engine-vs-engine oracle strategy (runtests.cpp analog): the refined
schedule re-tests the SAME lists with strictly tighter bboxes, so its
force error must match or beat the blocked engine's.
"""

import numpy as np
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.ops.tree import build_octree
from shenqi_tpu.gravity.shortrange import ShortRangeParams
from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked
from shenqi_tpu.gravity.shortrange_refined import treegrav_refined
from tests.test_tree import _direct_short_range, random_particles, BOX


def _params(nmesh=32, **kw):
    cellsize = BOX / nmesh
    d = dict(boxsize=BOX, cellsize=cellsize, rcut=6.0 * cellsize,
             asmth=1.5, err_tol_force_acc=0.002,
             bh_opening_angle=0.175, use_bh=1,
             softening=BOX / 32 / 30 * 2.8, G=43007.1)
    d.update(kw)
    return ShortRangeParams(**d)


def _setup(n, seed, use_bh):
    pos, mass = random_particles(n, seed=seed, clustered=True)
    params = _params(use_bh=use_bh)
    expected, _ = _direct_short_range(pos.astype(np.float64),
                                      mass.astype(np.float64), params)
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    tree = build_octree(ipos, jnp.asarray(mass),
                        jnp.ones(len(pos), bool), BOX,
                        nlevels=6, ncrit=8)
    return tree, params, expected


def test_refined_matches_direct_bh():
    tree, params, expected = _setup(700, 11, use_bh=1)
    n = expected.shape[0]
    oldacc = jnp.zeros(n, jnp.float32)
    acc_r, pot_r, _ = treegrav_refined(tree, oldacc, params,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       sub=32, want_pot=True)
    acc_b, pot_b, _ = treegrav_blocked(tree, oldacc, params,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       blocking="device")
    acc_r = np.asarray(acc_r)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err_r = np.linalg.norm(acc_r - expected, axis=1) / scale
    err_b = np.linalg.norm(np.asarray(acc_b) - expected,
                           axis=1) / scale
    assert np.percentile(err_r, 90) < 0.01
    # refined re-tests with tighter bboxes: at least as accurate
    assert err_r.mean() <= err_b.mean() * 1.05
    # potential against the blocked engine
    np.testing.assert_allclose(
        np.asarray(pot_r), np.asarray(pot_b), rtol=5e-3,
        atol=1e-3 * np.abs(np.asarray(pot_b)).max())


def test_refined_acc_criterion_steady_state():
    tree, params, expected = _setup(500, 12, use_bh=0)
    n = expected.shape[0]
    oldacc = jnp.asarray(np.linalg.norm(expected, axis=1)
                         / params.G).astype(jnp.float32)
    tier_cache, caps_cache = {}, {}
    acc_r, _, _ = treegrav_refined(tree, oldacc, params, maxi=4096,
                                   maxl=1024, ncrit=8, sub=32,
                                   tier_cache=tier_cache,
                                   caps_cache=caps_cache)
    acc_r = np.asarray(acc_r)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc_r - expected, axis=1) / scale
    assert np.percentile(err, 90) < 0.005
    # second call reuses the caches (no assertion beyond it running)
    acc_r2, _, _ = treegrav_refined(tree, oldacc, params, maxi=4096,
                                    maxl=1024, ncrit=8, sub=32,
                                    tier_cache=tier_cache,
                                    caps_cache=caps_cache)
    np.testing.assert_allclose(np.asarray(acc_r2), acc_r, rtol=1e-6)


def test_refined_active_subset():
    tree, params, expected = _setup(600, 13, use_bh=1)
    n = expected.shape[0]
    oldacc = jnp.zeros(n, jnp.float32)
    rng = np.random.RandomState(3)
    active = rng.rand(n) < 0.3
    nact = int(active.sum())
    acc_r, _, _ = treegrav_refined(tree, oldacc, params, maxi=2048,
                                   maxl=1024, ncrit=8, sub=32,
                                   active=jnp.asarray(active),
                                   n_targets=nact)
    acc_r = np.asarray(acc_r)
    fmag = np.linalg.norm(expected, axis=1)
    scale = np.median(fmag[fmag > 0])
    err = np.linalg.norm(acc_r[active] - expected[active],
                         axis=1) / scale
    assert np.percentile(err, 90) < 0.01
    # inactive rows get zero force
    assert np.all(acc_r[~active] == 0.0)


def test_refined_polywindow_fast_math():
    """The single-rsqrt FMA pair math (PolyWindow path) matches the
    reference spline_force + window form used by the blocked engine."""
    from shenqi_tpu.gravity.window import window_polynomials
    tree, params, expected = _setup(600, 14, use_bh=1)
    n = expected.shape[0]
    oldacc = jnp.zeros(n, jnp.float32)
    wt = window_polynomials(params.asmth)
    acc_r, pot_r, _ = treegrav_refined(tree, oldacc, params, wt,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       sub=32, want_pot=True)
    acc_b, pot_b, _ = treegrav_blocked(tree, oldacc, params, wt,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       blocking="device")
    scale = np.median(np.linalg.norm(np.asarray(acc_b), axis=1))
    d = np.linalg.norm(np.asarray(acc_r) - np.asarray(acc_b), axis=1)
    # identical physics, tighter drop test: differences are fp-order
    # plus genuinely-dropped beyond-rcut tails (window ~ 0 there)
    assert np.percentile(d / scale, 99) < 2e-3
    np.testing.assert_allclose(
        np.asarray(pot_r), np.asarray(pot_b), rtol=1e-2,
        atol=2e-3 * np.abs(np.asarray(pot_b)).max())


def test_refined_pallas_engine_interpret():
    """rpallas (fused kernel, interpret on CPU) == rxla packed pass."""
    from shenqi_tpu.gravity.window import window_polynomials
    tree, params, _ = _setup(400, 15, use_bh=0)
    n = tree.ipos_s.shape[0]
    oldacc = jnp.full(n, 50.0, jnp.float32)
    wt = window_polynomials(params.asmth)
    acc_x, pot_x, _ = treegrav_refined(tree, oldacc, params, wt,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       sub=32, want_pot=True,
                                       engine="xla")
    acc_p, pot_p, _ = treegrav_refined(tree, oldacc, params, wt,
                                       maxi=2048, maxl=1024, ncrit=8,
                                       sub=32, want_pot=True,
                                       engine="pallas")
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_x),
                               rtol=2e-5, atol=1e-6 * np.abs(
                                   np.asarray(acc_x)).max())
    np.testing.assert_allclose(np.asarray(pot_p), np.asarray(pot_x),
                               rtol=2e-5, atol=1e-6 * np.abs(
                                   np.asarray(pot_x)).max())


def test_refined_bfs_traversal_matches_walk():
    """traversal='bfs' (frontier) emits the same interaction sets as
    the sequential walk; forces agree to summation-order fp noise."""
    tree, params, _ = _setup(800, 16, use_bh=0)
    n = tree.ipos_s.shape[0]
    oldacc = jnp.full(n, 50.0, jnp.float32)
    acc_w, _, _ = treegrav_refined(tree, oldacc, params, maxi=4096,
                                   maxl=1024, ncrit=8, sub=32,
                                   traversal="walk")
    acc_b, _, _ = treegrav_refined(tree, oldacc, params, maxi=4096,
                                   maxl=1024, ncrit=8, sub=32,
                                   traversal="bfs", fcap=512)
    aw = np.asarray(acc_w)
    ab = np.asarray(acc_b)
    scale = np.median(np.linalg.norm(aw, axis=1))
    assert np.max(np.linalg.norm(ab - aw, axis=1)) / scale < 1e-5

"""Pallas P2P kernel vs direct reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE
from shenqi_tpu.gravity.window import window_polynomials
from shenqi_tpu.gravity.shortrange import (spline_force,
                                           short_range_window)
from shenqi_tpu.ops.pallas_p2p import p2p_blocked, BLK, SCH

BOX = 50000.0


def _reference(tgt, src, sm, soft, cellsize, window, G):
    nb = len(tgt)
    acc = np.zeros((nb, BLK, 3))
    pot = np.zeros((nb, BLK))
    to_f = BOX / POS_SCALE
    for b in range(nb):
        d = (src[b][None, :, :].astype(np.int64)
             - tgt[b][:, None, :].astype(np.int64))
        d = ((d + 2 ** 31) % 2 ** 32) - 2 ** 31
        dx = d.astype(np.float64) * to_f
        r2 = (dx * dx).sum(-1)
        fac, fpot = spline_force(
            jnp.asarray(r2, jnp.float32),
            jnp.asarray(sm[b][None, :].repeat(BLK, 0), jnp.float32),
            soft)
        fw, pw = short_range_window(
            jnp.asarray(np.sqrt(r2), jnp.float32), cellsize, 1.5,
            window)
        acc[b] = np.asarray(
            (dx * np.asarray(fac * fw)[..., None]).sum(1)) * G
        pot[b] = np.asarray(np.asarray(fpot * pw).sum(1)) * G
    return acc, pot


def test_p2p_kernel_matches_reference():
    rng = np.random.RandomState(0)
    nb = 4
    S = 2 * SCH
    tgt = rng.randint(0, 2 ** 32, (nb, BLK, 3), dtype=np.uint64
                      ).astype(np.uint32)
    src = rng.randint(0, 2 ** 32, (nb, S, 3), dtype=np.uint64
                      ).astype(np.uint32)
    # masked lanes: zero mass
    sm = rng.uniform(0.5, 2.0, (nb, S)).astype(np.float32)
    sm[:, ::7] = 0.0
    # make some sources CLOSE to targets (within rcut) so windows and
    # softening branches are exercised
    src[0, :BLK] = (tgt[0] + rng.randint(-2 ** 22, 2 ** 22,
                                         (BLK, 3))).astype(np.uint32)

    window = window_polynomials(1.5)
    soft, cell, G = 120.0, BOX / 64, 43007.1
    acc, pot = p2p_blocked(jnp.asarray(tgt), jnp.asarray(src),
                           jnp.asarray(sm), BOX, soft, cell, window,
                           G, interpret=True)
    ref_acc, ref_pot = _reference(tgt, src, sm, soft, cell, window, G)
    scale = np.abs(ref_acc).max()
    assert np.abs(np.asarray(acc) - ref_acc).max() < 2e-4 * scale
    pscale = np.abs(ref_pot).max() + 1e-30
    assert np.abs(np.asarray(pot) - ref_pot).max() < 2e-4 * pscale


def test_treegrav_pallas_engine_matches_xla():
    """Production wiring: the fused Pallas engine (interpret mode on
    CPU) must reproduce the XLA blocked evaluation end-to-end through
    treegrav_blocked."""
    from shenqi_tpu.ops.tree import build_octree
    from shenqi_tpu.gravity.shortrange_blocked import treegrav_blocked
    from shenqi_tpu.gravity.shortrange import ShortRangeParams

    rng = np.random.RandomState(7)
    n = 512
    pos = rng.uniform(0, BOX, (n, 3))
    ipos = jnp.asarray(float_to_ipos(pos, BOX))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    tree = build_octree(ipos, mass, mass > 0, BOX, nlevels=4,
                        ncrit=16)
    nmesh = 16
    sp = ShortRangeParams(boxsize=BOX, cellsize=BOX / nmesh,
                          rcut=6 * BOX / nmesh, asmth=1.5, use_bh=1,
                          softening=500.0, G=43007.1)
    window = window_polynomials(1.5)
    oldacc = jnp.zeros(n, jnp.float32)
    kw = dict(n_targets=n, block=128, maxi=256, maxl=64, ncrit=16,
              blocking="morton")
    acc_x, pot_x, _ = treegrav_blocked(tree, oldacc, sp, window,
                                       engine="xla", **kw)
    acc_p, pot_p, _ = treegrav_blocked(tree, oldacc, sp, window,
                                       engine="pallas", **kw)
    scale = np.abs(np.asarray(acc_x)).max()
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_x),
                               atol=5e-4 * scale)
    pscale = np.abs(np.asarray(pot_x)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(pot_p), np.asarray(pot_x),
                               atol=5e-4 * pscale)

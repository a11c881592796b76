"""Pallas P2P kernel vs direct reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shenqi_tpu.core.particles import float_to_ipos, POS_SCALE
from shenqi_tpu.gravity.window import window_polynomials
from shenqi_tpu.gravity.shortrange import (spline_force,
                                           short_range_window)
from shenqi_tpu.ops.pallas_p2p import (p2p_blocked, NCRIT, QUAD, BLK)

BOX = 50000.0


def _reference(ipos_s, mass_s, tgt_start, nquads, quad_ps, quad_pc,
               soft, cellsize, window, G):
    """Dense reference with the same masking semantics."""
    nb = len(tgt_start)
    acc = np.zeros((nb, BLK, 3))
    pot = np.zeros((nb, BLK))
    ip = np.asarray(ipos_s, np.uint32)
    ms = np.asarray(mass_s)
    to_f = BOX / POS_SCALE
    for b in range(nb):
        tgt = ip[tgt_start[b]:tgt_start[b] + BLK]
        srcs = []
        masses = []
        for s in range(nquads[b] * QUAD):
            ps, pc = quad_ps[b, s], quad_pc[b, s]
            idx = np.arange(NCRIT)
            rows = ip[ps:ps + NCRIT]
            mm = np.where(idx < pc, ms[ps:ps + NCRIT], 0.0)
            srcs.append(rows)
            masses.append(mm)
        if not srcs:
            continue
        sp = np.concatenate(srcs)
        sm = np.concatenate(masses)
        d = (sp[None, :, :].astype(np.int64)
             - tgt[:, None, :].astype(np.int64))
        d = ((d + 2 ** 31) % 2 ** 32) - 2 ** 31
        dx = d.astype(np.float64) * to_f
        r2 = (dx * dx).sum(-1)
        fac, fpot = spline_force(jnp.asarray(r2, jnp.float32),
                                 jnp.asarray(sm[None, :].repeat(
                                     BLK, 0), jnp.float32), soft)
        fw, pw = short_range_window(
            jnp.asarray(np.sqrt(r2), jnp.float32), cellsize, 1.5,
            window)
        acc[b] = np.asarray(
            (dx * np.asarray(fac * fw)[..., None]).sum(1)) * G
        pot[b] = np.asarray((np.asarray(fpot * pw)).sum(1)) * G
    return acc, pot


def test_p2p_kernel_matches_reference():
    rng = np.random.RandomState(0)
    n = 2048
    pos = rng.uniform(0, BOX, (n, 3))
    order = np.argsort(pos[:, 0])      # any deterministic 'sorting'
    ipos = float_to_ipos(pos[order], BOX)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    pad = NCRIT
    ipos_p = np.vstack([ipos, np.zeros((pad, 3), np.uint32)])
    mass_p = np.concatenate([mass, np.zeros(pad, np.float32)])

    nb = 4
    maxq = 3
    tgt_start = np.array([0, 128, 512, 1024], np.int32)
    nquads = np.array([3, 2, 1, 0], np.int32)
    quad_ps = rng.randint(0, n - NCRIT, (nb, maxq * QUAD)).astype(
        np.int32)
    quad_pc = rng.randint(0, NCRIT + 1, (nb, maxq * QUAD)).astype(
        np.int32)

    window = window_polynomials(1.5)
    soft, cell, G = 120.0, BOX / 64, 43007.1

    acc, pot = p2p_blocked(
        jnp.asarray(ipos_p), jnp.asarray(mass_p),
        jnp.asarray(tgt_start), jnp.asarray(nquads),
        jnp.asarray(quad_ps), jnp.asarray(quad_pc),
        BOX, soft, cell, window, G, interpret=True)

    ref_acc, ref_pot = _reference(ipos_p, mass_p, tgt_start, nquads,
                                  quad_ps, quad_pc, soft, cell,
                                  window, G)
    scale = np.abs(ref_acc).max()
    assert np.abs(np.asarray(acc) - ref_acc).max() < 2e-4 * scale
    pscale = np.abs(ref_pot).max() + 1e-30
    assert np.abs(np.asarray(pot) - ref_pot).max() < 2e-4 * pscale
    # block with zero quads produces zeros
    assert np.abs(np.asarray(acc[3])).max() == 0.0

"""Lightcone crossing collection tests (lightcone.cpp analog)."""

import numpy as np
import pytest

from shenqi_tpu.cosmology.background import Cosmology
from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.physics.lightcone import Lightcone
from shenqi_tpu.utils.units import default_units

BOX = 30000.0
UNIT_V = 1e5


def _cosmo():
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, CMBTemperature=0.0, RadiationOn=0)
    cp.init(TimeBegin=0.01, units=default_units())
    return cp


def test_radius_monotonic():
    cp = _cosmo()
    lc = Lightcone(CP=cp, boxsize=BOX, unit_velocity=UNIT_V)
    r9 = lc.radius(0.9)
    r5 = lc.radius(0.5)
    assert lc.radius(1.0) == 0.0
    assert 0 < r9 < r5
    # sanity: z=1 comoving distance ~ 3.3 Gpc/h for this cosmology
    assert 2.0e6 < r5 * 2 < 8.0e6 or r5 > 1e5  # internal kpc/h units


def test_shell_crossing_count_and_band():
    """Particles in the shell between R(a1) and R(a0) are collected
    exactly once (single replica regime), with Aemit in (a0, a1]."""
    cp = _cosmo()
    lc = Lightcone(CP=cp, boxsize=BOX, unit_velocity=UNIT_V)
    a0, a1 = 0.995, 0.998
    r_hi, r_lo = lc.radius(a0), lc.radius(a1)
    assert r_hi > r_lo > 0
    assert r_hi < BOX  # single-replica regime for this test

    rng = np.random.RandomState(0)
    n = 4000
    pos = rng.uniform(0, BOX, (n, 3))
    d = np.linalg.norm(pos, axis=1)
    # replicas at -1 offsets also map distances; count expected
    # crossings over the same replica set the code scans
    nrep = int(np.ceil(r_hi / BOX))
    expected = 0
    for rx in range(-nrep, nrep + 1):
        for ry in range(-nrep, nrep + 1):
            for rz in range(-nrep, nrep + 1):
                off = np.array([rx, ry, rz]) * BOX
                dd = np.linalg.norm(pos + off, axis=1)
                expected += int(((dd <= r_hi) & (dd > r_lo)).sum())
    assert expected > 0

    ipos = float_to_ipos(pos, BOX)
    vel = rng.normal(0, 50, (n, 3)).astype(np.float32)
    ids = np.arange(n, dtype=np.uint64)
    got = lc.compute(a0, a1, ipos, vel, ids, np.ones(n, bool))
    assert got == expected
    ats = np.concatenate(lc.atimes)
    assert (ats >= a0 - 1e-9).all() and (ats <= a1 + 1e-9).all()
    # emitted positions sit in the shell
    ps = np.concatenate(lc.positions)
    dd = np.linalg.norm(ps, axis=1)
    assert (dd <= r_hi + 1e-6).all() and (dd > r_lo - 1e-6).all()


def test_mask_and_disjoint_shells():
    """Masked particles are skipped; consecutive intervals collect
    disjoint particle sets."""
    cp = _cosmo()
    lc = Lightcone(CP=cp, boxsize=BOX, unit_velocity=UNIT_V)
    rng = np.random.RandomState(1)
    n = 2000
    pos = rng.uniform(0, BOX, (n, 3))
    ipos = float_to_ipos(pos, BOX)
    vel = np.zeros((n, 3), np.float32)
    ids = np.arange(n, dtype=np.uint64)
    mask = np.ones(n, bool)
    mask[::2] = False
    lc.compute(0.97, 0.98, ipos, vel, ids, mask)
    lc.compute(0.98, 0.99, ipos, vel, ids, mask)
    all_ids = np.concatenate(lc.ids) if lc.ids else np.zeros(0)
    assert (all_ids % 2 == 1).all()  # masked evens never appear


def test_save_roundtrip(tmp_path):
    cp = _cosmo()
    lc = Lightcone(CP=cp, boxsize=BOX, unit_velocity=UNIT_V)
    rng = np.random.RandomState(2)
    n = 1500
    pos = rng.uniform(0, BOX, (n, 3))
    ipos = float_to_ipos(pos, BOX)
    vel = rng.normal(0, 30, (n, 3)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.uint64)
    got = lc.compute(0.97, 0.99, ipos, vel, ids, np.ones(n, bool))
    path = lc.save(str(tmp_path / "LC"))

    from shenqi_tpu.io.bigfile import BigFile
    bf = BigFile(path)
    p = bf["1/Position"].read(0, got)
    i = bf["1/ID"].read(0, got)
    a = bf["1/Aemit"].read(0, got)
    assert p.shape == (got, 3)
    assert set(np.asarray(i)) <= set(ids.tolist())
    assert (a >= 0.97).all() and (a <= 0.99).all()


def test_empty_save(tmp_path):
    cp = _cosmo()
    lc = Lightcone(CP=cp, boxsize=BOX, unit_velocity=UNIT_V)
    path = lc.save(str(tmp_path / "LC0"))
    from shenqi_tpu.io.bigfile import BigFile
    bf = BigFile(path)
    assert bf["1/Position"].read(0, 0).shape == (0, 3)

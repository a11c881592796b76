"""Sharded snapshot writer: round-trip + determinism.

VERDICT criterion: a snapshot written from a sharded state
round-trips bit-identically (petaio.cpp NumWriters-style collective
write analog).
"""

import os

import numpy as np
import pytest
import jax

from shenqi_tpu.core.particles import float_to_ipos
from shenqi_tpu.io.snapshot import SnapshotHeader
from shenqi_tpu.io.sharded_io import (save_snapshot_sharded,
                                      load_snapshot_sharded)
from shenqi_tpu.io.bigfile import BigFile
from shenqi_tpu.parallel.sharded import make_mesh
from shenqi_tpu.parallel.domain import distribute_slabs

BOX = 500.0


def _header():
    return SnapshotHeader(
        TotNumPart=np.zeros(6, np.uint64), MassTable=np.zeros(6),
        Time=0.25, BoxSize=BOX, Omega0=0.3, OmegaLambda=0.7,
        OmegaBaryon=0.05, HubbleParam=0.7,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5, UsePeculiarVelocity=1,
        TimeIC=0.1)


def test_sharded_snapshot_roundtrip(tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(5)
    n = 3000
    pos = rng.uniform(0, BOX, (n, 3))
    fields = {
        "ipos": np.asarray(float_to_ipos(pos, BOX)),
        "vel": rng.normal(size=(n, 3)).astype(np.float32),
        "mass": np.full(n, 1.5, np.float32),
        "pid": np.arange(n, dtype=np.int32),
    }
    mesh = make_mesh(8)
    sharded, C = distribute_slabs(mesh, fields, block=64)

    p1 = str(tmp_path / "PART_A")
    p2 = str(tmp_path / "PART_B")
    save_snapshot_sharded(p1, _header(), sharded, mesh, BOX,
                          atime=0.25)
    save_snapshot_sharded(p2, _header(), sharded, mesh, BOX,
                          atime=0.25, num_writers=1)

    # byte-identical across writer counts (deterministic slab order)
    for name in ("Position", "Velocity", "Mass", "ID"):
        a = BigFile(p1)[f"1/{name}"].read()
        b = BigFile(p2)[f"1/{name}"].read()
        np.testing.assert_array_equal(a, b)

    # logical round-trip: read back, match by ID
    ids = np.asarray(BigFile(p1)["1/ID"].read())
    posr = np.asarray(BigFile(p1)["1/Position"].read())
    velr = np.asarray(BigFile(p1)["1/Velocity"].read())
    assert len(ids) == n
    order = np.argsort(ids)
    np.testing.assert_array_equal(ids[order], np.arange(1, n + 1))
    got_ipos = np.asarray(float_to_ipos(posr[order] % BOX, BOX))
    np.testing.assert_array_equal(got_ipos, fields["ipos"])
    np.testing.assert_allclose(velr[order] * 0.25, fields["vel"],
                               rtol=1e-6)

    # sharded reload reproduces the same logical state
    sharded2, _ = load_snapshot_sharded(p1, mesh, BOX)
    m2 = np.asarray(sharded2["mass"])
    alive = m2 > 0
    pid2 = np.asarray(sharded2["pid"])[alive]
    ip2 = np.asarray(sharded2["ipos"])[alive]
    back = np.zeros_like(fields["ipos"])
    back[pid2] = ip2
    np.testing.assert_array_equal(back, fields["ipos"])

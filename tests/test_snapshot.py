"""Snapshot read/write round-trip tests."""

import numpy as np
import pytest

from shenqi_tpu.io.snapshot import (SnapshotHeader, write_snapshot,
                                    read_snapshot, state_to_blocks)
from shenqi_tpu.io.bigfile import BigFile


def make_header(n):
    return SnapshotHeader(
        TotNumPart=np.array([0, n, 0, 0, 0, 0], dtype=np.uint64),
        MassTable=np.array([0, 0.5, 0, 0, 0, 0]),
        Time=0.25, BoxSize=64000.0, Omega0=0.288, OmegaLambda=0.712,
        OmegaBaryon=0.0472, HubbleParam=0.7, UsePeculiarVelocity=1,
        TimeIC=0.1)


def test_header_roundtrip(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    make_header(100).write(bf)
    hdr = SnapshotHeader.read(BigFile(root))
    assert hdr.Time == pytest.approx(0.25)
    assert hdr.BoxSize == pytest.approx(64000.0)
    assert hdr.Omega0 == pytest.approx(0.288)
    assert hdr.UsePeculiarVelocity == 1
    assert hdr.TimeIC == pytest.approx(0.1)
    np.testing.assert_array_equal(hdr.TotNumPart, [0, 100, 0, 0, 0, 0])


def test_snapshot_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    n = 256
    pos = rng.uniform(0, 64000.0, (n, 3))
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full(n, 0.5, np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    path = str(tmp_path / "PART_000")
    write_snapshot(path, make_header(n), {
        1: {"Position": pos, "Velocity": vel, "Mass": mass, "ID": ids}})
    hdr, blocks = read_snapshot(path)
    np.testing.assert_allclose(blocks[1]["Position"], pos)
    np.testing.assert_allclose(blocks[1]["Velocity"], vel, rtol=1e-6)
    np.testing.assert_array_equal(blocks[1]["ID"], ids)


def test_state_to_blocks_roundtrip(tmp_path):
    """SimState -> snapshot -> arrays: positions to fixed-point accuracy."""
    from shenqi_tpu.run import PMSimulation
    from shenqi_tpu.core.timeline import Timeline
    from shenqi_tpu.cosmology import Cosmology
    from shenqi_tpu.utils.units import default_units
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472)
    cp.init(0.1, default_units())
    rng = np.random.RandomState(6)
    n = 200
    box = 64000.0
    pos = rng.uniform(0, box, (n, 3))
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    ids = np.arange(1, n + 1, dtype=np.uint64)
    tl = Timeline.setup([0.2], 0.1, 0.2)
    sim = PMSimulation.from_arrays(pos, vel, 0.5, ids, cp, box, 16, tl, 0.1)
    blocks = state_to_blocks(sim.state, box, atime=0.1, use_peculiar=True)
    assert set(blocks.keys()) == {1}
    got = blocks[1]
    assert len(got["Position"]) == n  # only live particles
    # positions to fixed-point resolution (box/2^32)
    np.testing.assert_allclose(got["Position"], pos,
                               atol=box / 2 ** 32 * 1.01)
    # velocity converted to peculiar
    np.testing.assert_allclose(got["Velocity"], vel / 0.1, rtol=1e-5)
    np.testing.assert_array_equal(got["ID"], ids)

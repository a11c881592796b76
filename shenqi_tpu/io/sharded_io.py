"""Snapshot I/O directly from slab-sharded device state.

The reference writes snapshots collectively: every rank writes its own
contiguous row range of each block, with at most NumWriters ranks
touching the filesystem at once (libgadget/petaio.cpp petaio_save_block
/ NumWriters throttling).  The TPU analog: each device's alive rows
form a contiguous range of the bigfile row space (slab order); shards
are drained device-by-device in groups of `num_writers`, so peak host
memory is one group of shards, never the global state.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .bigfile import BigFile
from .snapshot import SnapshotHeader
from ..core.particles import POS_SCALE


def _shard_hosts(arr, mesh):
    """Per-device host copies of a 'dp'-sharded array, mesh order."""
    by_dev = {s.device: s for s in arr.addressable_shards}
    return [np.asarray(by_dev[d].data) for d in mesh.devices.ravel()]


def save_snapshot_sharded(path: str, header: SnapshotHeader,
                          fields: Dict, mesh, boxsize: float,
                          atime: float, ptype: int = 1,
                          num_writers: int = 4) -> str:
    """Write a PART snapshot from fields sharded over mesh axis 'dp'.

    fields: dict with ipos [N,3] uint32, vel [N,3] f32, mass [N] f32
    (0 = dead row), pid [N] (written as ID+1).  Rows are written in
    slab order — a deterministic global order — so two writes of the
    same state are byte-identical, and reading back + sorting by ID
    reproduces the logical state exactly.
    """
    ndev = mesh.devices.size
    ipos_s = _shard_hosts(fields["ipos"], mesh)
    vel_s = _shard_hosts(fields["vel"], mesh)
    mass_s = _shard_hosts(fields["mass"], mesh)
    pid_s = _shard_hosts(fields["pid"], mesh)

    alive = [m > 0 for m in mass_s]
    counts = np.array([int(a.sum()) for a in alive])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    ntot = int(offsets[-1])

    bf = BigFile(path, create=True)
    hdr_tot = np.zeros(6, dtype=np.uint64)
    hdr_tot[ptype] = ntot
    header.TotNumPart = hdr_tot
    header.Time = atime
    header.write(bf)

    specs = [("Position", "<f8", 3), ("Velocity", "<f4", 3),
             ("Mass", "<f4", 1), ("ID", "<u8", 1)]
    blks = {name: bf.create_block(f"{ptype}/{name}", dt, ntot,
                                  nmemb=nm)
            for name, dt, nm in specs}

    # drain shards in groups of num_writers (NumWriters throttling:
    # bounds both concurrent file pressure and host staging memory)
    for g0 in range(0, ndev, max(num_writers, 1)):
        for d in range(g0, min(g0 + max(num_writers, 1), ndev)):
            a = alive[d]
            if not a.any():
                continue
            off = int(offsets[d])
            pos = (ipos_s[d][a].astype(np.float64)
                   * (boxsize / POS_SCALE))
            blks["Position"].write(off, pos.astype("<f8"))
            blks["Velocity"].write(
                off, (vel_s[d][a] / atime).astype("<f4"))
            blks["Mass"].write(off, mass_s[d][a].astype("<f4"))
            blks["ID"].write(
                off, (pid_s[d][a].astype(np.uint64) + 1))
    for b in blks.values():
        b.flush()
    return path


def load_snapshot_sharded(path: str, mesh, boxsize: float,
                          ptype: int = 1, capacity: int = None,
                          block: int = 128):
    """Read a PART snapshot straight into slab-sharded fields.

    Each device reads only the rows that fall in its slab (two-pass:
    stream Position x-coords to bucket rows by owner slab, then read
    the owned row ranges).  Returns (sharded fields dict, capacity).
    """
    from ..parallel.domain import distribute_slabs
    from ..core.particles import float_to_ipos

    bf = BigFile(path)
    pos = np.asarray(bf[f"{ptype}/Position"].read())
    vel = np.asarray(bf[f"{ptype}/Velocity"].read())
    mass = np.asarray(bf[f"{ptype}/Mass"].read())
    ids = np.asarray(bf[f"{ptype}/ID"].read())
    hdr = SnapshotHeader.read(bf)
    atime = float(hdr.Time)
    fields = {
        "ipos": np.asarray(float_to_ipos(pos % boxsize, boxsize)),
        "vel": (vel * atime).astype(np.float32),
        "mass": mass.astype(np.float32),
        "pid": (ids - 1).astype(np.int32),
    }
    return distribute_slabs(mesh, fields, capacity=capacity,
                            block=block)

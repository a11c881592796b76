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

import dataclasses
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
                          num_writers: int = 4,
                          id_offset: int = 1) -> str:
    """Write a PART snapshot from fields sharded over mesh axis 'dp'.

    fields: dict with ipos [N,3] uint32, vel [N,3] f32, mass [N] f32
    (0 = dead row), pid [N] (written as ID+1).  Rows are written in
    slab order — a deterministic global order — so two writes of the
    same state are byte-identical, and reading back + sorting by ID
    reproduces the logical state exactly.

    Velocity follows the header's UsePeculiarVelocity convention
    (petaio.cpp:732-745 GTVelocity: vel/atime if peculiar, raw code
    velocity otherwise).  The caller's header is not mutated.
    """
    ndev = mesh.devices.size
    ipos_s = _shard_hosts(fields["ipos"], mesh)
    vel_s = _shard_hosts(fields["vel"], mesh)
    mass_s = _shard_hosts(fields["mass"], mesh)
    pid_s = _shard_hosts(fields["pid"], mesh)
    pid_hi_s = (_shard_hosts(fields["pid_hi"], mesh)
                if "pid_hi" in fields else None)

    alive = [m > 0 for m in mass_s]
    counts = np.array([int(a.sum()) for a in alive])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    ntot = int(offsets[-1])

    bf = BigFile(path, create=True)
    hdr_tot = np.zeros(6, dtype=np.uint64)
    hdr_tot[ptype] = ntot
    header = dataclasses.replace(header, TotNumPart=hdr_tot,
                                 Time=atime)
    header.write(bf)
    vfac = 1.0 / atime if header.UsePeculiarVelocity else 1.0

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
                off, (vel_s[d][a] * vfac).astype("<f4"))
            blks["Mass"].write(off, mass_s[d][a].astype("<f4"))
            pid64 = (pid_s[d][a].astype(np.uint64)
                     + np.uint64(id_offset))
            if pid_hi_s is not None:
                pid64 |= pid_hi_s[d][a].astype(np.uint64) \
                    << np.uint64(32)
            blks["ID"].write(off, pid64)
    for b in blks.values():
        b.flush()
    return path


def save_snapshot_sharded_multi(path: str, header: SnapshotHeader,
                                fields: Dict, mesh, boxsize: float,
                                atime: float, num_writers: int = 4,
                                id_offset: int = 0) -> str:
    """Multi-species sharded write (petaio per-type layout).

    fields: the slab-sim state dict with a 'ptyp' [N] i32 row-type
    column plus ipos/vel/mass/pid(/pid_hi).  Gas rows (type 0)
    additionally write SmoothingLength / Density / EgyWtDensity /
    Entropy / InternalEnergy from the slab gas columns
    (hsml/density/egywt/entropy — petaio.cpp gas property set,
    InternalEnergy u = A rho^(g-1)/(g-1) like io/snapshot.py).
    """
    from ..utils.constants import GAMMA_MINUS1

    ndev = mesh.devices.size
    names = ["ipos", "vel", "mass", "pid", "ptyp"]
    if "pid_hi" in fields:
        names.append("pid_hi")
    has_gas_cols = "entropy" in fields
    if has_gas_cols:
        names += ["hsml", "density", "egywt", "entropy"]
    shards = {k: _shard_hosts(fields[k], mesh) for k in names}

    alive = [m > 0 for m in shards["mass"]]
    types = sorted({int(t) for d in range(ndev)
                    for t in np.unique(shards["ptyp"][d][alive[d]])})
    counts = {t: np.array([int((alive[d]
                                & (shards["ptyp"][d] == t)).sum())
                           for d in range(ndev)]) for t in types}
    offsets = {t: np.concatenate([[0], np.cumsum(counts[t])])
               for t in types}

    bf = BigFile(path, create=True)
    hdr_tot = np.zeros(6, dtype=np.uint64)
    for t in types:
        hdr_tot[t] = int(offsets[t][-1])
    header = dataclasses.replace(header, TotNumPart=hdr_tot,
                                 Time=atime)
    header.write(bf)
    vfac = 1.0 / atime if header.UsePeculiarVelocity else 1.0

    base_specs = [("Position", "<f8", 3), ("Velocity", "<f4", 3),
                  ("Mass", "<f4", 1), ("ID", "<u8", 1)]
    gas_specs = [("SmoothingLength", "<f4", 1), ("Density", "<f4", 1),
                 ("EgyWtDensity", "<f4", 1), ("Entropy", "<f4", 1),
                 ("InternalEnergy", "<f4", 1)]
    blks = {}
    for t in types:
        ntot_t = int(offsets[t][-1])
        specs = base_specs + (gas_specs if (t == 0 and has_gas_cols)
                              else [])
        for name, dt, nm in specs:
            blks[(t, name)] = bf.create_block(
                f"{t}/{name}", dt, ntot_t, nmemb=nm)

    for g0 in range(0, ndev, max(num_writers, 1)):
        for d in range(g0, min(g0 + max(num_writers, 1), ndev)):
            for t in types:
                sel = alive[d] & (shards["ptyp"][d] == t)
                if not sel.any():
                    continue
                off = int(offsets[t][d])
                pos = (shards["ipos"][d][sel].astype(np.float64)
                       * (boxsize / POS_SCALE))
                blks[(t, "Position")].write(off, pos.astype("<f8"))
                blks[(t, "Velocity")].write(
                    off, (shards["vel"][d][sel] * vfac
                          ).astype("<f4"))
                blks[(t, "Mass")].write(
                    off, shards["mass"][d][sel].astype("<f4"))
                pid64 = (shards["pid"][d][sel].astype(np.uint64)
                         + np.uint64(id_offset))
                if "pid_hi" in shards:
                    pid64 |= shards["pid_hi"][d][sel].astype(
                        np.uint64) << np.uint64(32)
                blks[(t, "ID")].write(off, pid64)
                if t == 0 and has_gas_cols:
                    dens = shards["density"][d][sel]
                    entr = shards["entropy"][d][sel]
                    blks[(t, "SmoothingLength")].write(
                        off, shards["hsml"][d][sel].astype("<f4"))
                    blks[(t, "Density")].write(
                        off, dens.astype("<f4"))
                    blks[(t, "EgyWtDensity")].write(
                        off, shards["egywt"][d][sel].astype("<f4"))
                    blks[(t, "Entropy")].write(
                        off, entr.astype("<f4"))
                    with np.errstate(invalid="ignore"):
                        u = entr / GAMMA_MINUS1 \
                            * dens ** GAMMA_MINUS1
                    blks[(t, "InternalEnergy")].write(
                        off, np.nan_to_num(u).astype("<f4"))
    for b in blks.values():
        b.flush()
    return path


def load_snapshot_sharded(path: str, mesh, boxsize: float,
                          ptype: int = 1, capacity: int = None,
                          block: int = 128, chunk: int = 1 << 20):
    """Read a PART snapshot straight into slab-sharded fields.

    Two-pass bounded-memory read: pass 1 streams Position x-coords in
    `chunk`-row pieces to count rows per owner slab (fixing the
    capacity); pass 2 builds ONE device's shard at a time (streaming
    the file again, keeping only that slab's rows) and places it on
    its device, assembling the global sharded arrays from the
    per-device pieces.  Peak host memory is one chunk + one shard,
    never the global state.  Returns (sharded fields dict, capacity).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.particles import float_to_ipos
    from ..ops.morton import morton_key
    from .bigfile import BigFile as _BF

    ndev = mesh.devices.size
    bf = _BF(path)
    hdr = SnapshotHeader.read(bf)
    atime = float(hdr.Time)
    vfac = atime if hdr.UsePeculiarVelocity else 1.0
    bpos = bf[f"{ptype}/Position"]
    bvel = bf[f"{ptype}/Velocity"]
    bmass = bf[f"{ptype}/Mass"]
    bid = bf[f"{ptype}/ID"]
    ntot = bpos.size

    def dest_of(pos_chunk):
        ip = np.asarray(float_to_ipos(pos_chunk % boxsize, boxsize))
        l = int(np.log2(ndev))
        d = (ip[:, 0] >> np.uint32(32 - l)).astype(np.int64) \
            if l else np.zeros(len(ip), np.int64)
        return ip, d

    # ---- pass 1: per-slab counts ----
    counts = np.zeros(ndev, np.int64)
    for s0 in range(0, ntot, chunk):
        c = min(chunk, ntot - s0)
        _, d = dest_of(np.asarray(bpos.read(s0, c)))
        counts += np.bincount(d, minlength=ndev)
    if capacity is None:
        capacity = int(counts.max())
        capacity = ((capacity + block - 1) // block) * block
        capacity = max(capacity, block)
    if counts.max() > capacity:
        raise ValueError(f"slab occupancy {counts.max()} exceeds "
                         f"capacity {capacity}")

    # ---- pass 2: one shard at a time ----
    devices = list(mesh.devices.ravel())
    shard_specs = {
        "ipos": (np.uint32, (3,)),
        "vel": (np.float32, (3,)),
        "mass": (np.float32, ()),
        "pid": (np.int32, ()),
    }
    per_dev = {name: [] for name in shard_specs}
    for dev_i, dev in enumerate(devices):
        bufs = {name: np.zeros((capacity,) + tail, dt)
                for name, (dt, tail) in shard_specs.items()}
        fill = 0
        for s0 in range(0, ntot, chunk):
            c = min(chunk, ntot - s0)
            ip, d = dest_of(np.asarray(bpos.read(s0, c)))
            sel = d == dev_i
            k = int(sel.sum())
            if not k:
                continue
            bufs["ipos"][fill:fill + k] = ip[sel]
            bufs["vel"][fill:fill + k] = (
                np.asarray(bvel.read(s0, c))[sel] * vfac)
            bufs["mass"][fill:fill + k] = np.asarray(
                bmass.read(s0, c)).reshape(-1)[sel]
            bufs["pid"][fill:fill + k] = (
                np.asarray(bid.read(s0, c)).reshape(-1)[sel]
                .astype(np.int64) - 1)
            fill += k
        # local Morton sort of alive rows (octree block-quality
        # invariant, matching distribute_slabs)
        keys = np.asarray(morton_key(jnp.asarray(bufs["ipos"][:fill])))
        order = np.argsort(keys, kind="stable")
        for name in bufs:
            bufs[name][:fill] = bufs[name][:fill][order]
        for name in bufs:
            per_dev[name].append(jax.device_put(bufs[name], dev))

    out = {}
    for name, (dt, tail) in shard_specs.items():
        gshape = (ndev * capacity,) + tail
        spec = P("dp", *([None] * len(tail)))
        out[name] = jax.make_array_from_single_device_arrays(
            gshape, NamedSharding(mesh, spec), per_dev[name])
    return out, capacity

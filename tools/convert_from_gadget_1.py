#!/usr/bin/env python
"""Convert a Gadget-1 format snapshot to a bigfile snapshot
(tools/convert_from_gadget_1.py analog, pure numpy — no nbodykit).

Gadget-1 files are Fortran unformatted records: a 256-byte header
(npart[6] i32, mass[6] f64, time f64, redshift f64, flag_sfr i32,
flag_feedback i32, nall[6] u32, flag_cooling i32, num_files i32,
boxsize f64, omega0 f64, omegalambda f64, hubbleparam f64, flag_age
i32, flag_metals i32, nallhw[6] u32, pad), then POS f32[3N],
VEL f32[3N], ID u32[N], and MASS f32 for types with mass-table 0.

There is no metadata in Gadget-1 — columns may be mis-interpreted,
as the reference tool warns.  Velocities convert with the GADGET
convention v_pec = u * sqrt(a); the output sets UsePeculiarVelocity.

Usage: convert_from_gadget_1.py SOURCE DEST [--time-ic T]
       [--unit-system Kpc|Mpc] [--subsample N]
SOURCE is the filename base EXCLUDING ".0" for multi-file sets.
"""

import argparse
import glob
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402

_HDR = struct.Struct("<6i6dddii6Iii4dii6I")


def _read_record(f):
    """One Fortran unformatted record (length-prefixed + suffixed)."""
    raw = f.read(4)
    if len(raw) < 4:
        return None
    n = struct.unpack("<i", raw)[0]
    data = f.read(n)
    tail = struct.unpack("<i", f.read(4))[0]
    if tail != n:
        raise IOError(f"record framing mismatch: {n} != {tail}")
    return data


def read_gadget1(fname):
    """Read one Gadget-1 file: (header dict, pos, vel, ids, mass)."""
    with open(fname, "rb") as f:
        hraw = _read_record(f)
        h = _HDR.unpack(hraw[: _HDR.size])
        hdr = {
            "npart": np.array(h[0:6], np.int64),
            "mass": np.array(h[6:12]),
            "time": h[12], "redshift": h[13],
            "nall": np.array(h[16:22], np.int64),
            "num_files": h[23],
            "boxsize": h[24], "omega0": h[25],
            "omegalambda": h[26], "hubbleparam": h[27],
            "nallhw": np.array(h[30:36], np.int64),
        }
        ntot = int(hdr["npart"].sum())
        pos = np.frombuffer(_read_record(f), np.float32
                            ).reshape(ntot, 3)
        vel = np.frombuffer(_read_record(f), np.float32
                            ).reshape(ntot, 3)
        ids = np.frombuffer(_read_record(f), np.uint32)
        # MASS block exists only for types with mass-table == 0
        nwithmass = int(hdr["npart"][(hdr["mass"] == 0)
                                     & (hdr["npart"] > 0)].sum())
        mass = None
        if nwithmass:
            rec = _read_record(f)
            if rec is not None:
                mass = np.frombuffer(rec, np.float32)
    return hdr, pos, vel, ids, mass


def gather_files(root):
    if os.path.exists(root):
        return [root]
    gg = sorted(glob.glob(root + ".?"))
    gg += sorted(glob.glob(root + ".??"))
    gg += sorted(glob.glob(root + ".???"))
    gg += sorted(glob.glob(root + ".????"))
    assert len(set(gg)) == len(gg)
    if not gg:
        raise FileNotFoundError(root)
    return gg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="base name, excluding '.0'")
    ap.add_argument("dest", help="bigfile snapshot dir (created)")
    ap.add_argument("--time-ic", type=float, default=None)
    ap.add_argument("--unit-system", choices=["Mpc", "Kpc"],
                    default="Kpc")
    ap.add_argument("--subsample", type=int, default=None)
    ns = ap.parse_args()

    files = gather_files(ns.source)
    print(f"loading {len(files)} file(s)")
    parts = [read_gadget1(f) for f in files]
    hdr = parts[0][0]
    # per-type concatenation: each file stores ITS types contiguously,
    # so slice per file per type, then join across files
    bytype = {t: {"pos": [], "vel": [], "ids": [], "mass": []}
              for t in range(6)}
    for h, pos_f, vel_f, ids_f, m in parts:
        o = mo = 0
        for t in range(6):
            npt = int(h["npart"][t])
            if npt == 0:
                continue
            bytype[t]["pos"].append(pos_f[o: o + npt])
            bytype[t]["vel"].append(vel_f[o: o + npt])
            bytype[t]["ids"].append(ids_f[o: o + npt])
            if h["mass"][t] == 0 and m is not None:
                bytype[t]["mass"].append(m[mo: mo + npt])
                mo += npt
            else:
                bytype[t]["mass"].append(
                    np.full(npt, h["mass"][t], np.float32))
            o += npt

    a = hdr["time"]
    sqa = np.float32(np.sqrt(a))          # GADGET u -> peculiar

    out = BigFile(ns.dest, create=True)
    hb = out.create_block("Header", "i4", 0)
    att = hb.attrs
    tot = hdr["nall"] + (hdr["nallhw"] << 32)
    att["MassTable"] = hdr["mass"]
    att["TotNumPart"] = tot
    att["TotNumPartInit"] = tot
    att["BoxSize"] = hdr["boxsize"]
    att["Time"] = a
    att["TimeIC"] = ns.time_ic if ns.time_ic is not None else a
    att["UnitVelocity_in_cm_per_s"] = 1e5
    att["UnitLength_in_cm"] = (3.085678e24 if ns.unit_system == "Mpc"
                               else 3.085678e21)
    att["UnitMass_in_g"] = 1.989e43
    att["UsePeculiarVelocity"] = 1
    att["Omega0"] = hdr["omega0"]
    att["OmegaLambda"] = hdr["omegalambda"]
    att["HubbleParam"] = hdr["hubbleparam"]
    hb.flush()

    gotmass = all(hdr["mass"][t] > 0 for t in range(6)
                  if tot[t] > 0)
    for t in range(6):
        if not bytype[t]["pos"]:
            continue
        sl = slice(None, None, ns.subsample)
        pos = np.concatenate(bytype[t]["pos"])[sl]
        vel = np.concatenate(bytype[t]["vel"])[sl] * sqa
        ids = np.concatenate(bytype[t]["ids"]).astype(np.uint64)
        # 32-bit ID wraparound: re-offset duplicates of the first ID
        wrap = np.flatnonzero(ids == ids[0])
        for ind in wrap[1:]:
            ids[ind:] += np.uint64(2 ** 32)
        ids = ids[sl]
        for name, arr, nm in (("Position", pos, 3),
                              ("Velocity", vel, 3),
                              ("ID", ids, 1)):
            blk = out.create_block(f"{t}/{name}",
                                   arr.dtype.str.lstrip("<>|"),
                                   len(arr), nmemb=nm)
            blk.write(0, arr)
            blk.flush()
        if not gotmass:
            mass = np.concatenate(bytype[t]["mass"])[sl]
            blk = out.create_block(f"{t}/Mass", "f4", len(mass))
            blk.write(0, mass)
            blk.flush()
    print(f"wrote {ns.dest}: types "
          f"{[t for t in range(6) if tot[t] > 0]}")


if __name__ == "__main__":
    main()

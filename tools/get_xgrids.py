#!/usr/bin/env python
"""Build property grids from a snapshot (tools/get_xgrids.py analog,
single-process numpy — no nbodykit/mpi4py): CIC-deposit
weight*value for one particle type onto an Nmesh^3 mesh, with the
reference's three normalization modes, saved as a bigfile dataset.

  norm='global'  grid / global mean        (e.g. 1+delta of gas)
  norm='local'   grid / weight grid        (mean value per cell)
  norm='none'    raw weight*value per cell (e.g. SFR, stellar mass)

Usage: get_xgrids.py PFILE --output OUT --outname NAME
       [--dataset 0/] [--value Value] [--weight Mass]
       [--norm global] [--resolution 1.0]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def _cic3d(pos, w, box, nmesh):
    g = pos / box * nmesh
    i0 = np.floor(g).astype(np.int64)
    f = g - i0
    grid = np.zeros((nmesh, nmesh, nmesh))
    for dx in (0, 1):
        wx = np.abs(1 - dx - f[:, 0])
        ix = (i0[:, 0] + dx) % nmesh
        for dy in (0, 1):
            wy = np.abs(1 - dy - f[:, 1])
            iy = (i0[:, 1] + dy) % nmesh
            for dz in (0, 1):
                wz = np.abs(1 - dz - f[:, 2])
                iz = (i0[:, 2] + dz) % nmesh
                np.add.at(grid, (ix, iy, iz), w * wx * wy * wz)
    return grid


def main(pfile, output, outname, pos="Position", weight="Mass",
         dataset="0/", resolution=1.0, value="Value",
         norm="global"):
    bf = BigFile(pfile)
    att = bf["Header"].attrs
    box = float(np.atleast_1d(att["BoxSize"])[0])
    box_mpc = box / 1000
    redshift = 1.0 / float(np.atleast_1d(att["Time"])[0]) - 1
    nmesh = int(box_mpc / resolution)
    nmesh -= nmesh % 8
    t = dataset.strip("/")

    p = np.asarray(bf[f"{t}/{pos}"].read()) % box
    if weight in ("Weight", None):
        w = np.ones(len(p))                  # particle-count weight
    elif f"{t}/{weight}" not in bf:
        w = np.ones(len(p))
        if weight == "Mass":                 # header mass table
            mt = np.atleast_1d(att["MassTable"])
            w *= float(mt[int(t)])
    else:
        w = np.asarray(bf[f"{t}/{weight}"].read()).astype(np.float64)
    if value in ("Value", None) or f"{t}/{value}" not in bf:
        v = np.ones(len(p))
    else:
        v = np.asarray(bf[f"{t}/{value}"].read()).astype(np.float64)

    field = _cic3d(p, w * v, box, nmesh)
    if norm == "global":
        field /= max(field.mean(), 1e-300)
    elif norm == "local":
        mgrid = _cic3d(p, w, box, nmesh)
        field = np.where(mgrid > 0, field / np.maximum(mgrid, 1e-300),
                         0.0)
    print(f"{outname}: mean {value} per cell = {field.mean():.6g}, "
          f"grid {nmesh}^3")

    out = BigFile(output, create=True)
    blk = out.create_block(outname, "f8", field.size)
    blk.write(0, field.ravel())
    blk.attrs["BoxSize"] = box_mpc
    blk.attrs["Redshift"] = redshift
    blk.attrs["Nmesh"] = nmesh
    blk.flush()
    print(f"done. written at {output} / {outname}")


def run_multiple(datadir, outdir, datasets, values, weightings,
                 normtypes, redshifts, resolution=1.0):
    """Build every (dataset, value) grid at every redshift, skipping
    grids that already exist (reference run_multiple naming:
    {type}_{value}_grid_{snap:03d})."""
    snaps = sorted(glob.glob(os.path.join(datadir, "PART_*")))
    bytime = {}
    for s in snaps:
        t = float(np.atleast_1d(
            BigFile(s)["Header"].attrs["Time"])[0])
        bytime[s] = 1.0 / t - 1
    for z in redshifts:
        match = [s for s, zz in bytime.items() if abs(zz - z) < 0.05]
        if not match:
            print(f"no snapshot at z={z}")
            continue
        partfile = match[0]
        snap = int(os.path.basename(partfile).split("_")[-1])
        for d, v, w, n in zip(datasets, values, weightings,
                              normtypes):
            dname = f"{d.strip('/')}_{v}"
            outname = f"{dname}_grid_{snap:03d}"
            if os.path.exists(os.path.join(outdir, outname)):
                print(f"file {outname} already exists")
                continue
            print(f"starting {outname}")
            main(partfile, outdir, outname, dataset=d, value=v,
                 weight=w, norm=n, resolution=resolution)


if __name__ == "__main__":
    ap = argparse.ArgumentParser("get_xgrids.py")
    ap.add_argument("pfile")
    ap.add_argument("--output", required=True)
    ap.add_argument("--outname", default="grid")
    ap.add_argument("--pos", default="Position")
    ap.add_argument("--weight", default="Mass")
    ap.add_argument("--value", default="Value")
    ap.add_argument("--dataset", default="0/")
    ap.add_argument("--norm", default="global",
                    choices=("global", "local", "none"))
    ap.add_argument("--resolution", type=float, default=1.0)
    ns = ap.parse_args()
    main(ns.pfile, ns.output, ns.outname, pos=ns.pos,
         weight=ns.weight, dataset=ns.dataset,
         resolution=ns.resolution, value=ns.value, norm=ns.norm)

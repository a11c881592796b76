#!/usr/bin/env python
"""Plot a 2-D projected density image of a snapshot
(tools/plot-structure.py analog, without the nbodykit dependency):
CIC-deposit one particle type onto an Nmesh^2 (x, y) grid, show
log10 of the projected density.

Usage: plot_structure.py SNAPSHOT [--type 1] [--nmesh N] [-o out.pdf]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def project_cic(pos, box, nmesh):
    """2-D cloud-in-cell deposit of (x, y) positions."""
    g = pos[:, :2] / box * nmesh
    i0 = np.floor(g).astype(np.int64)
    f = g - i0
    grid = np.zeros((nmesh, nmesh))
    for dx in (0, 1):
        for dy in (0, 1):
            w = (np.abs(1 - dx - f[:, 0])
                 * np.abs(1 - dy - f[:, 1]))
            np.add.at(grid, ((i0[:, 0] + dx) % nmesh,
                             (i0[:, 1] + dy) % nmesh), w)
    return grid


def plot_image(snapshot, dataset=1, colorbar=True, Nmesh=None,
               output=None):
    bf = BigFile(snapshot)
    att = bf["Header"].attrs
    box = float(np.atleast_1d(att["BoxSize"])[0])
    pos = np.asarray(bf[f"{dataset}/Position"].read())
    if Nmesh is None:
        Nmesh = 2 * int(np.round(np.cbrt(len(pos))))
    grid = project_cic(pos, box, Nmesh)
    mean = grid.mean() or 1.0
    data_log = np.log10(np.maximum(grid / mean, 1e-10))

    import matplotlib
    matplotlib.use("PDF")
    import matplotlib.pyplot as plt
    plt.clf()
    box_mpc = box / 1000
    plt.imshow(data_log.T, origin="lower",
               extent=(0.0, box_mpc, 0.0, box_mpc))
    if colorbar:
        plt.colorbar(label=r"$\log_{10} \Sigma/\bar\Sigma$")
    plt.xlabel("x (Mpc/h)")
    plt.ylabel("y (Mpc/h)")
    plt.tight_layout()
    snap = os.path.basename(os.path.normpath(snapshot))
    out = output or f"dens-plt-type{dataset}{snap}.pdf"
    plt.savefig(out)
    plt.clf()
    print("wrote", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("snapshot")
    ap.add_argument("--type", type=int, default=1)
    ap.add_argument("--nmesh", type=int, default=None)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    plot_image(args.snapshot, dataset=args.type, Nmesh=args.nmesh,
               output=args.output)

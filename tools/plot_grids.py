#!/usr/bin/env python
"""Plot slices of get_xgrids outputs (tools/plot_grids.py analog):
datasets named {prefix}_grid_{snap} arranged in a redshift x type
panel grid, with the reference's per-property color maps and the
internal-energy -> temperature conversion.

Usage: plot_grids.py GRIDFILE --snapshots 000,001
       [--gridnames 1_Value,0_NeutralHydrogenFraction]
       [--slice-idx 5] [--slice-depth 5] [--output out.pdf]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402

X_H = 0.76


def u_to_t(uin, xhi):
    """Internal energy (km/s)^2 -> temperature K, ionized-mu."""
    helium = 1 - X_H
    nep = (1 - 3 / 4 * helium) * (1 - xhi)
    muienergy = 4 / (X_H * (3 + 4 * nep) + 1) * uin
    return 2 / 3 * 1.6726e-24 / 1.38066e-16 * muienergy * 1e10


def main():
    import matplotlib
    matplotlib.use("pdf")
    from matplotlib import pyplot as plt
    from matplotlib import cm, colors
    from matplotlib import gridspec

    ap = argparse.ArgumentParser("plot_grids.py")
    ap.add_argument("gridfile")
    ap.add_argument("--output", default="grids.pdf")
    ap.add_argument("--snapshots", required=True,
                    help="comma-separated snapshot tags")
    ap.add_argument("--gridnames", default="1_Value,"
                    "0_NeutralHydrogenFraction")
    ap.add_argument("--slice-idx", type=int, default=5)
    ap.add_argument("--slice-depth", type=int, default=5)
    ns = ap.parse_args()
    snapshots = ns.snapshots.split(",")
    prefixes = ns.gridnames.split(",")

    bf = BigFile(ns.gridfile)
    slabs = []
    names = []
    length = 8
    for pref in prefixes:
        for snap in snapshots:
            name = f"{pref}_grid_{snap}"
            buf = np.asarray(bf[name].read())
            print(f"Mean value of {name} is {buf.mean():.6g}")
            length = int(round(np.cbrt(buf.size)))
            buf = buf.reshape(length, length, length)
            if "NeutralHydrogenFraction" in name:
                print(f"vol weighted xhi {(buf > 0.9).mean():.4f}")
            i, d = ns.slice_idx, ns.slice_depth
            sl = buf[max(i - d // 2, 0): i + d // 2 + 1].mean(axis=0)
            if "InternalEnergy" in name:
                sl = u_to_t(sl, 0.0)
                name = name.replace("InternalEnergy", "Temperature")
            slabs.append(sl)
            names.append(name)

    def style(pref):
        if "NeutralHydrogenFraction" in pref:
            return colors.Normalize(0, 1), cm.Blues
        if "J21" in pref:
            return colors.LogNorm(1e-3, 1e1), cm.viridis
        if "InternalEnergy" in pref:
            return colors.LogNorm(1e3, 3e4), cm.plasma
        if "ZReionized" in pref:
            return colors.Normalize(5, 12), cm.gist_rainbow_r
        if "Value" in pref:
            return colors.LogNorm(1e-1, 1e1), cm.Purples
        return colors.LogNorm(), cm.Purples

    n_snap, n_types = len(snapshots), len(prefixes)
    spec = gridspec.GridSpec(n_snap, n_types)
    fig = plt.figure(figsize=(12, 10 * n_snap / n_types))
    for i, slab in enumerate(slabs):
        col, row = divmod(i, n_snap)
        norm, cmap = style(prefixes[col])
        ax = fig.add_subplot(spec[row, col])
        im = ax.imshow(np.maximum(slab, getattr(norm, "vmin", 0)
                                  or slab.min()),
                       cmap=cmap, norm=norm, origin="lower",
                       extent=(0, length, 0, length))
        plt.colorbar(im)
        ax.set_title(names[i], fontsize=10)
        ax.tick_params(left=False, labelleft=False, bottom=False,
                       labelbottom=False)
    fig.savefig(ns.output)
    print("wrote", ns.output)


if __name__ == "__main__":
    main()

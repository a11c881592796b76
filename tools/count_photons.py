#!/usr/bin/env python
"""Global reionization photon-budget statistics
(tools/count_photons.py analog, single-process numpy): for each
snapshot of one or more output directories, compute

  * mass-weighted and volume-weighted (1 Mpc/h grid) neutral
    fractions,
  * mean and ionized-region J21 (-> Gamma_12 at alpha=2),
  * mean temperature at mean density (T0),
  * photons released per hydrogen atom, from the stellar mass times
    nion photons per stellar baryon and an escape fraction that is
    constant or halo-mass scaled (fesc_n * (M/h)^fesc_s from the FOF
    catalog),

then plot the histories vs redshift as a photon-conservation sanity
check of the excursion-set reionization.

Usage: count_photons.py OUTDIR[,OUTDIR2,...] [--output plot.pdf]
       [--dataname data.npz] [--nion 4000] [--fesc-n F]
       [--fesc-s S] [--zlist z1,z2,...]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402

X_H = 0.76
Y_HE = 1 - X_H
# rho_crit(z=0) in g/cm^3 over h^2
RHOCRIT_H2 = 1.8788e-29


def u_to_t(uin, xhi):
    nep = (1 - 3 / 4 * Y_HE) * (1 - xhi)
    muienergy = 4 / (X_H * (3 + 4 * nep) + 1) * uin
    return 2 / 3 * 1.6726e-24 / 1.38066e-16 * muienergy * 1e10


def _grid_local(pos, w, v, box, nmesh):
    from get_xgrids import _cic3d
    num = _cic3d(pos, w * v, box, nmesh)
    den = _cic3d(pos, w, box, nmesh)
    return np.where(den > 0, num / np.maximum(den, 1e-300), 0.0)


def read_globalreion_info(fname, nion, fesc_n, fesc_s, zlist=None):
    snaps = sorted(glob.glob(os.path.join(fname, "PART_*")))
    rows = []
    for filename in snaps:
        snap = int(os.path.basename(filename).split("_")[-1])
        fofname = os.path.join(fname, f"PIG_{snap:03d}")
        bf = BigFile(filename)
        att = bf["Header"].attrs
        a = float(np.atleast_1d(att["Time"])[0])
        z = 1 / a - 1
        if zlist is not None and np.min(np.abs(zlist - z)) > 0.01:
            continue
        box = float(np.atleast_1d(att["BoxSize"])[0])
        hh = float(np.atleast_1d(att["HubbleParam"])[0])
        ob = float(np.atleast_1d(att["OmegaBaryon"])[0])
        um = float(np.atleast_1d(att["UnitMass_in_g"])[0])
        ul = float(np.atleast_1d(att["UnitLength_in_cm"])[0])

        mass = np.asarray(bf["0/Mass"].read()).astype(np.float64)
        xhi = np.asarray(
            bf["0/NeutralHydrogenFraction"].read()).astype(np.float64)
        pos = np.asarray(bf["0/Position"].read()) % box
        gas_mass = mass.sum()
        gas_xhi = (mass * xhi).sum()

        nmesh = max(int(box / 1000), 4)
        vol_xhi = _grid_local(pos, mass, xhi, box, nmesh).mean()

        j21 = (np.asarray(bf["0/J21"].read()).astype(np.float64)
               if "0/J21" in bf else np.zeros(len(mass)))
        j21_avg = (mass * j21).sum() / gas_mass
        ion = xhi < 0.1
        j21_ion = j21[ion].mean() if ion.any() else 0.0

        u = np.asarray(bf["0/InternalEnergy"].read()
                       ).astype(np.float64)
        dens = np.asarray(bf["0/Density"].read()).astype(np.float64) \
            * um / ul ** 3
        # comoving 1+delta vs the mean baryon density; internal
        # units carry h^2, rho_crit h^-2 cancels it (reference
        # mean_bary_dens convention)
        delta = dens / (RHOCRIT_H2 * ob)
        sel = (delta > 1 / 1.1) & (delta < 1.1)
        t0 = u_to_t(u[sel], xhi[sel]).mean() if sel.any() else 0.0

        phot = 0.0
        if fesc_n is not None:
            if fesc_s is not None and os.path.isdir(fofname):
                pig = BigFile(fofname)
                fm = np.asarray(pig["FOFGroups/Mass"].read()
                                ).astype(np.float64)
                if fm.size:
                    fesc = np.minimum(fesc_n * (fm / hh) ** fesc_s,
                                      1.0)
                    fstar = np.asarray(
                        pig["FOFGroups/MassByType"].read()
                    ).astype(np.float64)[:, 4]
                    phot = ((fesc * fstar).sum() * nion
                            / (1 - 0.75 * Y_HE))
            elif "4/Mass" in bf:
                smass = np.asarray(bf["4/Mass"].read()
                                   ).astype(np.float64).sum()
                phot = smass * nion * fesc_n / (1 - 0.75 * Y_HE)

        rows.append((z, gas_xhi / gas_mass, vol_xhi,
                     phot / gas_mass, j21_avg * 2.535452,
                     j21_ion * 2.535452, t0))
    rows.sort(key=lambda r: -r[0])
    arr = np.array(rows) if rows else np.zeros((0, 7))
    return {"redshift": arr[:, 0], "mass_xhi": arr[:, 1],
            "vol_xhi": arr[:, 2], "phot_fof": arr[:, 3],
            "G12_avg": arr[:, 4], "G12_ion": arr[:, 5],
            "T0_avg": arr[:, 6]}


def main():
    ap = argparse.ArgumentParser("count_photons.py")
    ap.add_argument("bigfile", help="comma-separated output dirs")
    ap.add_argument("--output", default="count_photons.pdf")
    ap.add_argument("--dataname", default=None)
    ap.add_argument("--nion", type=int, default=4000)
    ap.add_argument("--fesc-n", type=float, default=None)
    ap.add_argument("--fesc-s", type=float, default=None)
    ap.add_argument("--zlist", default=None)
    ns = ap.parse_args()
    zlist = (np.fromstring(ns.zlist, dtype=float, sep=",")
             if ns.zlist else None)

    import matplotlib
    matplotlib.use("pdf")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for fname in ns.bigfile.split(","):
        d = read_globalreion_info(fname, ns.nion, ns.fesc_n,
                                  ns.fesc_s, zlist)
        z = d["redshift"]
        lbl = os.path.basename(os.path.normpath(fname))
        axes[0, 0].plot(z, d["mass_xhi"], label=f"{lbl} mass")
        axes[0, 0].plot(z, d["vol_xhi"], "--", label=f"{lbl} vol")
        if ns.fesc_n is not None:
            axes[0, 1].plot(z, d["phot_fof"], label=lbl)
        axes[1, 0].semilogy(z, np.maximum(d["G12_avg"], 1e-30),
                            label=f"{lbl} avg")
        axes[1, 0].semilogy(z, np.maximum(d["G12_ion"], 1e-30),
                            "--", label=f"{lbl} ion")
        axes[1, 1].plot(z, d["T0_avg"], label=lbl)
        if ns.dataname:
            np.savez(ns.dataname, **d)
    axes[0, 0].set_ylabel(r"$x_{\rm HI}$")
    axes[0, 1].set_ylabel(r"photons per H atom")
    axes[1, 0].set_ylabel(r"$\Gamma_{12}$")
    axes[1, 1].set_ylabel(r"$T_0$ [K]")
    for ax in axes.ravel():
        ax.set_xlabel("z")
        ax.invert_xaxis()
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(ns.output)
    print("wrote", ns.output)


if __name__ == "__main__":
    main()

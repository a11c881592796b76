#!/usr/bin/env python
"""Mass-function plots from a PIG halo catalog (tools/plotGSMF.py
analog): galaxy stellar mass function, halo mass function, black hole
mass function, with Poisson error bands.  Observational overlays use
astrodatapy when installed (optional; not in the base image).

Usage as a library (like the reference):
    import plotGSMF
    plotGSMF.plot_gsmf("output/PIG_005"); plt.savefig(...)
or CLI: plotGSMF.py PIG_DIR [--which gsmf|hmf|bhmf] [-o out.pdf]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def massfunc(m, Lbox):
    """Mass function from halo masses; Lbox in comoving Mpc (NOT
    Mpc/h).  Returns (log10 mass bin centers, log10 phi, log10
    (phi+err), log10 max(phi-err, tiny)) for masked nonempty bins."""
    mbin = np.logspace(6, 12, 18)
    binmid = np.log10(mbin)[:-1] + np.diff(np.log10(mbin)) / 2
    hist = np.histogram(m, mbin)[0]
    mask = hist > 0
    vol_dlog = np.diff(np.log10(mbin)) * Lbox ** 3
    yy = hist / vol_dlog
    err = yy[mask] / np.sqrt(hist[mask])
    y1 = np.log10(yy[mask] + err)
    y2 = yy[mask] - err
    y2[y2 <= 0] = 1e-50
    return binmid[mask], np.log10(yy[mask]), y1, np.log10(y2)


def _resolved(masses, Lbox):
    alive = masses[masses > 0]
    if alive.size == 0:
        return np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0)
    rsl = 2 * alive.min()
    return massfunc(alive[alive > rsl], Lbox)


def get_gsmf(bf, Lbox, hh):
    """Stellar mass function (FOF MassByType[4]), Msun units."""
    mbt = np.asarray(bf["FOFGroups/MassByType"].read())
    return _resolved(mbt[:, 4] * 1e10 / hh, Lbox)


def get_hmf(bf, Lbox, hh):
    """Halo mass function (FOF Mass), Msun units."""
    m = np.asarray(bf["FOFGroups/Mass"].read()) * 1e10 / hh
    return _resolved(m, Lbox)


def getbmf(bf, Lbox, hh):
    """Black hole mass function (unswallowed type-5 particles)."""
    m = np.asarray(bf["5/BlackholeMass"].read()) * 1e10 / hh
    if "5/Swallowed" in bf:
        sw = np.asarray(bf["5/Swallowed"].read())
        m = m[sw < 1]
    return massfunc(m, Lbox)


def _header(bf):
    att = bf["Header"].attrs
    time = float(np.atleast_1d(att["Time"])[0])
    hh = float(np.atleast_1d(att["HubbleParam"])[0])
    box = float(np.atleast_1d(att["BoxSize"])[0])
    return 1.0 / time - 1, hh, box / 1000 / hh    # z, h, Mpc


def _plot_mf(lfm, label, title, xlab):
    import matplotlib.pyplot as plt
    plt.plot(lfm[0], lfm[1], label=label)
    plt.fill_between(lfm[0], lfm[2], lfm[3], alpha=0.2)
    plt.xlabel(xlab, fontsize=15)
    plt.ylabel(r"$\mathrm{log}_{10} \phi/[\mathrm{dex}^{-1} "
               r"\mathrm{Mpc}^{-3}]$", fontsize=15)
    plt.title(title, fontsize=15)
    plt.legend(fontsize=12)


def plot_bhmf(pig, label=None):
    bf = BigFile(pig)
    z, hh, lbox = _header(bf)
    _plot_mf(getbmf(bf, lbox, hh), (label or "") + " z=%.1f" % z,
             "BH Mass function",
             r"$\mathrm{log}_{10} [M_{\rm BH}/M_{\odot}]$")


def plot_hmf(pig, label=None):
    bf = BigFile(pig)
    z, hh, lbox = _header(bf)
    _plot_mf(get_hmf(bf, lbox, hh), (label or "") + " z=%.1f" % z,
             "Halo Mass function",
             r"$\mathrm{log}_{10} [M_{\rm h}/M_{\odot}]$")


def plot_gsmf(pig, label=None, plot_data=True):
    """GSMF from a FOF table; overlays observations when astrodatapy
    is installed (optional dependency, like the reference)."""
    import matplotlib.pyplot as plt
    bf = BigFile(pig)
    z, hh, lbox = _header(bf)
    _plot_mf(get_gsmf(bf, lbox, hh), (label or "") + " z=%.1f" % z,
             "GSMF z=%.1f" % z,
             r"$\mathrm{log}_{10} [M_\star/M_{\odot}]$")
    if plot_data:
        try:
            from astrodatapy.number_density import number_density
        except ImportError:
            return
        obs = number_density(feature="GSMF", z_target=z, quiet=1,
                             h=hh)
        for ii in range(obs.n_target_observation):
            data = obs.target_observation["Data"][ii]
            if obs.target_observation["DataType"][ii] != "data":
                continue
            data[:, 1:] = np.log10(data[:, 1:])
            plt.errorbar(data[:, 0], data[:, 1],
                         yerr=[data[:, 1] - data[:, 3],
                               data[:, 2] - data[:, 1]], fmt="o")


def find_redshift(redshift, directory, pig=True):
    """Snapshot dir at a given redshift, or None."""
    pattern = "PIG_*" if pig else "PART_*"
    for gg in glob.glob(os.path.join(directory, pattern)):
        bf = BigFile(gg)
        tt = float(np.atleast_1d(bf["Header"].attrs["Time"])[0])
        if abs(1.0 / tt - 1 - redshift) < 0.05:
            return gg
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pig", help="PIG_* halo catalog directory")
    ap.add_argument("--which", default="gsmf",
                    choices=("gsmf", "hmf", "bhmf"))
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    import matplotlib
    matplotlib.use("PDF")
    import matplotlib.pyplot as plt
    {"gsmf": plot_gsmf, "hmf": plot_hmf, "bhmf": plot_bhmf}[
        args.which](args.pig)
    out = args.output or "%s-%s.pdf" % (
        args.which, os.path.basename(os.path.normpath(args.pig)))
    plt.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main()

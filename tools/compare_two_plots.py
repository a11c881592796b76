#!/usr/bin/env python
"""Compare two output directories (tools/compare_two_plots.py analog):
P(k) absolute + ratio panels, GSMF / BHMF / HMF overlays.  The flux
power spectrum comparison requires fake_spectra (optional; gated).

Usage: compare_two_plots.py OUTPUT1 OUTPUT2 SCALEFACTOR
Writes powerspectrum-*.pdf, gsmf-*.pdf, bhmf-*.pdf, hmf-*.pdf in cwd.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib
matplotlib.use("PDF")
import matplotlib.pyplot as plt  # noqa: E402

import plotGSMF  # noqa: E402
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def make_figures():
    fig = plt.figure()
    return fig.add_subplot(2, 1, 1), fig.add_subplot(2, 1, 2)


def modecount_rebin(kk, pk, modes, minmodes=20, ndesired=200):
    """Rebin P(k) until every bin holds >= minmodes modes."""
    logkk = np.log10(kk)
    mdlogk = (np.max(logkk) - np.min(logkk)) / ndesired
    istart = iend = 1
    count = 0
    k_list = [kk[0]]
    pk_list = [pk[0]]
    targetlogk = mdlogk + logkk[istart]
    while iend < np.size(logkk) - 1:
        count += modes[iend]
        iend += 1
        if count >= minmodes and logkk[iend - 1] >= targetlogk:
            pk_list.append(np.sum(modes[istart:iend]
                                  * pk[istart:iend]) / count)
            k_list.append(np.sum(modes[istart:iend]
                                 * kk[istart:iend]) / count)
            istart = iend
            targetlogk = mdlogk + logkk[istart]
            count = 0
    return np.array(k_list), np.array(pk_list)


def get_power(matpow, rebin=True):
    data = np.loadtxt(matpow)
    ii = data[:, 0] > 0
    kk, pk = data[ii, 0], data[ii, 1]
    if rebin:
        return modecount_rebin(kk, pk, data[ii, 2])
    return kk, pk


def plot_power(output1, output2, scalefactor):
    pk1 = get_power(os.path.join(
        output1, "powerspectrum-%.4f.txt" % scalefactor))
    pk2 = get_power(os.path.join(
        output2, "powerspectrum-%.4f.txt" % scalefactor))
    ax_abs, ax_rel = make_figures()
    ax_abs.loglog(pk1[0], pk1[1], label=output1)
    ax_abs.loglog(pk2[0], pk2[1], label=output2)
    nb = min(len(pk1[0]), len(pk2[0]))
    ax_rel.semilogx(pk2[0][:nb], pk2[1][:nb] / pk1[1][:nb])
    ax_abs.legend()
    plt.savefig("powerspectrum-%.4f.pdf" % scalefactor)
    plt.clf()


def plot_mass_functions(output1, output2, atime):
    pig1 = plotGSMF.find_redshift(1 / atime - 1, output1)
    pig2 = plotGSMF.find_redshift(1 / atime - 1, output2)
    if pig1 is None or pig2 is None:
        print("no PIG at a=%.4f in one of the outputs; skipping "
              "mass functions" % atime)
        return
    bff = BigFile(pig1)
    scalefactor = float(np.atleast_1d(
        bff["Header"].attrs["Time"])[0])
    lstart = len(os.path.commonpath([output1, output2]))
    plotGSMF.plot_gsmf(pig1, label=output1[lstart:],
                       plot_data=False)
    plotGSMF.plot_gsmf(pig2, label=output2[lstart:], plot_data=True)
    plt.ylim(bottom=-10)
    plt.savefig("gsmf-%.4f.pdf" % scalefactor)
    plt.clf()
    try:
        plotGSMF.plot_bhmf(pig1, label=output1[lstart:])
        plotGSMF.plot_bhmf(pig2, label=output2[lstart:])
        plt.savefig("bhmf-%.4f.pdf" % scalefactor)
    except KeyError:
        print("no BH blocks; skipping bhmf")
    plt.clf()

    z, hh, lbox = plotGSMF._header(bff)
    hmf1 = plotGSMF.get_hmf(bff, lbox, hh)
    hmf2 = plotGSMF.get_hmf(BigFile(pig2), lbox, hh)
    ax_abs, ax_rel = make_figures()
    ax_abs.plot(hmf1[0], hmf1[1], label=output1[lstart:])
    ax_abs.plot(hmf2[0], hmf2[1], label=output2[lstart:])
    short, lng = ((hmf2, hmf1) if len(hmf1[0]) > len(hmf2[0])
                  else (hmf1, hmf2))
    if len(lng[0]) > 1 and len(short[0]) > 0:
        interp = np.interp(short[0], lng[0], lng[1])
        ax_rel.plot(short[0], short[1] / np.where(interp != 0,
                                                  interp, 1))
    ax_abs.legend()
    plt.savefig("hmf-%.4f.pdf" % scalefactor)
    plt.clf()


def plot_flux_power(output1, output2, snapnum):
    """Flux power comparison; needs fake_spectra (optional)."""
    from fake_spectra import spectra
    spec1 = spectra.Spectra(snapnum, output1, None, None, res=10,
                            savefile="lya_forest_spectra.hdf5")
    spec2 = spectra.Spectra(snapnum, output2, None, None, res=10,
                            savefile="lya_forest_spectra.hdf5")
    fpk1 = spec1.get_flux_power_1D(tau_thresh=1e3)
    fpk2 = spec2.get_flux_power_1D(tau_thresh=1e3)
    plt.semilogx(fpk1[0], fpk1[1] / fpk2[1])
    plt.savefig("fpk-%.4f.pdf" % spec1.atime)
    plt.clf()


if __name__ == "__main__":
    plot_power(sys.argv[1], sys.argv[2], float(sys.argv[3]))
    plot_mass_functions(sys.argv[1], sys.argv[2], float(sys.argv[3]))

#!/usr/bin/env python
"""Rebin a powerspectrum-*.txt output into coarser log-k bins
(tools/rebin_powerspectrum.py analog).

Input format (as written by shenqi_tpu): rows `k P nmodes`.
Usage: rebin_powerspectrum.py powerspectrum-0.1000.txt [--bins 25]
"""

import argparse
import sys

import numpy as np


def rebin(k, p, n, nbins):
    sel = (n > 0) & (k > 0)
    k, p, n = k[sel], p[sel], n[sel]
    edges = np.logspace(np.log10(k.min() * 0.999),
                        np.log10(k.max() * 1.001), nbins + 1)
    idx = np.digitize(k, edges) - 1
    out = []
    for b in range(nbins):
        m = idx == b
        if not m.any():
            continue
        w = n[m]
        out.append((np.exp(np.average(np.log(k[m]), weights=w)),
                    np.average(p[m], weights=w), int(w.sum())))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("spectrum")
    ap.add_argument("--bins", type=int, default=25)
    args = ap.parse_args()
    tab = np.loadtxt(args.spectrum)
    if tab.ndim == 1:
        tab = tab[None, :]
    nmodes = tab[:, 2] if tab.shape[1] > 2 else np.ones(len(tab))
    for k, p, n in rebin(tab[:, 0], tab[:, 1], nmodes, args.bins):
        sys.stdout.write(f"{k:.6e} {p:.6e} {n}\n")


if __name__ == "__main__":
    main()

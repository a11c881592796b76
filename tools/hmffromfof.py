#!/usr/bin/env python
"""Halo mass function from a PIG (FOF) catalog
(tools/hmffromfof.py analog).

Usage: hmffromfof.py PIG_DIR [--bins 30] [--out hmf.txt]
Writes columns: M_center [Msun/h], dn/dlogM [(Mpc/h)^-3], N_halos.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pig")
    ap.add_argument("--bins", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    bf = BigFile(args.pig)
    mass = np.asarray(bf["FOFGroups/Mass"].read(), np.float64)
    hdr = bf["Header"]
    attrs = hdr.attrs
    boxsize = float(attrs.raw("BoxSize")[0])
    ulen = float(attrs.raw("UnitLength_in_cm")[0]) \
        if "UnitLength_in_cm" in attrs else 3.085678e21
    umass = float(attrs.raw("UnitMass_in_g")[0]) \
        if "UnitMass_in_g" in attrs else 1.989e43

    msun = umass / 1.989e33
    box_mpc = boxsize * ulen / 3.085678e24
    m_msun = mass * msun
    m_msun = m_msun[m_msun > 0]
    lo, hi = np.log10(m_msun.min() * 0.99), np.log10(m_msun.max() * 1.01)
    edges = np.logspace(lo, hi, args.bins + 1)
    counts, _ = np.histogram(m_msun, bins=edges)
    dlogm = np.diff(np.log10(edges))
    centers = np.sqrt(edges[1:] * edges[:-1])
    dndlogm = counts / dlogm / box_mpc ** 3

    lines = ["# M[Msun/h] dn/dlogM[(Mpc/h)^-3] N"]
    for c, d, n in zip(centers, dndlogm, counts):
        lines.append(f"{c:.6e} {d:.6e} {n}")
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Compare two bigfile snapshots particle-by-particle, matched by ID
(tools/compare_snap.py analog).

Usage: compare_snap.py SNAP_A SNAP_B [--ptype 1] [--rtol 1e-5]
Prints max/mean relative differences for Position / Velocity / Mass
and exits nonzero if any exceed the tolerance.
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402


def load(path, ptype):
    bf = BigFile(path)
    out = {}
    for name in ("Position", "Velocity", "Mass", "ID"):
        blk = f"{ptype}/{name}"
        if blk in bf:
            out[name] = bf[blk].read()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snap_a")
    ap.add_argument("snap_b")
    ap.add_argument("--ptype", type=int, default=1)
    ap.add_argument("--rtol", type=float, default=1e-5)
    ap.add_argument("--boxsize", type=float, default=0.0,
                    help="for periodic position wrapping")
    args = ap.parse_args()

    a = load(args.snap_a, args.ptype)
    b = load(args.snap_b, args.ptype)
    if "ID" not in a or "ID" not in b:
        sys.exit("snapshots lack ID blocks")
    ia = np.argsort(a["ID"])
    ib = np.argsort(b["ID"])
    if len(ia) != len(ib) or not np.array_equal(a["ID"][ia],
                                                b["ID"][ib]):
        sys.exit(f"ID mismatch: {len(ia)} vs {len(ib)} particles")

    bad = 0
    for name in ("Position", "Velocity", "Mass"):
        if name not in a or name not in b:
            continue
        xa, xb = a[name][ia], b[name][ib]
        d = xa - xb
        if name == "Position" and args.boxsize > 0:
            d -= args.boxsize * np.round(d / args.boxsize)
        scale = max(np.abs(xa).max(), 1e-300)
        rel = np.abs(d) / scale
        print(f"{name}: max rel {rel.max():.3e} mean {rel.mean():.3e}")
        if rel.max() > args.rtol:
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Read the BlackholeDetails.bin stream written by shenqi_tpu
(tools/readBHdetail.py analog; layout is the fixed record defined in
shenqi_tpu/utils/stats.py bh_details).

Usage: readBHdetail.py BlackholeDetails.bin [--id ID] [--npz out.npz]
"""

import argparse
import sys

import numpy as np

DTYPE = np.dtype([
    ("ID", "<u8"), ("Time", "<f8"), ("Mass", "<f4"), ("Mdot", "<f4"),
    ("Density", "<f4"), ("Pos", "<f4", 3), ("Vel", "<f4", 3)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("detailfile")
    ap.add_argument("--id", type=int, default=None)
    ap.add_argument("--npz", default=None)
    args = ap.parse_args()

    rec = np.fromfile(args.detailfile, dtype=DTYPE)
    if args.id is not None:
        rec = rec[rec["ID"] == args.id]
        rec = rec[np.argsort(rec["Time"])]
    print(f"# {len(rec)} records, {len(np.unique(rec['ID']))} BHs",
          file=sys.stderr)
    if args.npz:
        np.savez(args.npz, **{k: rec[k] for k in rec.dtype.names})
    else:
        print("# ID Time Mass Mdot Density")
        for r in rec[:10000]:
            print(f"{r['ID']} {r['Time']:.6g} {r['Mass']:.6g} "
                  f"{r['Mdot']:.6g} {r['Density']:.6g}")


if __name__ == "__main__":
    main()

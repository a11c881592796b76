#!/usr/bin/env python
"""Convert a bigfile snapshot to Gadget-style HDF5
(tools/convert_bigfile_gadget_hdf5.py analog).

Usage: convert_bigfile_gadget_hdf5.py SNAP_DIR out.hdf5
Creates PartType{N} groups with Coordinates/Velocities/Masses/
ParticleIDs plus a Header group with the standard attributes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shenqi_tpu.io.bigfile import BigFile  # noqa: E402

BLOCK_MAP = {
    "Position": "Coordinates",
    "Velocity": "Velocities",
    "Mass": "Masses",
    "ID": "ParticleIDs",
    "InternalEnergy": "InternalEnergy",
    "Density": "Density",
    "SmoothingLength": "SmoothingLength",
    "Metallicity": "Metallicity",
    "StarFormationRate": "StarFormationRate",
}


def main():
    import h5py
    ap = argparse.ArgumentParser()
    ap.add_argument("snap")
    ap.add_argument("out")
    args = ap.parse_args()

    bf = BigFile(args.snap)
    attrs = bf["Header"].attrs
    npart = np.asarray(attrs.raw("TotNumPart"), np.uint64)

    with h5py.File(args.out, "w") as h5:
        hdr = h5.create_group("Header")
        hdr.attrs["NumPart_ThisFile"] = npart.astype(np.int64)
        hdr.attrs["NumPart_Total"] = npart
        hdr.attrs["MassTable"] = np.asarray(attrs.raw("MassTable"))
        for key, name in [("Time", "Time"), ("BoxSize", "BoxSize"),
                          ("Omega0", "Omega0"),
                          ("OmegaLambda", "OmegaLambda"),
                          ("HubbleParam", "HubbleParam")]:
            if key in attrs:
                hdr.attrs[name] = float(attrs.raw(key)[0])
        hdr.attrs["Redshift"] = 1.0 / float(
            attrs.raw("Time")[0]) - 1.0
        hdr.attrs["NumFilesPerSnapshot"] = 1
        for pt in range(6):
            if npart[pt] == 0:
                continue
            grp = h5.create_group(f"PartType{pt}")
            for bname, hname in BLOCK_MAP.items():
                key = f"{pt}/{bname}"
                if key in bf:
                    grp.create_dataset(hname, data=bf[key].read())
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

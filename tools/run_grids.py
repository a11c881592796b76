#!/usr/bin/env python
"""Standard excursion-set grid sweep (tools/run_grids.py analog):
density, neutral fraction, stellar mass, J21, SFR and temperature
grids at the reionization-era redshifts.

Usage: run_grids.py DATADIR OUTDIR
"""

import sys

import get_xgrids

d_arr = ["1/", "0/", "4/", "0/", "0/", "0/"]
v_arr = ["Value", "NeutralHydrogenFraction", "Value", "J21",
         "StarFormationRate", "InternalEnergy"]
w_arr = ["Mass", "Mass", "Mass", "Mass", "Weight", "Mass"]
n_arr = ["global", "local", "none", "local", "none", "local"]
redshifts = [8, 7.8, 7.6, 7.4, 7.2, 7, 6.8, 6.6, 6.4, 6.2, 6]
res = 100 / 400.0

if __name__ == "__main__":
    get_xgrids.run_multiple(
        datadir=sys.argv[1], outdir=sys.argv[2], datasets=d_arr,
        values=v_arr, weightings=w_arr, normtypes=n_arr,
        resolution=res, redshifts=redshifts)
